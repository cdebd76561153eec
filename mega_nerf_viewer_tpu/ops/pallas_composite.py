"""Pallas TPU kernel: fused guided-sampling compositor.

Fuses the reference's ``composite_nerf_results`` (rt_core.cuh:334-416)
— per-ray transmittance recursion, SH evaluation with view direction,
sigmoid, weighted accumulation — into a single VMEM-tile kernel:

  * rays tile as (8, S) registers (8 sublanes, S = max_guided_samples
    lanes — 128 by default, exactly one vector register row per ray);
  * the sequential transmittance product T_i = prod_{j<i} wc_j becomes a
    log2(S)-step parallel prefix using ``pltpu.roll`` shifted multiplies
    (7 vector ops instead of a 128-long serial chain);
  * SH dot + sigmoid + weight-sum are plain VPU ops on the tile.

The XLA implementation (ops/guided.composite_results) remains the
reference; this kernel is validated against it (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..options import RenderOptions
from .sh import masked_sh_basis

# Rows of rays per kernel instance (register sublane count) of the
# padded-layout kernel below.  REFERENCE/TEACHING ONLY: at frame scale
# the XLA compositor outperforms the padded kernel (measured, see
# PERFORMANCE.md), so composite_frame no longer routes to it — the
# PRODUCTION Pallas path is the compact segmented-scan kernel
# (composite_results_compact_pallas).  The padded kernel stays here,
# validated by tests/test_pallas.py, as the readable single-tile
# statement of the rt_core.cuh:334-416 recursion.
TILE = 8


def _prefix_prod(x: jax.Array, interpret: bool) -> jax.Array:
    """Exclusive prefix product along the lane axis of [TILE, S]."""
    S = x.shape[1]
    # inclusive scan by doubling shifts
    steps = int(np.ceil(np.log2(max(S, 2))))
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    prod = x
    for k in [1 << i for i in range(steps)]:
        if interpret:
            shifted = jnp.roll(prod, k, axis=1)
        else:
            shifted = pltpu.roll(prod, k, axis=1)
        prod = prod * jnp.where(lane >= k, shifted, 1.0)
    # exclusive: shift right by one
    if interpret:
        excl = jnp.roll(prod, 1, axis=1)
    else:
        excl = pltpu.roll(prod, 1, axis=1)
    return jnp.where(lane >= 1, excl, 1.0)


def _make_kernel(S: int, out_dim: int, basis_dim: int, sigma_idx: int,
                 render_depth: bool, interpret: bool):
    def kernel(results_ref, z_ref, ns_ref, basis_ref, out_ref):
        res = results_ref[:]                   # [TILE, S, out_dim]
        z = z_ref[:]                           # [TILE, S]
        ns = ns_ref[:]                         # [TILE, 1] i32
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, S), 1)
        valid = lane < ns
        is_last = lane == (ns - 1)

        sigma = res[:, :, sigma_idx]
        delta = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.zeros((TILE, 1), jnp.float32)],
            axis=1)
        wc = jnp.exp(-sigma * delta)
        wc_eff = jnp.where(valid & ~is_last, wc, 1.0)
        T = _prefix_prod(wc_eff, interpret)    # [TILE, S] exclusive
        weight = jnp.where(is_last & valid, T,
                           jnp.where(valid, T * (1.0 - wc), 0.0))

        if render_depth:
            d0 = jnp.sum(weight * T, axis=1)
            rgbv = jnp.minimum(d0 * 0.3, 1.0)
            out = jnp.stack([rgbv, rgbv, rgbv,
                             jnp.ones_like(rgbv)], axis=1)
        else:
            basis = basis_ref[:]               # [TILE, basis_dim]
            acc = []
            for c in range(3):
                coeff = res[:, :, c * basis_dim:(c + 1) * basis_dim]
                logits = jnp.sum(
                    coeff * basis[:, None, :], axis=-1)     # [TILE, S]
                rgb_s = jax.nn.sigmoid(logits)
                acc.append(jnp.sum(weight * rgb_s, axis=1))
            out = jnp.stack(acc + [jnp.ones_like(acc[0])], axis=1)
        out_ref[:] = out

    return kernel


# ----------------------------------------------------------------------
# Compact-layout segmented-scan compositor (round-3)
# ----------------------------------------------------------------------
# Sublane rows per block of the compact kernel (block = _SUB*128 samples).
_SUB = 16


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _sh_terms(basis_dim, x, y, z, bmin, bmax):
    """SH basis values as a python list of arrays (rt_core.cuh:13-68
    constants via ops/sh.py), entries outside [bmin, bmax] dropped
    statically (basis_minmax is jit-static here)."""
    from .sh import _C0, _C1, _C2, _C3, _C4
    one = jnp.ones_like(x)
    terms = [one * _C0]
    if basis_dim >= 4:
        terms += [-_C1 * y, _C1 * z, -_C1 * x]
    if basis_dim >= 9:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [_C2[0] * xy, _C2[1] * yz,
                  _C2[2] * (2.0 * zz - xx - yy),
                  _C2[3] * xz, _C2[4] * (xx - yy)]
    if basis_dim >= 16:
        terms += [_C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
                  _C3[2] * y * (4 * zz - xx - yy),
                  _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  _C3[4] * x * (4 * zz - xx - yy),
                  _C3[5] * z * (xx - yy), _C3[6] * x * (xx - 3 * yy)]
    if basis_dim >= 25:
        terms += [_C4[0] * xy * (xx - yy), _C4[1] * yz * (3 * xx - yy),
                  _C4[2] * xy * (7 * zz - 1.0),
                  _C4[3] * yz * (7 * zz - 3.0),
                  _C4[4] * (zz * (35 * zz - 30) + 3),
                  _C4[5] * xz * (7 * zz - 3),
                  _C4[6] * (xx - yy) * (7 * zz - 1.0),
                  _C4[7] * xz * (xx - 3 * yy),
                  _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return [t if bmin <= i <= bmax else None
            for i, t in enumerate(terms[:basis_dim])]


def _make_compact_kernel(out_dim: int, basis_dim: int, sigma_idx: int,
                         K: int, fmt_sh: bool, bmin: int, bmax: int,
                         interpret: bool):
    shape = (_SUB, 128)
    lane = None

    def roll(a, k):
        if interpret:
            return jnp.roll(a, k, axis=1)
        return pltpu.roll(a, k, axis=1)

    def lane_seg_scan(f, v, op):
        # segmented Hillis-Steele along the 128 lanes of each sublane
        # row: x_i <- x_{i-k} (+) x_i with (+) the segmented combine.
        # Flags ride as i32 0/1 — Mosaic's lane rotate has no i1
        # support ("Rotate with non-32-bit data").
        for k in (1, 2, 4, 8, 16, 32, 64):
            fs = roll(f, k)
            vs = roll(v, k)
            comb = jnp.where(f != 0, v, op(vs, v))
            nf = f | fs
            keep = lane >= k
            v = jnp.where(keep, comb, v)
            f = jnp.where(keep, nf, f)
        return f, v

    def row_fold(f, v, op, carry):
        # sequentially thread the carry through the _SUB sublane rows
        # (a row position without a preceding in-row flag combines
        # with everything before the row)
        outs = []
        for r in range(_SUB):
            fr = f[r:r + 1, :]
            vr = v[r:r + 1, :]
            vr = jnp.where(fr != 0, vr, op(carry, vr))
            carry = vr[0, 127]
            outs.append(vr)
        return jnp.concatenate(outs, axis=0), carry

    def kernel(flags_ref, delta_ref, res_ref, shin_ref, out_ref,
               carry_ref):
        nonlocal lane
        lane = _lane_iota(shape)
        i = pl.program_id(0)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        @pl.when(i == 0)
        def _init():
            # [P=1, s0..s2=0]; one-hot select, not scatter (Mosaic has
            # no scatter primitive)
            carry_ref[...] = jnp.where(lane128 == 0, 1.0, 0.0)

        flags = flags_ref[...]
        start_i = flags & 1                     # i32 for the scans
        is_last = (flags & 2) != 0
        valid = (flags & 4) != 0
        delta = delta_ref[...]
        sigma = res_ref[sigma_idx]
        wc = jnp.exp(-sigma * delta)
        wc_eff = jnp.where(valid & ~is_last, wc, 1.0)

        mul = lambda a, b: a * b
        add = lambda a, b: a + b
        carry_in = carry_ref[0, 0]
        fP, P = lane_seg_scan(start_i, wc_eff, mul)
        P, p_carry = row_fold(fP, P, mul, carry_in)
        # exclusive transmittance by a carried shift: T_i = 1 at a
        # segment start, else the PREVIOUS element's inclusive product
        # (lane i-1 in-row; the prior row's lane 127 across rows; the
        # block carry for the first element).  NOT P_i / wc_eff_i —
        # exp(-sigma*delta) flushes to exactly 0.0 for an opaque
        # sample (sigma*delta >= ~88, f32 + TPU subnormal flush) and
        # the division then yields NaN; the shift form matches the
        # XLA compositor's prods[:-1] semantics bit-for-bit.
        Pprev = roll(P, 1)
        rows = []
        prev_last = carry_in
        for r in range(_SUB):
            pr = jnp.where(lane128 == 0, prev_last, Pprev[r:r + 1, :])
            rows.append(pr)
            prev_last = P[r, 127]
        T = jnp.where(start_i != 0, 1.0, jnp.concatenate(rows, axis=0))
        weight = jnp.where(is_last & valid, T,
                           jnp.where(valid, T * (1.0 - wc), 0.0))

        if fmt_sh and K == 3:
            bx = shin_ref[0]
            by = shin_ref[1]
            bz = shin_ref[2]
            terms = _sh_terms(basis_dim, bx, by, bz, bmin, bmax)
        contribs = []
        for c in range(3):
            if fmt_sh and K == 3:
                logit = jnp.zeros(shape, jnp.float32)
                for b, t in enumerate(terms):
                    if t is not None:
                        logit = logit + t * res_ref[c * basis_dim + b]
                rgb_s = jax.nn.sigmoid(logit)
                contribs.append(weight * rgb_s)
            else:
                contribs.append(weight * res_ref[c])
        new_carries = [p_carry]
        for c in range(3):
            fS, S = lane_seg_scan(start_i, contribs[c], add)
            S, s_carry = row_fold(fS, S, add, carry_ref[0, 1 + c])
            out_ref[c] = S
            new_carries.append(s_carry)
        row = jnp.zeros((1, 128), jnp.float32)
        for j, v in enumerate(new_carries):
            row = jnp.where(lane128 == j, v, row)
        carry_ref[...] = row

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("opt", "basis_dim", "fmt_sh", "interpret"))
def composite_results_compact_pallas(res_c: jax.Array,   # [M, out_dim]
                                     z_c: jax.Array,      # [M]
                                     ray_of_p: jax.Array,  # [M] i32 sorted
                                     offs: jax.Array,      # [R] incl cumsum
                                     ns: jax.Array,        # [R]
                                     vdirs_c: jax.Array,   # [M, 3]
                                     opt: RenderOptions,
                                     basis_dim: int,
                                     fmt_sh: bool,
                                     interpret: Optional[bool] = None):
    """Pallas single-pass replacement for
    guided.composite_results_compact (rt_core.cuh:334-416 semantics).

    The XLA version runs two O(M log M) associative scans plus a
    [M, basis] per-sample basis gather (measured 96 + 62 ms of a
    256 ms composite at M=2^21 on v5e); here the segmented
    transmittance product, SH shading, and segmented sum run in ONE
    VMEM pass with cross-block carries, and the basis is evaluated
    in-register from the per-sample viewdirs the compact
    reconstruction already materialized for the MLP input (cache
    ``vdirs_c`` = x[:, 3:6] — no extra gather).  Segment flags come
    from shifts of the sorted ``ray_of_p`` (no offs gathers).  The
    remaining XLA work is elementwise prep + the per-ray take at
    ``last_idx``.  Depth mode and no-viewdir models use the XLA path.
    Returns [R, 4] rgba with alpha 1."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, out_dim = res_c.shape
    R = ns.shape[0]
    sigma_idx = min(3, out_dim - 1)
    block = _SUB * 128
    assert M % block == 0, "compact budget must be a block multiple"
    total = offs[-1]
    p = jnp.arange(M, dtype=jnp.int32)
    valid = p < total
    rop = ray_of_p
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), rop[:-1]])
    nxt = jnp.concatenate([rop[1:], jnp.full((1,), -1, jnp.int32)])
    is_start = valid & (rop != prev)
    is_last = valid & ((rop != nxt) | (p == total - 1))
    z_next = jnp.concatenate([z_c[1:], jnp.zeros((1,), jnp.float32)])
    delta = jnp.where(valid & ~is_last, z_next - z_c, 0.0)
    flags = (is_start.astype(jnp.int32)
             | (is_last.astype(jnp.int32) << 1)
             | (valid.astype(jnp.int32) << 2))

    n_blk = M // block
    res2 = res_c.astype(jnp.float32).T.reshape(out_dim, n_blk * _SUB,
                                               128)
    shin = vdirs_c.astype(jnp.float32).T.reshape(3, n_blk * _SUB, 128)
    flags2 = flags.reshape(n_blk * _SUB, 128)
    delta2 = delta.astype(jnp.float32).reshape(n_blk * _SUB, 128)

    bmin, bmax = opt.basis_minmax
    kernel = _make_compact_kernel(out_dim, basis_dim, sigma_idx, 3,
                                  fmt_sh, int(bmin), int(bmax),
                                  interpret)
    sums = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, _SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_blk * _SUB, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        interpret=interpret,
    )(flags2, delta2, res2, shin)
    sums_m = sums.reshape(3, M).T                       # [M, 3]
    # offs is a cumsum -> last_idx nondecreasing; the sorted hint
    # saves ~15% of this gather (the composite's largest remaining
    # cost: one [R]-row take at ~8 ns/row)
    last_idx = jnp.clip(offs - 1, 0, M - 1)
    ray_tot = sums_m.at[last_idx].get(indices_are_sorted=True,
                                      mode="clip")
    ray_tot = jnp.where((ns > 0)[:, None], ray_tot, 0.0)
    return jnp.concatenate([ray_tot,
                            jnp.ones((R, 1), jnp.float32)], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("opt", "basis_dim", "interpret"))
def composite_results_pallas(results: jax.Array,    # [R, S, out_dim]
                             z_vals: jax.Array,      # [R, S]
                             num_samples: jax.Array,  # [R]
                             vdirs: jax.Array,        # [R, 3]
                             opt: RenderOptions,
                             basis_dim: int,
                             interpret: Optional[bool] = None) -> jax.Array:
    """Padded-layout [R, S] Pallas compositor — REFERENCE/TEACHING ONLY
    (not routed by composite_frame; measured slower than XLA at frame
    scale).  Drop-in for guided.composite_results (SH format).
    ``interpret=None`` auto-selects interpreter mode on CPU backends."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, S, out_dim = results.shape
    sigma_idx = min(3, out_dim - 1)
    pad = (-R) % TILE
    if pad:
        results = jnp.pad(results, ((0, pad), (0, 0), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, pad), (0, 0)))
        num_samples = jnp.pad(num_samples, (0, pad))
        vdirs = jnp.pad(vdirs, ((0, pad), (0, 0)))
    Rp = R + pad

    basis = masked_sh_basis(basis_dim, vdirs, opt.basis_minmax[0],
                            opt.basis_minmax[1])
    kernel = _make_kernel(S, out_dim, basis_dim, sigma_idx,
                          opt.render_depth, interpret)
    grid = (Rp // TILE,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, S, out_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, basis_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 4), jnp.float32),
        interpret=interpret,
    )(results.astype(jnp.float32), z_vals.astype(jnp.float32),
      num_samples.astype(jnp.int32).reshape(Rp, 1), basis)
    return out[:R]
