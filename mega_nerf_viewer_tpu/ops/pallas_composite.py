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

# Rows of rays per kernel instance (register sublane count).  At frame
# scale the XLA compositor outperforms this kernel either way (see
# PERFORMANCE.md) — it stays opt-in via Viewer.use_pallas_composite.
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
    """Drop-in for guided.composite_results (SH format), Pallas-fused.
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
