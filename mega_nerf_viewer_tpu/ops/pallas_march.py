"""Pallas entry-skip prepass: register-resident top-of-tree march.

The round-1/2 measurements pinned the fast march's cost to the XLA
gather op itself (~11-14 ns/row on v5e, independent of table size,
width and batch), and showed that on a 1080p Mill-19-style frame ~72%
of all march steps cross *entry empty space* — shallow (depth <= 4)
empty leaves between the ray's bbox entry and its first dense sample.
Those steps do no shading work; their only output is the exact ``t``
trajectory (each step advances by the leaf-crossing distance plus the
``step_size`` epsilon, rt_core.cuh:229-230).

This module replays exactly those steps inside a Pallas kernel using
**VMEM-resident tables at levels 4, 5 and 6**: 4096 level-4 cells x
4-bit (skippable flag + leaf depth) packed into 512 u32 words, plus
32768 level-5 cells x 1 bit ("empty leaf at depth exactly 5" — depth
<= 4 leaves resolve at the nibble level, so no depth field is needed)
in 1024 words, plus 262144 level-6 cells x 1 bit ("empty leaf at depth
exactly 6") in 8192 words; together one (80, 128) VMEM tile.  A lookup
costs a broadcast + lane-gather + select chain over the level's rows
(~0.005 ns/element/row measured: ~0.04/0.04/0.3 ns for the 8/8/64-row
levels, far under the ~10-13 ns XLA HBM row gather).  The
kernel advances each ray's ``t`` through consecutive skippable leaves
with float math identical to the XLA march (same clip/floor/exp2/DDA
formulas in f32), so the main march starts at the first
non-skippable cell with a bit-identical ``t`` and produces bit-identical
pixels — this is an exactness-preserving accelerator, not an
approximation like the turbo map.

A cell is skippable iff the level-4 descent lands on a leaf (depth <= 4)
whose sigma <= the table's ``sigma_thresh``; the flag test is the exact
complement of the march's ``sigma > sigma_thresh`` dense test, so a
skipped step can never have contributed color.  The table must be
rebuilt when ``sigma_thresh`` decreases below the build value (the
Viewer handles this like the turbo map's validity envelope).

Votes caveat: the reference's fallback split/sample vote
(rt_core.cuh:309-320) can select an *empty* leaf when a ray finds no
dense sample; skipping entry leaves would change that fallback for
all-empty rays, so vote-collecting frames run without the prepass.

Reference: the skipped work corresponds to the empty-leaf iterations of
``render_voxels_trace_ray`` (rt_core.cuh:220-233, sigma <= sigma_thresh
branch).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..n3tree.tree import N3Tree

# Table geometry, three stacked VMEM-resident levels:
#   rows 0-7:   level-4 lattice = 16^3 = 4096 cells, 4-bit entries
#               (skip flag + leaf depth) packed 8/word -> 512 u32 words.
#   rows 8-15:  level-5 lattice = 32^3 = 32768 cells, 1 bit each
#               (cell is an empty LEAF at depth exactly 5) -> 1024 words.
#   rows 16-79: level-6 lattice = 64^3 = 262144 cells, 1 bit each
#               (cell is an empty LEAF at depth exactly 6) -> 8192 words.
# A leaf of depth <= 4 is already resolved by the level-4 nibble, so a
# level-l bit hit under an internal shallower cell always has depth
# exactly l — each extra bit plane extends exact skipping one level
# deeper.  Measured residual-step shares on the 1080p shell fixture
# (depth-histogram job): depth-5 empties ~23% after level-4-only;
# depth-6 empties were ~27% of the residual after levels 4+5 (0.45
# steps/ray), which the level-6 plane removes for +0.3 ns/prepass-step.
_LEVEL = 4
_GRID = 1 << _LEVEL
_N_CELLS = _GRID ** 3
_N_WORDS = _N_CELLS // 8          # 512
_GRID5 = 32
_N_WORDS5 = _GRID5 ** 3 // 32     # 1024
_GRID6 = 64
_N_WORDS6 = _GRID6 ** 3 // 32     # 8192
_ROWS6 = _N_WORDS6 // 128         # 64
_TABLE_SHAPE = (80, 128)  # [0:8] nibbles, [8:16] bits5, [16:80] bits6

# Ray block processed per kernel program instance.
_BLOCK_SUBLANES = 64              # 64 x 128 = 8192 rays / program
# Skip steps per while-loop iteration (see body() in the kernel).
_UNROLL = 4


@functools.partial(jax.jit, static_argnames=())
def build_skip_table(tree: N3Tree, sigma_thresh) -> jax.Array:
    """Pack the three-plane skippability table: i32 [80, 128].

    Rows 0-7 — level-4 nibbles for cell (cx, cy, cz) (x-major, like the
    leaf map): bit 3 = skippable (leaf at depth <= 4 with sigma <=
    sigma_thresh), bits 0-2 = leaf depth (march step granularity).
    Cells covered by deeper subtrees get nibble 0 (not skippable).
    Rows 8-15 — level-5 bits: 1 iff the level-5 cell is a leaf at depth
    exactly 5 with sigma <= sigma_thresh (depth <= 4 leaves are handled
    by the nibble level, so the bit needs no depth field).
    Rows 16-79 — level-6 bits: 1 iff the level-6 cell is a leaf at
    depth exactly 6 with sigma <= sigma_thresh.
    """
    # trace-time guard (tree.N is static pytree metadata): _build_rows'
    # binary digit-peel descent is N == 2 only — a wrong-N table would
    # silently mark dense cells skippable
    if tree.N != 2:
        raise ValueError(f"skip table requires N == 2 trees "
                         f"(got N={tree.N})")
    from .accel import _build_rows, _f16_bits_to_f32, _INTERNAL_BIT, \
        _DEPTH_BITS
    rows = _build_rows(tree, _LEVEL, 0)               # [4096, 2]
    meta = rows[:, 1]
    depth = meta & _DEPTH_BITS
    internal = (meta & _INTERNAL_BIT) != 0
    sigma = _f16_bits_to_f32((meta >> 16) & 0xFFFF)
    skip = (~internal) & (sigma <= jnp.float32(sigma_thresh)) \
        & (depth <= 7)
    nib = jnp.where(skip, (1 << 3) | depth, 0).astype(jnp.int32)
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :]
    words4 = jnp.sum(nib.reshape(_N_WORDS, 8) << shifts, axis=1)
    words4 = jnp.concatenate(
        [words4, jnp.zeros((8 * 128 - _N_WORDS,), jnp.int32)])

    def bit_words(level, n_words):
        rows_l = _build_rows(tree, level, 0)
        meta_l = rows_l[:, 1]
        depth_l = meta_l & _DEPTH_BITS
        internal_l = (meta_l & _INTERNAL_BIT) != 0
        sigma_l = _f16_bits_to_f32((meta_l >> 16) & 0xFFFF)
        bit = ((~internal_l) & (depth_l == level)
               & (sigma_l <= jnp.float32(sigma_thresh))).astype(jnp.int32)
        # disjoint bit positions: sum == bitwise or (and i32 sum with
        # bit 31 set wraps to the sign bit — still the correct pattern)
        shifts = jnp.arange(32, dtype=jnp.int32)[None, :]
        return jnp.sum(bit.reshape(n_words, 32) << shifts, axis=1)

    words5 = bit_words(5, _N_WORDS5)
    words6 = bit_words(6, _N_WORDS6)
    return jnp.concatenate([words4, words5, words6]).reshape(_TABLE_SHAPE)


def _prepass_kernel(scal_ref, table_ref, dx_ref, dy_ref, dz_ref,
                    ix_ref, iy_ref, iz_ref, t_ref, tmax_ref, live_ref,
                    out_ref, cnt_ref):
    """March each ray's t through consecutive skippable level-4 leaves.

    All math replicates ops/accel.render_rays_fast's step update in f32:
    posc = clip(cen + t*d), leaf cube = exp2(depth), DDA exit distance
    (_dda_unit_batch) / cube + step_size.
    """
    cenx = scal_ref[0, 0]
    ceny = scal_ref[0, 1]
    cenz = scal_ref[0, 2]
    step_size = scal_ref[0, 3]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = ix_ref[:], iy_ref[:], iz_ref[:]
    tmax = tmax_ref[:]
    t0 = t_ref[:]
    live = live_ref[:] != 0
    table = table_ref[:]
    eps_hi = jnp.float32(1.0 - 1e-6)
    gridf = jnp.float32(_GRID)
    gridf5 = jnp.float32(_GRID5)
    gridf6 = jnp.float32(_GRID6)

    def lookup(word, base, n_rows=8):
        lane = word & 127
        row = word >> 7
        val = jnp.zeros_like(word)
        for r in range(n_rows):
            bv = jnp.broadcast_to(table[base + r][None, :], lane.shape)
            g = jnp.take_along_axis(bv, lane, axis=1)
            val = jnp.where(row == r, g, val)
        return val

    def axis_t(frac, inv):
        t1 = -frac * inv
        t2 = t1 + inv
        return jnp.maximum(t1, t2)

    # NOTE: the while_loop carry holds the active mask as i32, not bool —
    # Mosaic cannot legalize i1 vector loop carries (scf.yield) on v5e.
    def one_step(c):
        t, active_i, cnt = c
        active = active_i != 0
        px = jnp.clip(cenx + t * dx, 0.0, eps_hi)
        py = jnp.clip(ceny + t * dy, 0.0, eps_hi)
        pz = jnp.clip(cenz + t * dz, 0.0, eps_hi)
        cx = jnp.floor(px * gridf).astype(jnp.int32)
        cy = jnp.floor(py * gridf).astype(jnp.int32)
        cz = jnp.floor(pz * gridf).astype(jnp.int32)
        idx = (cx * _GRID + cy) * _GRID + cz
        word = lookup(idx >> 3, 0)
        nib = (word >> ((idx & 7) * 4)) & 15
        skip4 = (nib & 8) != 0
        c5x = jnp.floor(px * gridf5).astype(jnp.int32)
        c5y = jnp.floor(py * gridf5).astype(jnp.int32)
        c5z = jnp.floor(pz * gridf5).astype(jnp.int32)
        idx5 = (c5x * _GRID5 + c5y) * _GRID5 + c5z
        word5 = lookup(idx5 >> 5, 8)
        bit5 = ((word5 >> (idx5 & 31)) & 1) != 0
        # Level-6 plane: the 64-row chain is ~5x the cost of the whole
        # 4+5 chain, so it runs only on iterations where some live lane
        # actually failed 4/5 — i.e. the few surface-approach steps per
        # block, not the (majority) shallow entry-march steps.
        needs6 = active & ~skip4 & ~bit5

        def deep6(_):
            c6x = jnp.floor(px * gridf6).astype(jnp.int32)
            c6y = jnp.floor(py * gridf6).astype(jnp.int32)
            c6z = jnp.floor(pz * gridf6).astype(jnp.int32)
            idx6 = (c6x * _GRID6 + c6y) * _GRID6 + c6z
            word6 = lookup(idx6 >> 5, 16, _ROWS6)
            return (word6 >> (idx6 & 31)) & 1

        bit6 = jax.lax.cond(jnp.any(needs6), deep6,
                            lambda _: jnp.zeros_like(nib), None) != 0
        skip = skip4 | bit5 | bit6
        depth = jnp.where(skip4, nib & 7, jnp.where(bit5, 5, 6))
        cube = jnp.exp2(depth.astype(jnp.float32))
        ux = px * cube
        uy = py * cube
        uz = pz * cube
        fx = ux - jnp.floor(ux)
        fy = uy - jnp.floor(uy)
        fz = uz - jnp.floor(uz)
        tsub = jnp.minimum(
            jnp.float32(1e4),
            jnp.minimum(jnp.minimum(axis_t(fx, ix), axis_t(fy, iy)),
                        axis_t(fz, iz))) / cube
        delta = tsub + step_size
        adv = active & skip
        t = jnp.where(adv, t + delta, t)
        cnt = cnt + adv.astype(jnp.int32)
        active = adv & (t < tmax)
        return (t, active.astype(jnp.int32), cnt)

    def body(c):
        # static unroll: several skip steps per while iteration — the
        # per-iteration any() reduction + scf branch costs as much as
        # the step body itself at block granularity, so amortizing it
        # over _UNROLL steps cuts the loop's fixed cost ~_UNROLLx
        # (inactive lanes no-op, so semantics are unchanged).
        for _ in range(_UNROLL):
            c = one_step(c)
        return c

    def cond(c):
        return jnp.any(c[1] != 0)

    t, _, cnt = jax.lax.while_loop(
        cond, body, (t0, (live & (t0 < tmax)).astype(jnp.int32),
                     jnp.zeros_like(t0, jnp.int32)))
    out_ref[:] = t
    cnt_ref[:] = cnt


def entry_skip_prepass(table: jax.Array,
                       cen_t: jax.Array,      # [3] tree-space center
                       d: jax.Array,          # [R, 3] scaled unit dirs
                       invdir: jax.Array,     # [R, 3]
                       tmin: jax.Array,       # [R]
                       tmax: jax.Array,       # [R]
                       live: jax.Array,       # [R] bool (ray hits bbox)
                       step_size,
                       interpret: Optional[bool] = None,
                       with_count: bool = False):
    """Advance each ray's start ``t`` through entry empty space.

    Returns t_start [R] >= tmin, bit-identical to where the exact march
    would be after stepping those same (colorless) leaves.  With
    ``with_count=True`` returns (t_start, skips [R] i32) — the number of
    leaves each ray skipped, used as a tertiary ray-sort key so prepass
    blocks run ~mean instead of ~max iterations (see
    accel.order_from_hints).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R = d.shape[0]
    rows_per_block = _BLOCK_SUBLANES
    block = rows_per_block * 128
    pad = (-R) % block
    n_rows = (R + pad) // 128

    def shape_plane(a, fill=0.0):
        a = jnp.concatenate(
            [a, jnp.full((pad,), fill, a.dtype)]) if pad else a
        return a.reshape(n_rows, 128)

    planes = [shape_plane(d[:, 0]), shape_plane(d[:, 1]),
              shape_plane(d[:, 2]),
              shape_plane(invdir[:, 0]), shape_plane(invdir[:, 1]),
              shape_plane(invdir[:, 2]),
              shape_plane(tmin), shape_plane(tmax),
              shape_plane(live.astype(jnp.int32))]
    scal = jnp.stack([cen_t[0], cen_t[1], cen_t[2],
                      jnp.asarray(step_size, jnp.float32)]).reshape(1, 4)

    grid = (n_rows // rows_per_block,)
    ray_spec = pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        _prepass_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(_TABLE_SHAPE, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [ray_spec] * 9,
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 128), jnp.int32)),
        interpret=interpret,
    )(scal, table, *planes)
    t_out = out.reshape(-1)[:R]
    if with_count:
        return t_out, cnt.reshape(-1)[:R]
    return t_out
