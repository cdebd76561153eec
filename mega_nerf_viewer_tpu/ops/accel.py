"""Dense leaf-map acceleration structure + fast march.

TPU-native replacement for the per-step octree pointer chase.  The
reference descends from the root for EVERY sample of EVERY ray
(``query_single_from_root``, rt_core.cuh:117-159) — ~depth dependent
int loads per step, which a GPU hides with massive thread-level
parallelism.  TPU gathers cost ~7-13 ns/element with no locality
benefit (measured on v5e), so the fast path restructures the work:

  * ``LeafMap`` — a dense grid at octree level ``L`` mapping every cell
    to its covering leaf: packed ``(node_id, meta)`` i32 pairs where
    ``meta`` carries the leaf depth, an is-internal flag, a clamped
    sample count, and the leaf's sigma as raw f16 bits.  One [R, 2]
    row gather replaces the whole descent AND the sigma load.  Cells
    whose subtree is deeper than ``L`` store the level-``L`` chunk and
    the march finishes the descent with (max_depth - L) bounded gather
    levels — zero when the map covers the full tree.
  * **Deferred shading** — the march only accumulates (node, weight)
    pairs for sigma-passing samples (early-termination keeps these
    few); SH coefficient rows are gathered once per frame in a single
    batched pass instead of per step.
  * **Ray-tile chunking** — ``lax.map`` over spatially coherent pixel
    blocks so a tile's march loop stops when ITS rays finish, not when
    the worst ray of the whole frame does.

Exactness: for N == 2 the leaf found, its depth, the in-leaf fractional
position (binary digit peel == frac(pos * 2^depth), exact in fp32) and
sigma (same f16 bits) are identical to the reference descent, so step
positions, weights and early termination match the exact renderer
bit-for-bit.  Split/sample votes are available via ``need_votes=True``
(also bit-identical); only visit marks (the full ancestor chain of
rt_core.cuh:133) still require the exact march.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from .sh import masked_sh_basis
from .rays import screen2worlddir, rodrigues
from .render import _dda_world_batch, _dda_unit_batch

# meta layout (i32): bits 0-4 depth, bit 5 internal, bits 6-15 clamped
# sample count, bits 16-31 sigma as raw float16 bits.
_DEPTH_BITS = 31
_INTERNAL_BIT = 1 << 5
_COUNT_SHIFT = 6
_COUNT_MAX = 1023


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LeafMap:
    rows: jax.Array  # i32 [G^3, 2] = (node, meta)
    level: int = dataclasses.field(metadata=dict(static=True), default=6)
    deep_levels: int = dataclasses.field(metadata=dict(static=True),
                                         default=0)

    @property
    def grid(self) -> int:
        return 1 << self.level


def _f16_bits_to_f32(bits: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def tree_max_depth(tree: N3Tree) -> int:
    """Max leaf depth of the live tree (host-side, build time only).

    A chunk with a ancestors holds leaves at depth a+1 (the traversal's
    depth counter, rt_core.cuh:129-158); parents may appear in any
    array order after pruning, so walk iteratively.
    """
    cap = int(tree.capacity)
    parent = np.asarray(tree.parent[:cap]) // tree.N3
    cur = parent.copy()
    ancestors = np.ones(cap, np.int64)
    for _ in range(64):
        at_root = cur == 0
        if at_root.all():
            break
        ancestors = ancestors + (~at_root)
        cur = parent[cur]
    return int(ancestors.max()) + 1


@functools.partial(jax.jit, static_argnames=("level", "deep_levels"))
def _build_rows(tree: N3Tree, level: int, deep_levels: int) -> jax.Array:
    """Build the (node, meta) rows with a level-wise (mip) descent.

    A flat per-cell descent costs ``level x G^3`` child gathers (134M at
    level 8 — measured 1.3 s on v5e); descending the cell lattice level
    by level instead costs ``sum_l 8^l ~= 1.14 x G^3``: cells inside an
    already-found leaf just REPLICATE their parent cell's state (a
    reshape-broadcast, no gather), and only each level's own lattice pays
    a gather.  The per-level descent digit is the next coordinate bit
    (cells are lattice-aligned, so ``floor(center * 2^l)`` == bit
    extraction, exact in f32) — rows are bit-identical to the flat
    descent.  N == 2 only (enforced by build_leaf_map).
    """
    N3 = tree.N3
    child_flat = tree.child.reshape(-1)

    # level-0 state: the root chunk, nothing resolved
    chunk = jnp.zeros((1, 1, 1), jnp.int32)
    cidx = jnp.zeros((1, 1, 1), jnp.int32)
    depth = jnp.ones((1, 1, 1), jnp.int32)
    done = jnp.zeros((1, 1, 1), bool)

    def up(a):
        # replicate each cell into its 2x2x2 children (lattice refine).
        # Major-axis repeat + cyclic transpose, NOT one (g,2,g,2,g,2)
        # broadcast: TPU tiles the two MINOR dims to (8,128), so any
        # intermediate with a trailing dim of 2 pads 64x — at level 9
        # the broadcast form materialized a 34 GB tile-padded
        # intermediate and OOMed.  Repeating on the major axis keeps
        # minor dims dense; three rounds restore x-major order.
        for _ in range(3):
            a = jnp.repeat(a, 2, axis=0)
            a = jnp.transpose(a, (1, 2, 0))
        return a

    for l in range(level):
        g2 = 2 << l
        chunk, cidx, depth, done = map(up, (chunk, cidx, depth, done))
        # descent digit = low bit of each cell coordinate at this level
        bx = (jnp.arange(g2, dtype=jnp.int32) & 1)
        idx = (bx[:, None, None] * 4 + bx[None, :, None] * 2
               + bx[None, None, :])
        idx = jnp.broadcast_to(idx, (g2, g2, g2))
        skip = jnp.take(child_flat, chunk * N3 + idx, mode="clip")
        upd = ~done
        leaf = skip == 0
        cidx = jnp.where(upd, idx, cidx)
        chunk = jnp.where(upd & ~leaf, chunk + skip, chunk)
        depth = jnp.where(upd & ~leaf, depth + 1, depth)
        done = done | leaf

    chunk = chunk.reshape(-1)
    cidx = cidx.reshape(-1)
    depth = depth.reshape(-1)
    done = done.reshape(-1)
    node = chunk * N3 + cidx
    # sigma f16 bits + clamped sample count, pre-packed per node so the
    # full-lattice lookup is ONE gather instead of two
    sigma_bits = jax.lax.bitcast_convert_type(
        tree.data.reshape(-1, tree.data_dim)[:, tree.data_dim - 1],
        jnp.uint16).astype(jnp.int32)
    counts = jnp.clip(tree.sample_counts.reshape(-1).astype(jnp.int32),
                      0, _COUNT_MAX)
    aux = (sigma_bits << 16) | (counts << _COUNT_SHIFT)
    meta = (jnp.clip(depth, 0, _DEPTH_BITS)
            | ((~done).astype(jnp.int32) << 5)
            | jnp.take(aux, node, mode="clip"))
    # internal cells: node = chunk reached at level L (descent resumes)
    node = jnp.where(done, node, chunk)
    return jnp.stack([node, meta], axis=-1)


def build_leaf_map(tree: N3Tree, level: Optional[int] = None) -> LeafMap:
    """Build the dense leaf map.  Rebuild after refinement/prune
    (cheap: one batched descent over G^3 cells).

    N == 2 only: the binary grid/descent and the march's ``exp2`` depth
    math assume a power-of-two cell lattice; other branching factors
    must use the exact renderer (the reference itself warns N != 2
    "probably doesn't work", n3tree.cpp:86).
    """
    if tree.N != 2:
        raise ValueError(
            f"leaf-map fast path supports N == 2 only (tree has N="
            f"{tree.N}); use the exact renderer")
    max_d = tree_max_depth(tree)
    if level is None:
        # device-derived cap (utils.tuning): the largest level whose
        # [G^3, 2]-i32 rows fit the attached chip's HBM/8 — level 9
        # (1.07 GiB) on a 16 GiB v5e, level 10 on a v5p.  The reference
        # analogue is auto_cuda_threads reading device-0 properties
        # (renderer_kernel.cu:14-28).
        from ..utils.tuning import device_tuning
        level = min(max_d, device_tuning().leaf_map_level_cap)
    deep = max(0, max_d - level)
    rows = _build_rows(tree, level, deep)
    return LeafMap(rows=rows, level=level, deep_levels=deep)


@functools.partial(jax.jit, static_argnames=("level", "sigma_thresh"))
def _turbo_rows(rows: jax.Array, level: int,
                sigma_thresh: float) -> jax.Array:
    """Rewrite empty cells' depth to that of the largest fully-empty
    ancestor-aligned cube (an occupancy mip over the leaf map).

    The march then crosses a whole empty region in one aligned-cube DDA
    step instead of leaf-by-leaf.  Geometrically safe: every skipped
    leaf has sigma <= sigma_thresh, so the only output difference vs the
    exact walk is the per-step ``step_size`` epsilon accumulating fewer
    times (sub-1e-3 drift; see PERFORMANCE.md).
    """
    G = 1 << level
    node = rows[:, 0]
    meta = rows[:, 1]
    sigma = _f16_bits_to_f32((meta >> 16) & 0xFFFF)
    internal = (meta & _INTERNAL_BIT) != 0
    occ = (internal | (sigma > sigma_thresh)).reshape(G, G, G)

    # mip pyramid: occ_l[c] = any occupied cell inside the level-l cube
    eff_depth = jnp.full((G, G, G), jnp.int32(level), jnp.int32)
    assigned = jnp.zeros((G, G, G), bool)
    occ_l = occ
    mips = [occ]
    for l in range(level - 1, -1, -1):
        g = 1 << l
        occ_l = occ_l.reshape(g, 2, g, 2, g, 2).any(axis=(1, 3, 5))
        mips.append(occ_l)
    # assign from coarsest empty ancestor down
    for l in range(0, level + 1):
        g = 1 << l
        occ_up = jnp.repeat(jnp.repeat(jnp.repeat(
            mips[level - l], G // g, 0), G // g, 1), G // g, 2)
        take = (~occ_up) & (~assigned)
        eff_depth = jnp.where(take, jnp.int32(l), eff_depth)
        assigned = assigned | take
    eff_depth = eff_depth.reshape(-1)

    empty = ~occ.reshape(-1)
    # clamp: never deepen (eff_depth <= stored depth by construction for
    # empty cells; keep original for occupied)
    depth = meta & _DEPTH_BITS
    new_depth = jnp.where(empty, jnp.minimum(eff_depth, depth), depth)
    new_meta = (meta & ~jnp.int32(_DEPTH_BITS)) | new_depth
    return jnp.stack([node, new_meta], axis=-1)


def build_turbo_leaf_map(tree: N3Tree, level: Optional[int] = None,
                         sigma_thresh: float = 1e-2) -> LeafMap:
    """Leaf map with max-empty-cube acceleration (PERFORMANCE.md roadmap
    item 3).  Valid for renders with ``opt.sigma_thresh >= sigma_thresh``
    (a larger runtime threshold only makes more space skippable, never
    less).  Not for vote/visit frames (empty-leaf identity is coarsened);
    output drifts from the exact walk by the skipped steps' step_size
    epsilons only.
    """
    lm = build_leaf_map(tree, level=level)
    rows = _turbo_rows(lm.rows, lm.level, float(sigma_thresh))
    return LeafMap(rows=rows, level=lm.level, deep_levels=lm.deep_levels)


class FastRenderResult(NamedTuple):
    out: jax.Array        # [R, 4] rgba pre-background
    overflow: jax.Array   # [] i32: COUNT of rays that exceeded
    #                       max_dense (0 = clean; callers that only
    #                       need the flag use truthiness — the count
    #                       lets motion policies tolerate a bounded
    #                       silhouette-sweep band without escalating)
    steps: jax.Array      # [R] i32 march iterations per ray (perf feedback
                          # for step-sorted ray ordering on later frames)
    split_vote: jax.Array   # [R, 3] (need_votes=True) else zeros [0, 3]
    sample_vote: jax.Array  # [R, 3] (need_votes=True) else zeros [0, 3]
    nrec: jax.Array       # [R] i32 dense records per ray (drives the
                          # record-sorted segmented shading budgets)
    skips: jax.Array      # [R] i32 prepass entry-skip count (0 without
                          # skip_table; tertiary ray-sort key)


DYN_FIELDS = ("step_size", "sigma_thresh", "stop_thresh")


def dyn_knobs(opt: RenderOptions) -> jax.Array:
    """Pack the continuous render knobs as a traced f32[9] vector:
    [step_size, sigma_thresh, stop_thresh, render_bbox*6].  Passing this
    (with a float-normalized static ``opt``) lets slider-style knob
    changes reuse one compiled executable instead of recompiling per
    value (RenderOptions is otherwise jit-static)."""
    return jnp.asarray(
        (opt.step_size, opt.sigma_thresh, opt.stop_thresh)
        + tuple(opt.render_bbox), jnp.float32)


def normalize_static(opt: RenderOptions) -> RenderOptions:
    """Zero the float fields covered by :func:`dyn_knobs` (plus the
    composite-time background and raygen-time rot_dirs, which their
    consumers take as traced values) so the static jit key is identical
    across knob values."""
    return opt.replace(step_size=0.0, sigma_thresh=0.0, stop_thresh=0.0,
                       background_brightness=0.0,
                       render_bbox=(0.0,) * 6, rot_dirs=(0.0,) * 3)


def leaf_lookup(leaf_map: LeafMap, child_flat: jax.Array,
                sigma_flat: jax.Array, posc: jax.Array,
                N: int, N3: int):
    """One march-step leaf resolution, shared VERBATIM by the render
    march (render_rays_fast) and the guided collect march
    (guided.collect_t_fast) — their bit-exactness contract requires
    both to execute exactly this sequence (reference
    query_single_from_root, rt_core.cuh:117-159, restarted from the
    leaf map's level-L row instead of the root).

    ``posc`` = clipped tree-space positions [r, 3].  Returns
    (node, depth, sigma): the flat leaf index, its depth, and its
    sigma.  Rows cache (node, depth, sigma-f16, internal) for cells at
    or above the map level; deeper subtrees resume the child-table
    descent from the stored level-L chunk (``deep_levels`` bounded
    iterations, one child gather each)."""
    G = leaf_map.grid
    cell = jnp.floor(posc * G).astype(jnp.int32)
    lin = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]
    row = jnp.take(leaf_map.rows, lin, axis=0, mode="clip")  # [r, 2]
    node = row[:, 0]
    meta = row[:, 1]
    depth = meta & _DEPTH_BITS
    sigma = _f16_bits_to_f32((meta >> 16) & 0xFFFF)
    if leaf_map.deep_levels > 0:
        internal = (meta & _INTERNAL_BIT) != 0
        # resume descent from the stored level-L chunk
        u = posc * (1 << leaf_map.level)
        fxyz = u - jnp.floor(u)
        chunk = node
        cidx = jnp.zeros_like(node)
        ddepth = depth
        done = ~internal
        for _ in range(leaf_map.deep_levels + 1):
            upd = ~done
            u2 = fxyz * N
            digs = jnp.floor(u2)
            idx2 = (digs[:, 0] * (N * N) + digs[:, 1] * N
                    + digs[:, 2]).astype(jnp.int32)
            skip = jnp.take(child_flat, chunk * N3 + idx2,
                            mode="clip")
            leaf = skip == 0
            fxyz = jnp.where(upd[:, None], u2 - digs, fxyz)
            cidx = jnp.where(upd, idx2, cidx)
            chunk = jnp.where(upd & ~leaf, chunk + skip, chunk)
            ddepth = jnp.where(upd & ~leaf, ddepth + 1, ddepth)
            done = done | leaf
        node_deep = chunk * N3 + cidx
        node = jnp.where(internal, node_deep, node)
        depth = jnp.where(internal, ddepth, depth)
        sigma_deep = jnp.take(sigma_flat, node_deep,
                              mode="clip").astype(jnp.float32)
        sigma = jnp.where(internal, sigma_deep, sigma)
    return node, depth, sigma


@functools.partial(
    jax.jit,
    static_argnames=("opt", "max_dense", "chunk_size", "unroll",
                     "need_votes"))
def render_rays_fast(tree: N3Tree,
                     leaf_map: LeafMap,
                     dirs: jax.Array,
                     vdirs: jax.Array,
                     cen_world: jax.Array,
                     opt: RenderOptions,
                     tmax_bg: Optional[jax.Array] = None,
                     max_dense: int = 64,
                     chunk_size: int = 0,
                     unroll: int = 1,
                     need_votes: bool = False,
                     dyn: Optional[jax.Array] = None,
                     skip_table: Optional[jax.Array] = None
                     ) -> FastRenderResult:
    """Fast march: leaf-map lookup + deferred SH shading.

    Same output as :func:`render_rays` (bit-exact for N == 2 trees; see
    module docstring).  ``need_votes=True`` additionally produces the
    split/sample votes of rt_core.cuh:237-252/309-320 (identical to the
    exact path; one extra sample-count gather per step) so refinement
    frames can use the fast march too.  Visit marks are still exact-path
    only (they need the full ancestor chain).

    ``skip_table`` (from ops/pallas_march.build_skip_table, valid for
    this ``sigma_thresh``) runs the Pallas entry-skip prepass first:
    each ray's start ``t`` is advanced through entry empty space with
    bit-identical step math before the gather-bound main march begins
    (~72% of 1080p march steps on the shell benchmark).  Not for
    ``need_votes`` frames (the reference's fallback vote inspects empty
    leaves; see pallas_march docstring).
    """
    N, N3 = tree.N, tree.N3
    R = dirs.shape[0]
    data_dim = tree.data_dim
    basis_dim = tree.data_format.basis_dim
    use_sh = tree.data_format.format == "SH" and basis_dim >= 1
    child_flat = tree.child.reshape(-1)
    sigma_flat = tree.data.reshape(-1, data_dim)[:, data_dim - 1]
    counts_flat = tree.sample_counts.reshape(-1)

    if dyn is not None:
        step_size = dyn[0]
        sigma_thresh = dyn[1]
        stop_thresh = dyn[2]
        render_bbox = dyn[3:9]
    else:
        step_size = jnp.float32(opt.step_size)
        sigma_thresh = jnp.float32(opt.sigma_thresh)
        stop_thresh = jnp.float32(opt.stop_thresh)
        render_bbox = opt.render_bbox

    cen = tree.offset + tree.scale * cen_world
    d = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    d = d * delta_scale[:, None]
    if tmax_bg is None:
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)
    tmax_bg = tmax_bg / delta_scale
    invdir = 1.0 / (d + jnp.float32(1e-9))
    tmin, tmax = _dda_world_batch(cen, invdir, render_bbox)
    tmax = jnp.minimum(tmax, tmax_bg)
    miss = (tmax < 0) | (tmin > tmax)
    if skip_table is not None:
        from .pallas_march import entry_skip_prepass
        tmin, skips = entry_skip_prepass(skip_table, cen, d, invdir,
                                         tmin, tmax, ~miss, step_size,
                                         with_count=True)
    else:
        skips = jnp.zeros((R,), jnp.int32)

    if use_sh and not opt.render_depth:
        basis_all = masked_sh_basis(basis_dim, vdirs,
                                    opt.basis_minmax[0],
                                    opt.basis_minmax[1])
    else:
        basis_all = jnp.zeros((R, 1), jnp.float32)

    data_flat = tree.data.reshape(-1, data_dim)

    def march_chunk(args):
        (cen_c, d_c, invdir_c, ds_c, tmin_c, tmax_c, miss_c,
         basis_c) = args
        r = d_c.shape[0]
        # dense-sample record buffers, written via one-hot masked selects
        # (dynamic scatter is pathologically slow on TPU; a [r, S]
        # compare+select is pure VPU work and fuses into the loop body)
        nodes_buf = jnp.zeros((r, max_dense), jnp.int32)
        w_buf = jnp.zeros((r, max_dense), jnp.float32)
        t_buf = jnp.zeros((r, max_dense), jnp.float32)
        srange = jnp.arange(max_dense, dtype=jnp.int32)
        nd = jnp.zeros((r,), jnp.int32)
        nsteps = jnp.zeros((r,), jnp.int32)
        t = tmin_c
        T = jnp.ones((r,), jnp.float32)
        stopped = jnp.zeros((r,), bool)
        overflow = jnp.zeros((r,), bool)
        active = ~miss_c & (t < tmax_c)
        sv0 = jnp.concatenate(
            [jnp.full((r, 1), opt.max_depth + 1, jnp.float32),
             jnp.full((r, 2), -1.0, jnp.float32)], axis=1)
        pv0 = jnp.concatenate(
            [jnp.full((r, 1), opt.max_sample_count + 1, jnp.float32),
             jnp.full((r, 2), -1.0, jnp.float32)], axis=1)
        votes0 = (sv0, pv0, jnp.full((r,), -1.0, jnp.float32),
                  jnp.full((r,), -1.0, jnp.float32))

        def cond(c):
            return jnp.any(c[-1])

        def one_step(c):
            (t, T, nodes_buf, w_buf, t_buf, nd, nsteps, stopped,
             overflow, active, votes) = c
            nsteps = nsteps + active
            pos = cen_c + t[:, None] * d_c
            posc = jnp.clip(pos, 0.0, jnp.float32(1.0 - 1e-6))
            node, depth, sigma = leaf_lookup(
                leaf_map, child_flat, sigma_flat, posc, N, N3)

            cube = jnp.exp2(depth.astype(jnp.float32)) if N == 2 else \
                jnp.power(jnp.float32(N), depth.astype(jnp.float32))
            u = posc * cube[:, None]
            frac = u - jnp.floor(u)
            t_subcube = _dda_unit_batch(frac, invdir_c) / cube
            delta_t = t_subcube + step_size
            dense = active & (sigma > sigma_thresh)
            att = jnp.exp(-delta_t * ds_c * sigma)
            weight = T * (1.0 - att)

            if need_votes:
                # vote logic identical to the exact march
                # (ops/render.py; reference rt_core.cuh:237-252/309-320)
                split_vote, sample_vote, max_w, max_sw = votes
                sc = jnp.take(counts_flat, node,
                              mode="clip").astype(jnp.int32)
                can_split = depth < opt.max_depth
                can_sample = sc < opt.max_sample_count
                chunk_f = (node // N3).astype(jnp.float32)
                cidx_f = (node % N3).astype(jnp.float32)
                cols_s = jnp.stack(
                    [depth.astype(jnp.float32), chunk_f, cidx_f], axis=-1)
                cols_p = jnp.stack(
                    [sc.astype(jnp.float32), chunk_f, cidx_f], axis=-1)
                vs = active & can_split & jnp.where(
                    dense, weight > max_w, max_w == -1.0)
                vp = active & can_sample & jnp.where(
                    dense, weight > max_sw, max_sw == -1.0)
                split_vote = jnp.where(vs[:, None], cols_s, split_vote)
                sample_vote = jnp.where(vp[:, None], cols_p, sample_vote)
                max_w = jnp.where(
                    active & dense & can_split & (weight > max_w),
                    weight, max_w)
                max_sw = jnp.where(
                    active & dense & can_sample & (weight > max_sw),
                    weight, max_sw)
                votes = (split_vote, sample_vote, max_w, max_sw)

            # max_dense == 0 — the zero-record segment: ~half the rays
            # of a steady frame record nothing (hint p50 = 0); they
            # march with no record buffers or shading gather at all,
            # and ANY dense sample raises overflow so stale hints are
            # caught and escalated like every other segment
            overflow = overflow | (dense & (nd >= max_dense))
            if max_dense > 0:
                can_rec = dense & (nd < max_dense)
                m = can_rec[:, None] & (nd[:, None] == srange[None, :])
                if not opt.render_depth:
                    nodes_buf = jnp.where(m, node[:, None], nodes_buf)
                w_buf = jnp.where(m, weight[:, None], w_buf)
                if opt.render_depth:
                    t_buf = jnp.where(m, t[:, None], t_buf)
            # nd counts EVERY dense sample, uncapped: slot writes above
            # cap themselves via can_rec (only slots < max_dense are
            # ever written) and shading masks with slots < nd (all
            # written slots valid once nd >= max_dense), so pixels are
            # unchanged — but the returned nrec becomes a TRUE record-
            # need hint even from under-budget segments.  The budget-0
            # hint pass (render_frame_motion) and the CDF trailing max
            # (segments_from_hint_cdf top coverage) depend on this.
            nd = nd + dense.astype(jnp.int32)

            T = jnp.where(dense, T * att, T)
            stop_now = dense & (T < stop_thresh)
            stopped = stopped | stop_now
            t = jnp.where(active, t + delta_t, t)
            active = active & ~stop_now & (t < tmax_c)
            return (t, T, nodes_buf, w_buf, t_buf, nd, nsteps, stopped,
                    overflow, active, votes)

        def body(c):
            # static unroll: several leaf steps per while iteration
            # amortizes the loop's carry/cond overhead over more gathers
            for _ in range(unroll):
                c = one_step(c)
            return c

        def cond_votes(c):
            return jnp.any(c[-2])

        c = jax.lax.while_loop(
            cond_votes, body,
            (t, T, nodes_buf, w_buf, t_buf, nd, nsteps, stopped,
             overflow, active, votes0))
        (t, T, nodes_buf, w_buf, t_buf, nd, nsteps, stopped, overflow,
         _, votes) = c
        split_vote, sample_vote = votes[0], votes[1]

        # ---- deferred shading (inside the chunk so the gathered
        # coefficient block stays small: [r, max_dense, D]) ----
        slots = jnp.arange(max_dense)
        valid = slots[None, :] < nd[:, None]
        if max_dense == 0:
            # zero-record segment: nothing was recorded (any dense
            # sample raised overflow), so the composite is closed-form.
            # Depth mode matches the exact branch below: with no dense
            # samples d0 = 0 and the reference ALWAYS writes alpha 1 in
            # depth mode (rt_core.cuh:254-255, 297-298, 325-327; miss at
            # :195) — without this, miss/empty rays returned alpha 1-T=0
            # and the background leaked into depth renders.
            rgb = jnp.zeros((r, 3), jnp.float32)
            if opt.render_depth:
                alpha = jnp.ones((r,), jnp.float32)
            else:
                alpha = jnp.where(stopped, 1.0,
                                  jnp.where(miss_c, 0.0, 1.0 - T))
            out = jnp.concatenate([rgb, alpha[:, None]], axis=1)
        elif opt.render_depth:
            d0 = jnp.sum(jnp.where(valid, w_buf * t_buf, 0.0), axis=1)
            d0 = jnp.minimum(d0 * 0.3, 1.0)
            rgb = jnp.where(miss_c[:, None], 0.0,
                            jnp.broadcast_to(d0[:, None], (r, 3)))
            scale = jnp.where(stopped, 1.0 / (1.0 - T), 1.0)
            rgb = rgb * scale[:, None]
            out = jnp.concatenate(
                [rgb, jnp.ones((r, 1), jnp.float32)], axis=1)
        else:
            leaf = jnp.take(data_flat, nodes_buf.reshape(-1), axis=0,
                            mode="clip").astype(jnp.float32)
            leaf = leaf.reshape(r, max_dense, data_dim)
            if use_sh:
                coeffs = leaf[..., :3 * basis_dim].reshape(
                    r, max_dense, 3, basis_dim)
                logits = jnp.einsum("rb,rscb->rsc", basis_c, coeffs)
                rgb_s = jax.nn.sigmoid(logits)
            else:
                rgb_s = leaf[..., :3]
            rgb = jnp.sum(
                jnp.where(valid[..., None],
                          w_buf[..., None] * rgb_s, 0.0), axis=1)
            scale = jnp.where(stopped, 1.0 / (1.0 - T), 1.0)
            rgb = rgb * scale[:, None]
            alpha = jnp.where(stopped, 1.0,
                              jnp.where(miss_c, 0.0, 1.0 - T))
            out = jnp.concatenate([rgb, alpha[:, None]], axis=1)
        return (out, jnp.sum(overflow, dtype=jnp.int32), nsteps,
                split_vote, sample_vote, nd)

    all_args = (jnp.broadcast_to(cen, (R, 3)), d, invdir, delta_scale,
                tmin, tmax, miss, basis_all)
    if chunk_size and R % chunk_size == 0 and R > chunk_size:
        n_chunks = R // chunk_size

        def reshape(a):
            return a.reshape((n_chunks, chunk_size) + a.shape[1:])

        out, overflow, nsteps, split_vote, sample_vote, nrec = jax.lax.map(
            march_chunk, tuple(map(reshape, all_args)))
        out = out.reshape(R, 4)
        nsteps = nsteps.reshape(R)
        split_vote = split_vote.reshape(R, 3)
        sample_vote = sample_vote.reshape(R, 3)
        nrec = nrec.reshape(R)
        overflow = jnp.sum(overflow, dtype=jnp.int32)
    else:
        out, overflow, nsteps, split_vote, sample_vote, nrec = march_chunk(
            all_args)

    if not need_votes:
        split_vote = jnp.zeros((0, 3), jnp.float32)
        sample_vote = jnp.zeros((0, 3), jnp.float32)
    return FastRenderResult(out, overflow, nsteps, split_vote,
                            sample_vote, nrec, skips)


# Escalation cap for the device-side fallback march — matches the host
# escalation protocol's md <= 128 ceiling (Viewer/bench).
_FALLBACK_MD = 128


@functools.partial(
    jax.jit,
    static_argnames=("opt", "width", "seg_counts", "chunk_size", "unroll",
                     "need_votes", "return_hints", "group",
                     "device_fallback", "sorted_output"))
def _frame_core(tree: N3Tree, leaf_map: LeafMap,
                perm: jax.Array, inv: jax.Array,
                transform: jax.Array, intr: jax.Array,
                rot_dirs: jax.Array, bg_value: jax.Array,
                dyn: Optional[jax.Array],
                skip_table: Optional[jax.Array],
                *, opt: RenderOptions, width: int,
                seg_counts: tuple, chunk_size: int, unroll: int,
                need_votes: bool, return_hints: bool, group: int = 1,
                device_fallback: bool = False,
                sorted_output: bool = False):
    """One-dispatch fast frame: raygen -> (prepass) -> per-segment march
    -> unpermute -> background composite, all inside a single jit.

    The eager version of this sequence paid per-op dispatch overhead for
    ray generation, segment stitching and compositing (~80 ms of a
    ~227 ms 1080p frame on the v5e benchmark); fusing it into one
    compiled program leaves only the compute.  Pixels are identical to
    the unfused path.  ``intr`` = traced [fx, fy, cx, cy] so camera
    motion and focal changes never recompile; ``seg_counts`` =
    ((n_chunks, max_dense), ...) static segment layout.

    ``group`` > 1 asserts that (perm, inv) are group-structured (from
    ``order_from_hints(..., group=g)``): the final unpermute then moves
    [R/g, 4g] rows instead of [R, 4] — the XLA gather costs per row, so
    this is ~g-fold cheaper (10.8 -> ~3 ms at 1080p g=4).

    ``device_fallback``: fold budget escalation into the compiled
    program — when any reduced-budget segment overflows (stale
    hints/budgets under camera motion), an XLA conditional re-marches
    the whole sorted frame at the ``_FALLBACK_MD`` cap ON DEVICE, so
    the returned frame is always correct and the caller never needs a
    synchronous overflow fetch (the axon dev link charges ~27 ms per
    mid-pipeline host sync; production links ~1 ms).  ``seg_overflow``
    still reports which budgets went stale — check it ASYNCHRONOUSLY
    (e.g. one frame late) to refresh budgets/hints — and
    ``fb_overflow`` reports the pathological case where even the cap
    overflowed and only the exact renderer is correct.  MEASURED COST:
    the conditional is a fusion/scheduling barrier — ~24 ms/frame at
    1080p steady state on v5e (85 vs 61 ms), even though a standalone
    scalar-predicate cond with an untaken heavy branch times at ~0 —
    so prefer the Viewer's "async" overflow policy for throughput and
    reserve "device" for callers needing both exactness and
    sync-freedom.
    """
    from .render import composite_background
    from .rays import screen2worlddir_indices, rodrigues
    R = inv.shape[0]
    n_total = sum(c for c, _ in seg_counts) * chunk_size
    pad = n_total - R
    pix = perm if not pad else jnp.concatenate(
        [perm, jnp.broadcast_to(perm[-1:], (pad,))])
    dirs_p, cen = screen2worlddir_indices(
        pix, width, intr[0], intr[1], intr[2], intr[3], transform)
    vdirs_p = rodrigues(rot_dirs, dirs_p)

    packed = return_hints == "packed"

    def _hints_of(res):
        # "packed" folds the three [n] hint arrays into ONE i32 per ray
        # (pack_hints layout) INSIDE the fused frame: the final pixel-
        # order unpermute then moves one array instead of three — the
        # [2M]-row gather is a per-row cost (~25 ms each at 1080p
        # through XLA's gather floor), so this saves two full gathers
        # per motion frame.  Budget classes only read the nrec field,
        # which the packing preserves exactly (8-bit cap 255 > the 128
        # budget ceiling).
        if packed:
            return [pack_hints(res.steps, res.nrec, res.skips)]
        return [res.steps, res.nrec, res.skips]

    n_hints = (1 if packed else 3) if return_hints else 0
    outs, ovs, svs, pvs = [], [], [], []
    hints_l = [[] for _ in range(n_hints)]
    off = 0
    for c_chunks, md in seg_counts:
        if c_chunks == 0:
            # ray-floor chunk quantization (segment_chunks) can assign
            # an empty layout slot to a tiny class; keep the overflow
            # vector index-aligned with the caller's segment list
            ovs.append(jnp.zeros((), jnp.int32))
            continue
        n = c_chunks * chunk_size
        sl = slice(off, off + n)
        res = render_rays_fast(
            tree, leaf_map, dirs_p[sl], vdirs_p[sl], cen, opt,
            max_dense=md, chunk_size=chunk_size if c_chunks > 1 else 0,
            unroll=unroll, need_votes=need_votes, dyn=dyn,
            skip_table=skip_table)
        outs.append(res.out)
        ovs.append(res.overflow)
        if need_votes:
            svs.append(res.split_vote)
            pvs.append(res.sample_vote)
        if return_hints:
            for lst, h in zip(hints_l, _hints_of(res)):
                lst.append(h)
        off += n

    def pack(out_cat, sv, pv, hints, fb_ov):
        parts = [out_cat]
        if need_votes:
            parts += [sv, pv]
        parts += hints
        return tuple(parts) + (fb_ov,)

    fb_overflow = None
    if device_fallback:
        def _seg(_):
            return pack(
                jnp.concatenate(outs, 0),
                jnp.concatenate(svs, 0) if need_votes else None,
                jnp.concatenate(pvs, 0) if need_votes else None,
                [jnp.concatenate(lst, 0) for lst in hints_l],
                jnp.int32(0))

        def _fb(_):
            res = render_rays_fast(
                tree, leaf_map, dirs_p, vdirs_p, cen, opt,
                max_dense=_FALLBACK_MD, chunk_size=chunk_size,
                unroll=unroll, need_votes=need_votes, dyn=dyn,
                skip_table=skip_table)
            return pack(res.out,
                        res.split_vote if need_votes else None,
                        res.sample_vote if need_votes else None,
                        _hints_of(res) if return_hints else [],
                        res.overflow)

        sel = jax.lax.cond(jnp.stack(ovs).sum() > 0, _fb, _seg, None)
        i = 0
        out = sel[i][:R]
        i += 1
        if need_votes:
            svs, pvs = [sel[i]], [sel[i + 1]]
            i += 2
        hints_l = [[sel[i + k]] for k in range(n_hints)]
        i += n_hints
        fb_overflow = sel[-1]
    else:
        out = jnp.concatenate(outs, 0)[:R]
    # unpermute with the unique-indices hint: inv is a permutation, and
    # XLA's gather occasionally lowers jnp.take ~4x slower than the
    # hinted .at[].get on identical shapes (measured 48.6 vs 10.6 ms
    # at [2M, 4] in a fresh process)
    if sorted_output:
        # display-consumer mode: skip the final unpermute entirely —
        # rows stay in perm (segment) order and the consumer applies
        # ``inv`` as an index map at display time (PERFORMANCE.md
        # roadmap: the [R, 4] gather is a ~10.8 ms per-row device
        # floor at 1080p).  The background composite is elementwise,
        # so compositing in sorted space is bit-identical.
        pass
    elif group > 1 and R % group == 0:
        ginv = inv[::group] // group
        out = out.reshape(R // group, 4 * group).at[ginv].get(
            unique_indices=True, mode="clip").reshape(R, 4)
    else:
        out = out.at[inv].get(unique_indices=True, mode="clip")
    img = composite_background(out, opt, bg_value=bg_value)
    def unperm(parts):
        return jnp.concatenate(parts, 0)[:R].at[inv].get(
            unique_indices=True, mode="clip")

    ret = dict(img=img, seg_overflow=jnp.stack(ovs))
    if fb_overflow is not None:
        ret["fb_overflow"] = fb_overflow
    if need_votes:
        ret["split_vote"] = unperm(svs)
        ret["sample_vote"] = unperm(pvs)
    if packed:
        ret["hints_packed"] = unperm(hints_l[0])
    elif return_hints:
        ret["steps"] = unperm(hints_l[0])
        ret["nrec"] = unperm(hints_l[1])
        ret["skips"] = unperm(hints_l[2])
    return ret


def _frame_core_args(camera, opt: RenderOptions, dynamic_knobs: bool):
    """Shared wrapper plumbing for the fused frame: traced camera /
    knob arrays + the (possibly normalized) static options key."""
    transform = jnp.asarray(camera.transform)
    intr = jnp.asarray((camera.fx, camera.fy, camera.cx, camera.cy),
                       jnp.float32)
    rot_dirs = jnp.asarray(opt.rot_dirs, jnp.float32)
    bg_value = jnp.float32(opt.background_brightness)
    if dynamic_knobs:
        dyn = dyn_knobs(opt)
        opt = normalize_static(opt)
    else:
        dyn = None
        opt = opt.replace(background_brightness=0.0, rot_dirs=(0.0,) * 3)
    return transform, intr, rot_dirs, bg_value, dyn, opt


def block_permutation(width: int, height: int, block: int = 16):
    """Pixel permutation grouping rays into spatially coherent 2-D
    blocks (the fast path's tiles), plus its inverse.  Rays within a
    block traverse similar content so a tile's march terminates
    together — the TPU analogue of CUDA thread-block coherence."""
    ys, xs = np.meshgrid(np.arange(height), np.arange(width),
                         indexing="ij")
    by = ys // block
    bx = xs // block
    nbx = (width + block - 1) // block
    key = ((by * nbx + bx) * (block * block)
           + (ys % block) * block + (xs % block))
    perm = np.argsort(key.reshape(-1), kind="stable")
    inv = np.argsort(perm, kind="stable")
    return jnp.asarray(perm, jnp.int32), jnp.asarray(inv, jnp.int32)


def _argsort_small_keys(keys: np.ndarray) -> tuple:
    """(perm, inv) stable argsort of small non-negative int keys; native
    counting sort when built (~20x faster than numpy at 2M rays)."""
    from .. import native
    if native.available():
        try:
            perm_np, inv_np = native.argsort_counts(keys)
            return (jnp.asarray(perm_np, jnp.int32),
                    jnp.asarray(inv_np, jnp.int32))
        except RuntimeError:
            pass
    perm_np = np.argsort(keys, kind="stable")
    return (jnp.asarray(perm_np, jnp.int32),
            jnp.asarray(np.argsort(perm_np, kind="stable"), jnp.int32))


def _axis_windows(window):
    """Normalize a dilation window spec to per-axis (wy, wx).

    An int dilates isotropically (legacy spec); a (wy, wx) tuple
    dilates each image axis by its own window — a yaw orbit sweeps
    ~58 px horizontally but only ~17 px vertically at 1080p
    (measured), and the pooled area is what fattens budget classes
    (motion put 50% of rays in the top record class isotropically),
    so directional windows cut the over-classing ~4x for the same
    protection."""
    if isinstance(window, tuple):
        return window
    return (window, window)


def _pool2d_max(img, wy: int, wx: int):
    """Doubling roll-max dilation with per-axis windows; reach per
    direction is window-1 (k = 1, 2, ... < window summed)."""
    for axis, w in ((0, wy), (1, wx)):
        k = 1
        while k < w:
            img = jnp.maximum(
                img, jnp.maximum(jnp.roll(img, k, axis),
                                 jnp.roll(img, -k, axis)))
            k *= 2
    return img


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "window"))
def dilate_hints(steps, nrec, skips=None, *, width: int, height: int,
                 window):
    """Motion-compensate per-ray hints by a 2-D max dilation.

    A camera move of a degrees shifts silhouettes by ~fx*tan(a) pixels
    (58 px per 3-degree orbit pose at 1080p), so hint-derived record
    classes go stale exactly along the moving silhouette band — and a
    band ray classed 'records nothing' yesterday that records today
    either truncates (async policy) or escalates its whole segment
    (264 vs 102 ms/frame once the ladder walks up, measured).  Max-
    pooling the hints over the expected sweep window classes band rays
    by their neighborhood's worst case PREEMPTIVELY: budgets stay at
    the steady classes and overflow stays rare under motion.  Doubling
    roll-max passes (~log2(window) x 2 axes elementwise sweeps, ~1 ms
    at 1080p); rolls wrap at frame edges, which can only over-budget a
    border row (never truncate).  Pure perf shaping — records/pixels
    are unaffected by over-classing.  ``window``: int or per-axis
    (wy, wx) — see :func:`_axis_windows`.
    """
    wy, wx = _axis_windows(window)

    def pool(a):
        return _pool2d_max(a.reshape(height, width), wy, wx).reshape(-1)
    # skips is optional: the guided path dilates only (steps, ns) and
    # shouldn't pay a third full-frame sweep for a discarded output
    return pool(steps), pool(nrec), (None if skips is None
                                     else pool(skips))


def pack_hints(steps, nrec, skips):
    """Fold per-ray (steps, nrec, skips) hints into ONE i32.

    Layout [nrec:8b @18 | steps:9b @9 | skips:9b @0] — the SAME shift
    layout :func:`order_from_hints_device` sorts by, so the packed
    value doubles as the order key directly (nrec is primary, steps
    secondary, skips tertiary; identical class grouping, higher nrec
    tie-break resolution).  The nrec field cap (255) exceeds the 128
    budget-escalation ceiling, so budget classes and the CDF trailing
    max survive packing exactly.  Motivation: the motion path consumes
    hints every pose, and three separate [2M] pixel-order unpermute
    gathers cost ~25 ms EACH at 1080p (XLA gathers bill per row) —
    one packed array cuts that to one gather and one dilation pool.
    """
    steps = jnp.minimum(jnp.asarray(steps, jnp.int32), 511)
    nrec = jnp.minimum(jnp.asarray(nrec, jnp.int32), 255)
    skips = (jnp.zeros_like(steps) if skips is None
             else jnp.minimum(jnp.asarray(skips, jnp.int32), 511))
    return (nrec << 18) | (steps << 9) | skips


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "window"))
def dilate_packed(ph, *, width: int, height: int, window):
    """Motion-compensate PACKED hints by one 2-D max dilation.

    Max over packed keys is a lexicographic (nrec, steps, skips) max:
    the nrec field of the pooled value is EXACTLY the window's nrec
    max (what budget classing needs); steps/skips come from the
    window's argmax-nrec ray — an approximation that only perturbs the
    sort's secondary locality heuristic, never budgets or pixels.
    One pooled array replaces :func:`dilate_hints`'s three sweeps.
    ``window``: int or per-axis (wy, wx) — see :func:`_axis_windows`.
    """
    wy, wx = _axis_windows(window)
    img = jnp.asarray(ph, jnp.int32).reshape(height, width)
    return _pool2d_max(img, wy, wx).reshape(-1)


@functools.partial(jax.jit, static_argnames=("classes",))
def hint_class_cdf_packed(ph, classes: tuple = (0, 1, 2, 4, 8)):
    """:func:`hint_class_cdf` over the nrec field of packed hints."""
    nrec = jnp.asarray(ph, jnp.int32) >> 18
    return jnp.stack([jnp.sum((nrec <= c).astype(jnp.int32))
                      for c in classes] + [jnp.max(nrec)])


@jax.jit
def order_from_packed_device(ph) -> tuple:
    """Device-resident (perm, inv) from PACKED hints: the packed value
    IS the sort key (see :func:`pack_hints`), so the motion rebuild
    skips the key re-packing and two of three hint arrays entirely."""
    key = jnp.asarray(ph, jnp.int32)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32),
        unique_indices=True)
    return perm, inv


def class_ladder(top: int) -> tuple:
    """The power-of-two budget-class ladder (0, 1, 2, ..., top): the
    bounded jit-key family every CDF-derived segment tuple draws its
    budgets from (render path: dense-record classes; guided path:
    per-ray sample classes with top = max_guided_samples)."""
    classes = [0]
    c = 1
    while c < top:
        classes.append(c)
        c *= 2
    classes.append(int(top))
    return tuple(classes)


@functools.partial(jax.jit, static_argnames=("classes",))
def hint_class_cdf(nrec, classes: tuple = (0, 1, 2, 4, 8)):
    """Device-side CDF of per-ray record hints over the budget-class
    ladder, plus the hint MAX as the trailing entry: counts[i] = #rays
    with nrec <= classes[i], out[-1] = max(nrec).  A [len+1] i32 fetch
    is all a caller needs to derive CDF-matched segment fractions AND
    a top budget that actually covers the heaviest ray (vs fetching
    the full [R] hint array)."""
    nrec = jnp.asarray(nrec, jnp.int32)
    return jnp.stack([jnp.sum((nrec <= c).astype(jnp.int32))
                      for c in classes] + [jnp.max(nrec)])


def segments_from_hint_cdf(cdf_counts, R: int,
                           classes: tuple = (0, 1, 2, 4, 8),
                           quant: int = 16,
                           headroom: bool = False,
                           max_budget: int = 128,
                           margin: int = 0,
                           top_headroom: bool = False) -> tuple:
    """(fraction, max_dense) segments from a hint-class CDF.

    Fractions are FLOORED to 1/``quant`` so every class boundary sits
    at or below its CDF point: rays in a class then genuinely fit its
    budget whenever the keys used for sorting upper-bound the true
    record counts (exact hints on a parked camera).  Quantization
    keeps the tuple a bounded jit-key family.  The last class takes
    the remainder, with a budget that COVERS the observed hint max
    (``cdf_counts[-1]`` when the CDF carries the hint_class_cdf
    trailing max entry) rounded up to the next ladder step: a fixed
    ``classes[-1]`` top used to livelock scenes whose heaviest rays
    record more — every re-hint derivation reset the escalated top
    back below the true need and the next frame re-overflowed.  Rays
    beyond the (capped) top still escalate via the overflow protocol.

    ``headroom=True`` (motion): each non-zero class gets the NEXT
    ladder budget.  Dilated hints bound silhouette sweeps (spatially
    confined 0->k transitions) but not coherent VALUE transitions —
    at the 1080p shell limb a whole grazing annulus goes from 1 to 2
    records per 3-degree pose (measured ~11k rays), which no
    neighborhood max of yesterday's 1s can predict.  One ladder step
    absorbs those; two-step jumps stay under the async tolerance.
    The zero class keeps budget 0: empty interiors are exactly what
    dilation does bound.

    ``margin`` (RE-HINT motion, render_frame_motion): shift every
    class boundary ``margin`` quanta BELOW its CDF floor.  The re-hint
    path sorts by THIS pose's exact counts but derives budgets from a
    previous pose's CDF (the only one the host has without a mid-pose
    sync), so the exposure is pose-to-pose drift of the global class
    HISTOGRAM — margin=1 tolerates 1/quant (6.25%) of frame rays
    migrating up a class, for the price of that sliver rendering one
    ladder step rich.  ``top_headroom`` rounds the final class budget
    one ladder step past the observed max for the same reason (a new
    pose can expose a heavier ray than any yesterday's max saw)."""
    counts = np.asarray(cdf_counts)
    top = int(classes[-1])
    if counts.shape[0] == len(classes) + 1:
        # trailing entry = observed hint max; round up the final class
        # budget along the power-of-two ladder (bounded tuple family)
        need = int(counts[-1])
        counts = counts[:-1]
        while top < need and top < max_budget:
            top = max(1, top * 2)
    if top_headroom and top < max_budget:
        top = max(1, top * 2)
    # When the overflow top exceeds the ladder, classes[-1] stays a REAL
    # boundary and only the remainder pays ``top``.  The old behavior
    # merged the whole final ladder class into the raised top — on the
    # aerial artifact (hint max 18) that rendered 38% of frame rays at
    # budget 32 instead of 8, measured 370 vs 217 ms/frame; scenes whose
    # max fits the ladder (the shell, max 8) are unchanged.
    boundaries = classes if top > int(classes[-1]) else classes[:-1]
    segs = []
    used = 0.0
    for i, (c, cnt) in enumerate(zip(boundaries, counts[:len(boundaries)])):
        f = max(0.0, np.floor(cnt / R * quant) - margin) / quant
        f = min(f, 1.0 - 1.0 / quant)
        if f > used:
            if headroom and c > 0:
                md = min(top, int(classes[i + 1]) if i + 1 < len(classes)
                         else int(c) * 2)
            else:
                md = int(c)
            segs.append((f - used, md))
            used = f
    segs.append((1.0 - used, top))
    return tuple(segs)


# budget-value set for chunk-exact segment derivation: small enough to
# bound the per-executable sub-program count (each distinct budget in a
# segment tuple instantiates its own march+shading sub-program), dense
# enough low down that quantization waste stays a fraction of a slot
CHUNK_EXACT_BUDGETS = (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32,
                       48, 64, 96, 128)


def seg_counts_from_hints(nrec_sorted, chunk_size: int,
                          quantum: int = 1,
                          budgets: tuple = CHUNK_EXACT_BUDGETS) -> tuple:
    """Chunk-exact segment budgets from SORTED record hints.

    The ladder derivation (:func:`segments_from_hint_cdf`) buys a
    bounded jit-key family for interactive sessions at the price of
    budget-slot waste: every ray in a class pays the class budget, and
    the coarse ladder (0, 1, 2, 4, 8, ...) leaves the fat mid-bands of
    record-heavy scenes 1.4-1.6x over-budgeted (measured 8.5 ns per
    ray-slot on the aerial artifact — ~20 ms/frame of pure padding).
    For a SETTLED order (parked camera, benchmarks, orbit captures)
    the per-chunk record maxes are known exactly, so each run of
    chunks can take the smallest covering budget instead:

      * per-chunk budget = max(nrec) over its sorted rays, rounded UP
        into ``budgets`` (monotone in sorted order by construction);
      * adjacent equal-budget chunks merge into one segment;
      * with ``quantum`` > 1 (sharded frames: quantum = n_shards) each
        segment's chunk count rounds to a quantum multiple by moving
        boundary chunks into the RICHER neighbor — budgets only ever
        grow, so every ray still provably fits its segment.

    Returns ``((n_chunks, budget), ...)`` — the ``seg_counts`` layout
    consumed by ``_frame_core`` / ``segmented_shard_body``.  Budgets
    cover this pose's hints exactly; callers keep the standard
    overflow-escalation protocol for drift.
    """
    nh = np.asarray(nrec_sorted)
    R = nh.size
    pad = (-R) % (chunk_size * max(quantum, 1))
    if pad:
        nh = np.concatenate([nh, np.full(pad, nh[-1], nh.dtype)])
    cmax = nh.reshape(-1, chunk_size).max(1)
    bu = np.asarray(budgets)
    if cmax.max() > bu[-1]:
        raise ValueError(f"hint max {cmax.max()} exceeds budget cap "
                         f"{bu[-1]}")
    q = bu[np.searchsorted(bu, cmax, side="left")]
    q = np.maximum.accumulate(q)          # monotone under any tie noise
    # run-length encode
    runs = []
    for b in q:
        if runs and runs[-1][1] == int(b):
            runs[-1][0] += 1
        else:
            runs.append([1, int(b)])
    if quantum > 1:
        # move remainder chunks into the next (richer) run; the final
        # run's count is a quantum multiple by construction (total is)
        for i in range(len(runs) - 1):
            rem = runs[i][0] % quantum
            if rem:
                runs[i][0] -= rem
                runs[i + 1][0] += rem
        runs = [r for r in runs if r[0] > 0]
        # merging may have created equal-budget neighbors
        merged = []
        for n, b in runs:
            if merged and merged[-1][1] == b:
                merged[-1][0] += n
            else:
                merged.append([n, b])
        runs = merged
    return tuple((n, b) for n, b in runs)


@jax.jit
def order_from_hints_device(steps, nrec, skips=None) -> tuple:
    """Device-resident (perm, inv) from per-frame hints — the motion
    path's order rebuild.

    The host path (:func:`order_from_hints`) fetches three [R] hint
    arrays, argsorts on host, and uploads two [R] index arrays — ~3 ms
    on a production link but 0.6-1.3 s through the axon dev tunnel
    (measured), which made per-pose order refresh unaffordable and
    left motion frames marching on stale orders (chunk-max waste) with
    permanently escalated budgets.  Packing the same 3-part key and
    sorting ON DEVICE (argsort [2M] ~34 ms, scatter-inverse ~40 ms on
    v5e) keeps the whole refresh off the host: fresh order every pose,
    zero transfers.  Same stable sort, same key packing -> identical
    permutation to the host path (tested)."""
    steps = jnp.asarray(steps, jnp.int32)
    nrec = jnp.asarray(nrec, jnp.int32)
    if skips is None:
        skips = jnp.zeros_like(steps)
    key = (jnp.minimum(nrec, 15) << 18) \
        | (jnp.minimum(steps, 511) << 9) \
        | jnp.minimum(jnp.asarray(skips, jnp.int32), 511)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32),
        unique_indices=True)
    return perm, inv


@jax.jit
def order_from_ns_steps_device(nrec, steps) -> tuple:
    """Device-resident (perm, inv) for the GUIDED collect's cost sort.

    Same key order as the host :func:`order_from_hints` (primary =
    record count so the CDF budget classes stay contiguous, secondary
    = march steps) but packed for guided ranges (ns <= 64 needs 6
    bits, vs the render path's 4-bit nrec cap which would tie every
    heavy recorder and mis-place segment boundaries).  Identical
    permutation to the host path whenever ns < 64 and steps < 4096
    (stable sorts break ties by index on both).  Building on device
    skips two [R] hint fetches + a host argsort per invalidation
    (~0.5 s of the dev tunnel's 35 MB/s link at 1080p; host argsort of
    a [2M] key alone is ~100 ms anywhere)."""
    nrec = jnp.asarray(nrec, jnp.int32)
    steps = jnp.asarray(steps, jnp.int32)
    key = (jnp.minimum(nrec, 63) << 12) | jnp.minimum(steps, 4095)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32),
        unique_indices=True)
    return perm, inv


def order_from_steps(steps) -> tuple:
    """Build a (perm, inv) ray ordering from per-ray march costs (the
    ``steps`` output of a previous frame).  Compute once per camera
    move, not per frame — the argsort and host->device upload of two
    [H*W] index arrays are not free."""
    return _argsort_small_keys(np.asarray(steps))


def order_from_hints(steps, nrec, skips=None, group: int = 1) -> tuple:
    """(perm, inv) ordering for the SEGMENTED fast path: primary key =
    dense-record count (heavy recorders cluster in the tail chunks,
    where the large ``max_dense`` segment lives), secondary = march step
    count (uniform-cost march tiles within each record class), optional
    tertiary = prepass entry-skip count (coherent prepass blocks: the
    Pallas prepass runs block-max iterations, so grouping equal-cost
    rays cuts its ~5x max/mean waste without touching march tiling —
    the first two keys are preserved exactly).

    ``group`` sorts fixed runs of ``group`` consecutive pixels by their
    run-max key instead of single rays.  The permutation then moves
    [R/group, 4*group] rows, so the frame's final unpermute gather —
    whose XLA cost is per ROW (~10 ns regardless of width; measured
    10.8 ms/frame at 1080p for g=1) — shrinks ~group-fold, at the price
    of slightly less uniform march tiles (measured waste 1.15 -> 1.17
    at g=2, 1.29 at g=4 on the shell fixture).  Pass the same value as
    the render functions' ``group``."""
    steps = np.asarray(steps)
    nrec = np.asarray(nrec)
    if skips is None and group == 1:
        key = (np.minimum(nrec, 255).astype(np.int32) << 12) \
            | np.minimum(steps, 4095).astype(np.int32)
        return _argsort_small_keys(key)
    if skips is None:
        skips = np.zeros_like(steps)
    skips = np.asarray(skips)
    # 4+9+9 = 22 bits: the native counting sort caps keys at 2^22.
    # The nrec cap of 15 is below the post-escalation max_dense (up to
    # 128): heavy recorders beyond 15 tie in the primary key, so
    # segment placement is coarser on frames rendered between an
    # overflow escalation and the next hint refresh.  That window is
    # transient by design — the Viewer refreshes hints on the next
    # camera move, and the escalated segment's larger budget keeps the
    # frame correct regardless (overflow re-raises if not).
    key = (np.minimum(nrec, 15).astype(np.int32) << 18) \
        | (np.minimum(steps, 511).astype(np.int32) << 9) \
        | np.minimum(skips, 511).astype(np.int32)
    if group == 1:
        return _argsort_small_keys(key)
    R = key.shape[0]
    if R % group:
        raise ValueError(f"ray count {R} not divisible by group {group}")
    gkey = key.reshape(-1, group).max(1)
    gperm, _ = _argsort_small_keys(gkey)
    gperm = np.asarray(gperm)
    perm = (gperm.astype(np.int64)[:, None] * group
            + np.arange(group, dtype=np.int64)[None, :]).reshape(-1)
    inv = np.empty(R, np.int32)
    inv[perm] = np.arange(R, dtype=np.int32)
    return (jnp.asarray(perm, jnp.int32), jnp.asarray(inv, jnp.int32))


# Per-segment (ray fraction, max_dense) budgets for record-sorted frames.
# Fractions follow the measured steady-state nrec CDF on the 1080p
# shell benchmark (52.3% of rays record nothing, 87.7% <= 1, 94.2%
# <= 2, 99% <= 3, max 5) with a little headroom per class — so half
# the frame runs the zero-record segment (no record buffers, no
# shading gather at all) and most of the rest pays a [r, 1, D]
# deferred-shading gather (cutting the md=2 class from the earlier
# 25% to its true ~6.5% measured 15.5 -> 16.2 fps).  Any overflowing
# segment is escalated by the caller (Viewer/bench raise its
# max_dense — 0 -> 1, then doubling — and re-render).
DEFAULT_SEGMENTS = ((0.515, 0), (0.35, 1), (0.065, 2),
                    (0.055, 4), (0.015, 8))


def render_frame_fast(tree: N3Tree, leaf_map: LeafMap,
                      camera, opt: RenderOptions,
                      max_dense: int = 64,
                      chunk_size: int = 65536,
                      block: int = 128,
                      step_hint: Optional[np.ndarray] = None,
                      order: Optional[tuple] = None,
                      unroll: int = 1,
                      need_votes: bool = False,
                      dynamic_knobs: bool = False,
                      return_nrec: bool = False,
                      skip_table: Optional[jax.Array] = None,
                      return_skips: bool = False):
    """Full fast frame: reordered rays -> fast march -> composite.

    Ray ordering: by default rays are grouped into spatially coherent
    pixel blocks.  ``order`` = (perm, inv) device index arrays (from
    :func:`order_from_steps`) packs rays into uniform-cost tiles so the
    per-tile while loops run ~mean instead of ~max iterations;
    ``step_hint`` is a convenience that builds the order inline (slower
    per frame).  Ordering only affects performance — pixels are
    identical.

    Returns ([H, W, 4] f32, overflow bool, steps [H*W] i32 in pixel
    order); with ``need_votes=True`` additionally (split_vote [H*W, 3],
    sample_vote [H*W, 3]); with ``return_nrec=True`` additionally the
    per-ray dense-record counts (for :func:`order_from_hints` /
    segmented steady-state frames); with ``return_skips=True`` finally
    the per-ray prepass entry-skip counts (the tertiary sort key) —
    all in pixel order.
    """
    from .render import composite_background
    w, h = camera.width, camera.height
    R = w * h
    if chunk_size and R > chunk_size:
        if order is not None:
            perm, inv = order
        elif step_hint is not None:
            perm, inv = order_from_steps(step_hint)
        else:
            perm, inv = block_permutation(w, h, block)
        transform, intr, rot_dirs, bg_value, dyn, opt = _frame_core_args(
            camera, opt, dynamic_knobs)
        n_chunks = (R + chunk_size - 1) // chunk_size
        res = _frame_core(
            tree, leaf_map, perm, inv, transform, intr, rot_dirs,
            bg_value, dyn, skip_table, opt=opt, width=w,
            seg_counts=((n_chunks, max_dense),), chunk_size=chunk_size,
            unroll=unroll, need_votes=need_votes, return_hints=True)
        img = res["img"]
        overflow = res["seg_overflow"][0]
        steps = res["steps"]
        skips = res["skips"]
        if return_nrec:
            nrec = res["nrec"]
        if need_votes:
            split_vote = res["split_vote"]
            sample_vote = res["sample_vote"]
    else:
        rot_dirs = jnp.asarray(opt.rot_dirs, jnp.float32)
        if dynamic_knobs:
            dyn = dyn_knobs(opt)
            bg_value = jnp.float32(opt.background_brightness)
            opt = normalize_static(opt)
        else:
            dyn = None
            bg_value = None
        dirs, cen = screen2worlddir(w, h, camera.fx, camera.fy,
                                    camera.cx, camera.cy,
                                    jnp.asarray(camera.transform))
        vdirs = rodrigues(rot_dirs, dirs)
        res = render_rays_fast(tree, leaf_map, dirs, vdirs, cen, opt,
                               max_dense=max_dense, chunk_size=0,
                               unroll=unroll, need_votes=need_votes,
                               dyn=dyn, skip_table=skip_table)
        out = composite_background(res.out, opt, bg_value=bg_value)
        img = out
        overflow = res.overflow
        steps = res.steps
        skips = res.skips
        if return_nrec:
            nrec = res.nrec
        if need_votes:
            split_vote = res.split_vote
            sample_vote = res.sample_vote
    ret = [img.reshape(h, w, 4), overflow, steps]
    if need_votes:
        ret += [split_vote, sample_vote]
    if return_nrec:
        ret.append(nrec)
    if return_skips:
        ret.append(skips)
    return tuple(ret)


def segment_chunks(n_chunks: int, segments,
                   n_rays: Optional[int] = None,
                   chunk_size: Optional[int] = None) -> tuple:
    """Resolve (fraction, max_dense) segments into whole-chunk counts.

    Boundaries are CUMULATIVE FLOORS: segment i ends at
    floor(sum(frac[:i+1]) * n_chunks) chunks (or, when ``n_rays`` and
    ``chunk_size`` are given, at floor(cumfrac * n_rays / chunk_size) —
    exact even when the last chunk is partial).  Flooring is the load-
    bearing property: each class boundary sits AT OR BELOW its ray
    fraction, so rays sorted by record hints genuinely fit their class
    budget whenever the derivation's fractions do (the "classes
    provably fit" contract, segments_from_hint_cdf).  The previous
    nearest-rounding (+ a 1-chunk minimum) pushed boundaries PAST
    their CDF points whenever the derivation's 1/16-floor slack was
    smaller than a chunk, leaking next-class rays into a smaller
    budget — a permanent per-frame overflow/re-hint loop on a parked
    camera.  A segment may now get ZERO chunks (its rays land in the
    next, larger-budget class); consumers skip empty slots but keep
    the overflow vector index-aligned.  The last segment absorbs the
    remainder."""
    counts = []
    used = 0
    cumfrac = 0.0
    for i, (frac, md) in enumerate(segments):
        cumfrac += frac
        if i == len(segments) - 1:
            tgt = n_chunks
        elif n_rays is not None and chunk_size is not None:
            tgt = min(n_chunks, int(cumfrac * n_rays) // chunk_size)
        else:
            tgt = min(n_chunks, int(cumfrac * n_chunks))
        counts.append((max(0, tgt - used), md))
        used = max(used, tgt)
    return tuple(counts)


def render_frame_fast_segmented(tree: N3Tree, leaf_map: LeafMap,
                                camera, opt: RenderOptions,
                                order: tuple,
                                segments=DEFAULT_SEGMENTS,
                                chunk_size: int = 1 << 15,
                                unroll: int = 1,
                                need_votes: bool = False,
                                dynamic_knobs: bool = False,
                                skip_table: Optional[jax.Array] = None,
                                group: int = 1,
                                device_fallback: bool = False,
                                return_hints: bool = False,
                                sorted_output: bool = False,
                                seg_counts: Optional[tuple] = None):
    """Record-sorted segmented fast frame.

    ``order`` must come from :func:`order_from_hints` (rays sorted by
    last frame's dense-record count): each contiguous ray segment then
    gets its own ``max_dense`` budget, so the deferred-shading
    coefficient gather is sized to what rays actually record instead of
    a frame-wide worst case.  Pass the same ``group`` given to
    ``order_from_hints`` to move the final unpermute at group
    granularity (pixels identical; pure gather-cost saving).  Pixels are bit-identical to the
    unsegmented path — segmentation only partitions rays, and any
    ray exceeding its segment's budget raises that segment's overflow
    flag so the caller can escalate (double the budget and re-render).

    ``device_fallback`` folds escalation into the compiled frame (see
    ``_frame_core``): the returned image is then correct even when
    budgets are stale — ``seg_overflow`` becomes an asynchronous
    staleness signal (plus ``fb_overflow``, last element, for the
    pathological beyond-cap case) instead of a mandatory synchronous
    check, eliminating the per-frame host round trip under camera
    motion.

    ``return_hints`` appends (steps, nrec, skips) in PIXEL order — the
    hints the march computes anyway, so steady/motion frames can feed
    the next order refresh (``order_from_hints_device``) without a
    dedicated hint frame.  Note nrec is capped at each ray's segment
    budget (a heavy ray in a small-budget class reports the cap and
    raises that segment's overflow; the next refresh then re-classes
    it — self-healing with one-frame lag).  Pass the string
    ``"packed"`` to get ONE i32 array in :func:`pack_hints` layout
    instead of three — the production motion path: one pixel-order
    unpermute gather instead of three (~25 ms each at 1080p), and the
    packed value doubles as the rebuild sort key
    (:func:`order_from_packed_device`).

    ``sorted_output`` skips the frame's final on-device unpermute and
    returns the image as FLAT [R, 4] rows in ``perm`` (segment) order —
    for display consumers that apply ``inv`` as an index map themselves
    (``img_flat[inv].reshape(h, w, 4)`` recovers the pixel-order frame
    bit-exactly; the reference has no analogue — its kernel writes
    pixels in place via surf2Dwrite, renderer_kernel.cu:289-291).  The
    [R, 4] gather is a per-row device-cost floor (~10.8 ms at 1080p,
    PERFORMANCE.md), while the same remap on rgba8 is a cheap host
    u32 gather that overlaps the next frame's device compute.  Votes
    and hints remain in pixel order regardless.

    Returns (img [H, W, 4] — or flat [R, 4] perm-order rows when
    ``sorted_output`` — seg_overflow i32 COUNTS [n_segments],
    [split_vote, sample_vote] when need_votes][, fb_overflow when
    device_fallback][, steps, nrec, skips when return_hints — or one
    packed i32 array when return_hints="packed"]) — votes and hints
    in pixel order.
    """
    w, h = camera.width, camera.height
    R = w * h
    perm, inv = order
    n_chunks = (R + chunk_size - 1) // chunk_size
    if seg_counts is not None:
        # chunk-exact budgets (seg_counts_from_hints): the caller
        # resolved whole-chunk counts directly; ``segments`` is ignored.
        assert sum(n for n, _ in seg_counts) == n_chunks, \
            (seg_counts, n_chunks)
        transform, intr, rot_dirs, bg_value, dyn, opt = _frame_core_args(
            camera, opt, dynamic_knobs)
        res = _frame_core(
            tree, leaf_map, perm, inv, transform, intr, rot_dirs,
            bg_value, dyn, skip_table, opt=opt, width=w,
            seg_counts=tuple(seg_counts),
            chunk_size=chunk_size, unroll=unroll, need_votes=need_votes,
            return_hints=return_hints, group=group,
            device_fallback=device_fallback, sorted_output=sorted_output)
        img = (res["img"] if sorted_output
               else res["img"].reshape(h, w, 4))
        out = (img, res["seg_overflow"])
        if need_votes:
            out = out + (res["split_vote"], res["sample_vote"])
        if device_fallback:
            out = out + (res["fb_overflow"],)
        if return_hints == "packed":
            out = out + (res["hints_packed"],)
        elif return_hints:
            out = out + (res["steps"], res["nrec"], res["skips"])
        return out
    if n_chunks < len(segments):
        # small-frame degenerate path: fewer chunks than segment
        # classes.  Under device_fallback the always-correct contract
        # must hold without a host check, so march straight at the
        # escalation cap (frames this small are cheap anyway).
        res = render_frame_fast(
            tree, leaf_map, camera, opt,
            max_dense=_FALLBACK_MD if device_fallback
            else max(md for _, md in segments),
            chunk_size=chunk_size, order=order, unroll=unroll,
            need_votes=need_votes, dynamic_knobs=dynamic_knobs,
            skip_table=skip_table,
            return_nrec=bool(return_hints), return_skips=bool(return_hints))
        img, overflow = res[0], res[1]
        if sorted_output:
            # contract uniformity: rows in perm order, flat [R, 4]
            # (frames this small make the extra gather negligible)
            img = img.reshape(R, 4)[perm]
        ov = jnp.broadcast_to(overflow, (len(segments),))
        out = ((img, ov) + tuple(res[3:5])) if need_votes else (img, ov)
        if device_fallback:
            out = out + (overflow,)
        if return_hints == "packed":
            out = out + (pack_hints(res[2], res[-2], res[-1]),)
        elif return_hints:
            out = out + (res[2], res[-2], res[-1])
        return out

    transform, intr, rot_dirs, bg_value, dyn, opt = _frame_core_args(
        camera, opt, dynamic_knobs)
    res = _frame_core(
        tree, leaf_map, perm, inv, transform, intr, rot_dirs, bg_value,
        dyn, skip_table, opt=opt, width=w,
        seg_counts=segment_chunks(n_chunks, segments, n_rays=R,
                                  chunk_size=chunk_size),
        chunk_size=chunk_size, unroll=unroll, need_votes=need_votes,
        return_hints=return_hints, group=group,
        device_fallback=device_fallback, sorted_output=sorted_output)
    img = res["img"] if sorted_output else res["img"].reshape(h, w, 4)
    out = (img, res["seg_overflow"])
    if need_votes:
        out = out + (res["split_vote"], res["sample_vote"])
    if device_fallback:
        out = out + (res["fb_overflow"],)
    if return_hints == "packed":
        out = out + (res["hints_packed"],)
    elif return_hints:
        out = out + (res["steps"], res["nrec"], res["skips"])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("opt", "width", "seg_counts", "chunk_size",
                     "unroll", "hint_chunk", "hint_stride"))
def _motion_core(tree: N3Tree, leaf_map: LeafMap,
                 stale_perm: jax.Array,
                 transform: jax.Array, intr: jax.Array,
                 rot_dirs: jax.Array, bg_value: jax.Array,
                 dyn: Optional[jax.Array],
                 skip_table: Optional[jax.Array],
                 *, opt: RenderOptions, width: int,
                 seg_counts: tuple, chunk_size: int, unroll: int,
                 hint_chunk: int, hint_stride: int = 1):
    """Two-pass RE-HINT motion frame in ONE dispatch: measure, sort,
    march with steady budgets.

    The dilation motion path PREDICTS each ray's record need from the
    previous pose's neighborhood max, which fattens budget classes to
    ~4.1 records/ray on the 1080p orbit sweep (vs 1.0 steady) — an
    irreducible cost of protecting against silhouette sweeps it cannot
    see (PERFORMANCE.md round-4 motion-floor analysis).  This core
    replaces prediction with MEASUREMENT:

      pass 1  budget-0 count-only march over the STALE order (record
              buffers and deferred shading elided entirely; with the
              march's uncapped nd counting, its nrec output is each
              ray's TRUE record need at THIS pose);
      sort    ``lax.sort((packed key, stale_perm))`` — the two-operand
              sort carries the pixel ids through directly, so the
              fresh perm needs no argsort-then-compose gather; ties
              break by stale rank, preserving the previous pose's
              secondary coherence within equal keys; scatter-inverse;
      pass 2  the standard segmented march (:func:`_frame_core`) on
              the fresh EXACT order — steady, un-fattened budgets
              apply because the order reflects this pose's true
              record counts, so overflow needs pose-to-pose histogram
              drift past the 1/16 fraction quantization, not a
              silhouette sweep.

    Cost model: pass 1 ~= the march-step floor (no record selects, no
    shading gather), pass 2 ~= a steady frame — both under the dilated
    march's record-fattened cost.  One jit keeps the pose at ONE
    dispatch round trip (the dev tunnel charges ~27 ms each).

    ``hint_stride`` = 2 runs pass 1 at QUARTER resolution: the cost of
    a stale-order march is dominated by chunk-max while-trip waste
    (169 vs 63 ms fresh-order at 1080p, measured — step-coherence
    decay, NOT record budgets), and that waste scales with ray count
    (quarter rays: 42 ms).  ``stale_perm`` must then hold the QUARTER
    subset (full-frame pixel ids at even y, even x) in a previous
    pose's key order; the measured quarter keys are scattered to the
    quarter grid, max-pooled one cell per axis (so full pixels BETWEEN
    samples class by their neighborhood max — 2-px features are
    covered exactly; 1-px silhouettes fall to the derivation margin +
    the caller's async tolerance), broadcast 2x2 to full resolution,
    and argsorted in pixel space.  Width and height must be even.

    Returns dict(img [R, 4] pixel-order flat rows, seg_overflow,
    perm, inv, cdf): ``perm`` feeds the NEXT pose's pass 1 when
    stride=1 (``qperm`` — fresh quarter order — replaces it at
    stride=2), ``cdf`` = :func:`hint_class_cdf_packed` of the fresh
    keys so the caller can refresh segment budgets asynchronously.
    Reference: the per-pose interactive loop, main.cpp:603-616.
    """
    from .rays import screen2worlddir_indices, rodrigues
    Rm = stale_perm.shape[0]            # marched rays (R or R/4)
    pad = (-Rm) % hint_chunk
    pix = stale_perm if not pad else jnp.concatenate(
        [stale_perm, jnp.broadcast_to(stale_perm[-1:], (pad,))])
    dirs_p, cen = screen2worlddir_indices(
        pix, width, intr[0], intr[1], intr[2], intr[3], transform)
    vdirs_p = rodrigues(rot_dirs, dirs_p)
    res = render_rays_fast(
        tree, leaf_map, dirs_p, vdirs_p, cen, opt, max_dense=0,
        chunk_size=hint_chunk if pix.shape[0] > hint_chunk else 0,
        unroll=unroll, dyn=dyn, skip_table=skip_table)
    key = pack_hints(res.steps, res.nrec, res.skips)[:Rm]
    ret = {}
    if hint_stride == 1:
        _, perm = jax.lax.sort((key, stale_perm), num_keys=1,
                               is_stable=True)
        cdf = hint_class_cdf_packed(key)
        R = Rm
    else:
        # fresh quarter order for the NEXT pose's pass 1 (same
        # two-operand sort trick, 1/4-size)
        _, ret["qperm"] = jax.lax.sort((key, stale_perm), num_keys=1,
                                       is_stable=True)
        qw = width // 2
        height = Rm // qw               # quarter grid is [H/2, W/2]
        R = Rm * 4
        py = stale_perm // width
        px = stale_perm - py * width
        q = (py >> 1) * qw + (px >> 1)
        qimg = jnp.zeros((Rm,), jnp.int32).at[q].set(
            key, unique_indices=True).reshape(height, qw)
        # forward 2x2 max: a block's pixels lie BETWEEN samples
        # (qy, qx)..(qy+1, qx+1), so the forward max is the exact
        # neighborhood bound (a symmetric 3x3 pool over-fattened the
        # class CDF for samples the block can't reach)
        for ax in (0, 1):
            qimg = jnp.maximum(qimg, jnp.roll(qimg, -1, ax))
        # cell-sort rebuild: every pixel of a 2x2 block shares its
        # pooled cell key, so sort the R/4 CELLS and expand each to
        # its 4 pixel ids — a 4x smaller sort, and the upsampled
        # key_full never materializes (measured 32 -> 26 ms at 1080p
        # on v5e).  Any key-sorted order is a valid schedule: budgets
        # are assigned by rank, and class boundaries only shift within
        # equal-key ties.
        pooled = qimg.reshape(-1)
        cid = jnp.arange(Rm, dtype=jnp.int32)
        _, csort = jax.lax.sort((pooled, cid), num_keys=1,
                                is_stable=True)
        cy = csort // qw
        cx = csort - cy * qw
        base = (cy * 2) * width + cx * 2
        perm = (base[:, None]
                + jnp.asarray([0, 1, width, width + 1], jnp.int32)
                [None, :]).reshape(-1)
        # CDF parity with the sharded body (parallel/motion.py): each
        # pooled cell covers 4 pixels — class counts x4, trailing max
        # unchanged
        cdf4 = hint_class_cdf_packed(pooled)
        cdf = jnp.concatenate([cdf4[:-1] * 4, cdf4[-1:]])
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(R, dtype=jnp.int32), unique_indices=True)
    out = _frame_core(
        tree, leaf_map, perm, inv, transform, intr, rot_dirs, bg_value,
        dyn, skip_table, opt=opt, width=width, seg_counts=seg_counts,
        chunk_size=chunk_size, unroll=unroll, need_votes=False,
        return_hints=False)
    ret.update(img=out["img"], seg_overflow=out["seg_overflow"],
               perm=perm, inv=inv, cdf=cdf)
    return ret


def render_frame_motion(tree: N3Tree, leaf_map: LeafMap, camera,
                        opt: RenderOptions, stale_perm: jax.Array,
                        segments=DEFAULT_SEGMENTS,
                        chunk_size: int = 1 << 15,
                        unroll: int = 1,
                        dynamic_knobs: bool = False,
                        skip_table: Optional[jax.Array] = None,
                        hint_chunk: Optional[int] = None,
                        hint_stride: int = 1):
    """Re-hint two-pass motion frame (see :func:`_motion_core`).

    ``stale_perm`` is any previous pose's ray order (its only job is
    chunk coherence for the count pass — even a block permutation
    works on the first moved frame); with ``hint_stride=2`` pass the
    QUARTER order instead (the previous pose's returned ``qperm``, or
    :func:`quarter_order_from_packed` of steady pixel-order hints at
    an episode start).  ``segments`` should be a
    ``segments_from_hint_cdf`` derivation with ``margin=1,
    top_headroom=True``: the order is exact for THIS pose, so the
    only overflow exposure is pose-to-pose drift of the global class
    histogram (stride 1) plus sub-sample features (stride 2).
    Pixels are bit-identical to the steady segmented frame at the
    same order/budgets whenever no segment overflows.

    Returns (img [H, W, 4], seg_overflow i32 [n_segments],
    (perm, inv) device order, cdf i32 [6], qperm or None).
    """
    w, h = camera.width, camera.height
    R = w * h
    if hint_stride == 2 and (w % 2 or h % 2):
        hint_stride = 1                 # quarter grid needs even dims
    if hint_stride == 2 and stale_perm.shape[0] * 4 != R:
        raise ValueError("hint_stride=2 needs the R/4 quarter order")
    n_chunks = (R + chunk_size - 1) // chunk_size
    transform, intr, rot_dirs, bg_value, dyn, opt2 = _frame_core_args(
        camera, opt, dynamic_knobs)
    res = _motion_core(
        tree, leaf_map, stale_perm, transform, intr, rot_dirs,
        bg_value, dyn, skip_table, opt=opt2, width=w,
        seg_counts=segment_chunks(n_chunks, tuple(segments), n_rays=R,
                                  chunk_size=chunk_size),
        chunk_size=chunk_size, unroll=unroll,
        hint_chunk=int(hint_chunk or chunk_size),
        hint_stride=hint_stride)
    return (res["img"].reshape(h, w, 4), res["seg_overflow"],
            (res["perm"], res["inv"]), res["cdf"],
            res.get("qperm"))


@functools.partial(jax.jit, static_argnames=("width",))
def quarter_order_from_packed(ph: jax.Array, *, width: int):
    """Initial quarter-resolution hint order for the stride-2 motion
    path: subsample pixel-order packed hints at even rows/columns and
    sort the full-frame pixel ids of those samples by their key —
    the same (key, id) two-operand sort the motion core uses, so the
    first moved frame's pass 1 starts chunk-coherent for free from
    the steady frame's hints (one [R/4] sort per motion episode)."""
    height = ph.shape[0] // width
    qkey = ph.reshape(height, width)[::2, ::2].reshape(-1)
    qw = width // 2
    qi = jnp.arange(qkey.shape[0], dtype=jnp.int32)
    qpix = (qi // qw) * 2 * width + (qi % qw) * 2
    _, qperm = jax.lax.sort((qkey, qpix.astype(jnp.int32)),
                            num_keys=1, is_stable=True)
    return qperm
