"""Guided ray sampling: octree-guided sample placement + MLP compositing.

TPU-native re-design of the reference's guided-sampling mode (R key):

  * ``collect_samples`` — the traversal-only march that records up to
    ``max_guided_samples`` per ray: ``[z, x, y, z_world, (viewdir),
    (appearance)]`` plus a per-sample spatial-cluster id
    (reference ``get_samples_trace_ray`` rt_core.cuh:418-576,
    ``get_samples_from_voxels_kernel`` renderer_kernel.cu:329-363).
  * ``composite_results`` — integrates MLP outputs along each ray:
    ``delta_i = z[i+1]-z[i]``, ``w = T*(1-exp(-sigma*delta))`` with the
    last sample taking all remaining transmittance, SH eval with viewdir,
    sigmoid (reference ``composite_nerf_results`` rt_core.cuh:334-416).

Unlike the reference's compacted sample buffer + per-ray offsets
(cuda_renderer.cpp:116-139), samples stay in a padded ``[R, S, ...]``
layout with a per-ray count — static shapes for XLA, and the compositor
becomes a masked scan over the sample axis.  The MLP query itself runs on
the compacted valid set (sorted by cluster) exactly like
``query_submodules``.

Faithfulness notes:
  * The reference composites density from ``sample_values[i][3]``
    (rt_core.cuh:365) — hardcoded for the ``data_dim==4`` (SH1 / RGB)
    Mega-NeRF output layout.  We index ``min(3, out_dim-1)`` which is
    identical for that layout and defined for others.
  * ``out[3] = 1`` before compositing (renderer_kernel.cu:316): guided
    frames have alpha 1 everywhere; rays with no samples come out black.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from .sh import masked_sh_basis
from .rays import screen2worlddir, rodrigues
from .render import DEFAULT_MAX_LEVELS, _descend, _dda_world_batch, \
    _dda_unit_batch


class GuidedSamples(NamedTuple):
    samples: jax.Array       # [R, S, 1+dim] f32: z, xyz, (vdir), (app)
    cluster_ids: jax.Array   # [R, S] i32
    num_samples: jax.Array   # [R] i32
    split_vote: jax.Array    # [R, 3]
    sample_vote: jax.Array   # [R, 3]
    visited: jax.Array       # [max_capacity] i32


@functools.partial(
    jax.jit,
    static_argnames=("opt", "track_visit", "max_levels"))
def collect_samples(tree: N3Tree,
                    dirs: jax.Array, vdirs: jax.Array,
                    cen_world: jax.Array,
                    grid_dim: jax.Array,       # i32 [2]
                    min_position: jax.Array,   # f32 [3]
                    pos_range: jax.Array,      # f32 [3] (max - min)
                    opt: RenderOptions,
                    tmax_bg=None,
                    track_visit: bool = False,
                    max_levels: int = DEFAULT_MAX_LEVELS) -> GuidedSamples:
    """Traversal-only march recording per-ray guided samples."""
    N, N3 = tree.N, tree.N3
    R = dirs.shape[0]
    S = opt.max_guided_samples
    dim = opt.sample_dim
    data_dim = tree.data_dim

    child_flat = tree.child.reshape(-1)
    data_flat = tree.data.reshape(-1, data_dim)
    counts_flat = tree.sample_counts.reshape(-1)

    cen = tree.offset + tree.scale * cen_world           # rt_core.cuh:446-448
    d = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    d = d * delta_scale[:, None]
    if tmax_bg is None:
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)
    tmax_bg = tmax_bg / delta_scale
    invdir = 1.0 / (d + jnp.float32(1e-9))
    tmin, tmax = _dda_world_batch(cen, invdir, opt.render_bbox)
    tmax = jnp.minimum(tmax, tmax_bg)
    miss = (tmax < 0) | (tmin > tmax)

    samples = jnp.full((R, S, 1 + dim), -1.0, jnp.float32)
    cluster_ids = jnp.zeros((R, S), jnp.int32)
    ns = jnp.zeros((R,), jnp.int32)
    split_vote = jnp.concatenate(
        [jnp.full((R, 1), opt.max_depth + 1, jnp.float32),
         jnp.full((R, 2), -1.0, jnp.float32)], axis=1)
    sample_vote = jnp.concatenate(
        [jnp.full((R, 1), opt.max_sample_count + 1, jnp.float32),
         jnp.full((R, 2), -1.0, jnp.float32)], axis=1)
    visited = jnp.zeros((tree.max_capacity,), jnp.int32)
    if track_visit:
        visited = visited.at[0].set(1)

    t = tmin
    T = jnp.ones((R,), jnp.float32)
    max_w = jnp.full((R,), -1.0, jnp.float32)
    max_sw = jnp.full((R,), -1.0, jnp.float32)
    active = ~miss & (t < tmax)
    ray_idx = jnp.arange(R, dtype=jnp.int32)

    def cond(c):
        return jnp.any(c[-1])

    def body(c):
        (t, T, samples, cluster_ids, ns, split_vote, sample_vote,
         max_w, max_sw, visited, active) = c
        pos = cen[None, :] + t[:, None] * d
        frac, chunk, cidx, depth, visited = _descend(
            child_flat, pos, N, max_levels, visited, track_visit)
        node = chunk * N3 + cidx
        cube_size = jnp.power(jnp.float32(N), depth.astype(jnp.float32))
        t_subcube = _dda_unit_batch(frac, invdir) / cube_size
        delta_t = t_subcube + jnp.float32(opt.step_size)
        sigma = jnp.take(data_flat[:, data_dim - 1], node,
                         mode="clip").astype(jnp.float32)
        dense = sigma > opt.sigma_thresh

        att = jnp.exp(-delta_t * delta_scale * sigma)
        weight = T * (1.0 - att)

        # votes (same logic as the shading march, rt_core.cuh:497-512/558-570)
        can_split = depth < opt.max_depth
        sc = jnp.take(counts_flat, node, mode="clip").astype(jnp.int32)
        can_sample = sc < opt.max_sample_count
        vote_cols_split = jnp.stack(
            [depth.astype(jnp.float32), chunk.astype(jnp.float32),
             cidx.astype(jnp.float32)], axis=-1)
        vote_cols_sample = jnp.stack(
            [sc.astype(jnp.float32), chunk.astype(jnp.float32),
             cidx.astype(jnp.float32)], axis=-1)
        vs = active & can_split & jnp.where(
            dense, weight > max_w, max_w == -1.0)
        vp = active & can_sample & jnp.where(
            dense, weight > max_sw, max_sw == -1.0)
        split_vote = jnp.where(vs[:, None], vote_cols_split, split_vote)
        sample_vote = jnp.where(vp[:, None], vote_cols_sample, sample_vote)
        max_w = jnp.where(active & dense & can_split & (weight > max_w),
                          weight, max_w)
        max_sw = jnp.where(active & dense & can_sample & (weight > max_sw),
                           weight, max_sw)

        # record sample (rt_core.cuh:514-551)
        record = active & dense & (ns < S)
        true_z_vec = (t[:, None] * d) / tree.scale[None, :]
        z = jnp.linalg.norm(true_z_vec, axis=-1)
        pos_world = cen_world[None, :] + dirs * z[:, None]
        cols = [z[:, None], pos_world]
        if opt.need_viewdir:
            cols.append(vdirs)
        if opt.appearance_embedding != -1:
            cols.append(jnp.full((R, 1), opt.appearance_embedding,
                                 jnp.float32))
        row = jnp.concatenate(cols, axis=-1)              # [R, 1+dim]
        slot = jnp.where(record, ns, S)                    # S -> dropped
        samples = samples.at[ray_idx, slot].set(row, mode="drop")
        g1 = jnp.clip((pos_world[:, 1] - min_position[1]) / pos_range[1]
                      * grid_dim[0].astype(jnp.float32),
                      0.0, grid_dim[0].astype(jnp.float32) - 1.0)
        g2 = jnp.clip((pos_world[:, 2] - min_position[2]) / pos_range[2]
                      * grid_dim[1].astype(jnp.float32),
                      0.0, grid_dim[1].astype(jnp.float32) - 1.0)
        cid = g1.astype(jnp.int32) * grid_dim[1] + g2.astype(jnp.int32)
        cluster_ids = cluster_ids.at[ray_idx, slot].set(cid, mode="drop")
        ns = jnp.where(record, ns + 1, ns)

        T = jnp.where(active & dense, T * att, T)
        stop_now = active & dense & (T < opt.stop_thresh)
        t = jnp.where(active, t + delta_t, t)
        active = active & ~stop_now & (t < tmax)
        return (t, T, samples, cluster_ids, ns, split_vote, sample_vote,
                max_w, max_sw, visited, active)

    c = jax.lax.while_loop(
        cond, body,
        (t, T, samples, cluster_ids, ns, split_vote, sample_vote,
         max_w, max_sw, visited, active))
    (t, T, samples, cluster_ids, ns, split_vote, sample_vote,
     _, _, visited, _) = c
    return GuidedSamples(samples, cluster_ids, ns, split_vote,
                         sample_vote, visited)


@functools.partial(jax.jit, static_argnames=("opt", "basis_dim", "fmt_sh"))
def composite_results(results: jax.Array,      # [R, S, out_dim]
                      z_vals: jax.Array,        # [R, S]
                      num_samples: jax.Array,   # [R]
                      vdirs: jax.Array,         # [R, 3]
                      opt: RenderOptions,
                      basis_dim: int,
                      fmt_sh: bool) -> jax.Array:
    """Integrate MLP outputs along rays (rt_core.cuh:334-416).

    Returns [R, 4] rgba with alpha == 1 (renderer_kernel.cu:316).
    """
    R, S, out_dim = results.shape
    sigma_idx = min(3, out_dim - 1)               # rt_core.cuh:365 hardcodes 3
    slots = jnp.arange(S)
    valid = slots[None, :] < num_samples[:, None]            # [R, S]
    is_last = slots[None, :] == (num_samples[:, None] - 1)

    delta = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros((R, 1), jnp.float32)],
        axis=1)
    sigma = results[..., sigma_idx]
    wc = jnp.exp(-sigma * delta)                              # [R, S]
    # T_i = prod_{j<i} wc_j over valid non-last slots
    wc_eff = jnp.where(valid & ~is_last, wc, 1.0)
    T = jnp.concatenate(
        [jnp.ones((R, 1), jnp.float32),
         jnp.cumprod(wc_eff, axis=1)[:, :-1]], axis=1)
    weight = jnp.where(is_last & valid, T,
                       jnp.where(valid, T * (1.0 - wc), 0.0))

    if opt.render_depth:
        # reference accumulates weight * T (rt_core.cuh:372)
        d0 = jnp.sum(weight * T, axis=1)
        rgb = jnp.minimum(d0 * 0.3, 1.0)[:, None].repeat(3, axis=1)
    elif fmt_sh and basis_dim >= 1:
        basis = masked_sh_basis(basis_dim, vdirs,
                                opt.basis_minmax[0],
                                opt.basis_minmax[1])          # [R, B]
        coeffs = results[..., :3 * basis_dim].reshape(R, S, 3, basis_dim)
        logits = jnp.einsum("rb,rscb->rsc", basis, coeffs)
        rgb_s = jax.nn.sigmoid(logits)                        # [R, S, 3]
        rgb = jnp.sum(weight[..., None] * rgb_s, axis=1)
    else:
        rgb = jnp.sum(weight[..., None] * results[..., :3], axis=1)
    return jnp.concatenate([rgb, jnp.ones((R, 1), jnp.float32)], axis=1)


# ----------------------------------------------------------------------
# Leaf-map accelerated collection (TPU fast path)
# ----------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("opt", "chunk_size", "with_overflow",
                              "segments", "return_steps",
                              "keep_sorted"))
def collect_t_fast(tree: N3Tree, leaf_map, dirs: jax.Array,
                   cen_world: jax.Array, opt: RenderOptions,
                   chunk_size: int = 0,
                   skip_table=None,
                   order=None,
                   with_overflow: bool = False,
                   segments=None,
                   return_steps: bool = False,
                   keep_sorted: bool = False):
    """March with the dense leaf map, recording only the tree-space ray
    parameter ``t`` of each recorded sample (one f32 per slot via
    one-hot select — TPU scatter is pathological).  The full sample rows
    (z, world position, viewdir, appearance, cluster id) are exactly
    reconstructible from t (rt_core.cuh:514-528 derives them all from
    t), so this is the TPU-fast equivalent of :func:`collect_samples`.

    ``skip_table`` runs the Pallas entry-skip prepass first (bit-exact
    t trajectory — ops/pallas_march.py); sample records are unaffected
    because skipped cells are by construction below ``sigma_thresh``.

    ``order`` = (perm, inv) device index arrays (e.g. from the previous
    invalidation's sample counts via ``accel.order_from_hints``): the
    march runs over cost-sorted rays so each chunk's while loop runs
    ~its own max instead of the raster-layout worst case (same
    chunk-max economics as the render path), and the records are
    unpermuted before returning — outputs are identical to the
    unordered call.

    ``segments`` (requires ``order`` from ns-sorted hints + chunking)
    applies the render path's CDF-budget treatment
    (accel.DEFAULT_SEGMENTS) to collection: a tuple of (ray fraction,
    S budget) classes over the ns-sorted order — cheap recorders march
    with a small record buffer (the [r, S] one-hot record select and
    the while-carry shrink with S, and the (frac, 0) class marches
    with no record buffer at all — ~52% of 1080p shell rays), heavy
    ones keep the full ``max_guided_samples``.  Reduced-budget
    segments raise their overflow flag when a ray exceeds the class
    budget (stale hints); the caller escalates those segments only.
    At the full budget the cap is the reference's SILENT one
    (rt_core.cuh:514) and never flags.  Records are identical to the
    unsegmented call whenever no flag is raised.  Returns
    (t_buf, ns[, steps], seg_overflow bool [n_segments]).

    ``return_steps`` appends the per-ray march iteration count to the
    outputs — the (steps, ns) key pair makes the NEXT invalidation's
    cost sort dramatically tighter than ns alone (ns-only chunks mix
    short surface hits with long grazing marches: 195 vs 77 ms at
    1080p, measured).  ``keep_sorted`` skips the inverse-permutation
    unpermute of the ordered call and returns outputs in SORTED ray
    order (rank k = ray ``perm[k]``): the [R, S] t-buffer unpermute
    alone costs 142 ms at 1080p/S=32 (128-byte rows sit on the
    wide-row gather plateau, PERFORMANCE.md fact 1) while callers that
    stay in sorted space (collect_and_query_fast) only ever pay a
    narrow [R, 4] unpermute on the composited frame.

    Returns (t_buf [R, S] f32 with -1 fill, num_samples [R] i32
    [, steps [R] i32]).
    """
    if order is not None:
        perm, inv = order
        R0 = dirs.shape[0]
        dirs_s = dirs.at[perm].get(unique_indices=True, mode="clip")

        def unperm(a):
            return a.at[inv].get(unique_indices=True, mode="clip")[:R0]

        if segments is not None and chunk_size \
                and R0 % chunk_size == 0 and R0 > chunk_size \
                and R0 // chunk_size >= len(segments):
            from .accel import segment_chunks
            seg_counts = segment_chunks(R0 // chunk_size, segments)
            S = opt.max_guided_samples
            t_parts, ns_parts, st_parts, ovs = [], [], [], []
            off = 0
            for c_chunks, S_seg in seg_counts:
                if c_chunks == 0:
                    # empty layout slot (ray-floor chunk quantization);
                    # keep the overflow vector index-aligned
                    ovs.append(jnp.asarray(False))
                    continue
                n = c_chunks * chunk_size
                S_eff = min(S_seg, S)
                out = collect_t_fast(
                    tree, leaf_map, dirs_s[off:off + n], cen_world,
                    opt.replace(max_guided_samples=S_eff),
                    chunk_size=chunk_size if c_chunks > 1 else 0,
                    skip_table=skip_table, with_overflow=True,
                    return_steps=return_steps)
                if return_steps:
                    tb, nsb, stb, ovb = out
                    st_parts.append(stb)
                else:
                    tb, nsb, ovb = out
                if S_eff < S:
                    tb = jnp.concatenate(
                        [tb, jnp.full((n, S - S_eff), -1.0,
                                      jnp.float32)], axis=1)
                # full-budget classes keep the reference's silent cap
                ovs.append(ovb if S_eff < S else jnp.asarray(False))
                t_parts.append(tb)
                ns_parts.append(nsb)
                off += n
            t_s = jnp.concatenate(t_parts)
            ns_s = jnp.concatenate(ns_parts)
            outs = (t_s, ns_s) + ((jnp.concatenate(st_parts),)
                                  if return_steps else ())
            if not keep_sorted:
                outs = tuple(unperm(a) for a in outs)
            return outs + (jnp.stack(ovs),)
        outs = collect_t_fast(
            tree, leaf_map, dirs_s, cen_world, opt,
            chunk_size=chunk_size, skip_table=skip_table,
            with_overflow=with_overflow, return_steps=return_steps)
        ov_tail = ()
        if with_overflow:
            outs, ov_tail = outs[:-1], outs[-1:]
        if not keep_sorted:
            outs = tuple(unperm(a) for a in outs)
        if segments is not None:
            # small-frame degenerate path (fewer chunks than budget
            # classes): one full-budget march — no class can starve,
            # so no flag can raise
            return outs + (jnp.zeros((len(segments),), bool),)
        return outs + ov_tail
    from .accel import leaf_lookup
    N, N3 = tree.N, tree.N3
    R = dirs.shape[0]
    S = opt.max_guided_samples
    data_dim = tree.data_dim
    child_flat = tree.child.reshape(-1)
    sigma_flat = tree.data.reshape(-1, data_dim)[:, data_dim - 1]

    cen = tree.offset + tree.scale * cen_world
    d = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    d = d * delta_scale[:, None]
    invdir = 1.0 / (d + jnp.float32(1e-9))
    tmin, tmax = _dda_world_batch(cen, invdir, opt.render_bbox)
    miss = (tmax < 0) | (tmin > tmax)
    if skip_table is not None:
        from .pallas_march import entry_skip_prepass
        tmin = entry_skip_prepass(skip_table, cen, d, invdir,
                                  tmin, tmax, ~miss,
                                  jnp.float32(opt.step_size))

    def march_chunk(args):
        cen_c, d_c, invdir_c, ds_c, tmin_c, tmax_c, miss_c = args
        r = d_c.shape[0]
        t_buf = jnp.full((r, S), -1.0, jnp.float32)
        srange = jnp.arange(S, dtype=jnp.int32)
        ns = jnp.zeros((r,), jnp.int32)
        ov = jnp.zeros((r,), bool)
        nst = jnp.zeros((r,), jnp.int32)
        t = tmin_c
        T = jnp.ones((r,), jnp.float32)
        active = ~miss_c & (t < tmax_c)

        def cond(c):
            return jnp.any(c[-1])

        def body(c):
            t, T, t_buf, ns, ov, nst, active = c
            nst = nst + active
            pos = cen_c + t[:, None] * d_c
            posc = jnp.clip(pos, 0.0, jnp.float32(1.0 - 1e-6))
            # shared leaf resolution (accel.leaf_lookup): the render
            # and collect marches must execute the SAME sequence for
            # their t trajectories to stay bit-identical; node is
            # unused here (records carry only t) and DCEs away
            _, depth, sigma = leaf_lookup(
                leaf_map, child_flat, sigma_flat, posc, N, N3)
            cube = jnp.exp2(depth.astype(jnp.float32))
            u = posc * cube[:, None]
            frac = u - jnp.floor(u)
            t_sub = _dda_unit_batch(frac, invdir_c) / cube
            delta_t = t_sub + jnp.float32(opt.step_size)
            dense = active & (sigma > opt.sigma_thresh)
            att = jnp.exp(-delta_t * ds_c * sigma)
            rec = dense & (ns < S)
            # over-budget flag: meaningful only for reduced-budget
            # segment calls (at S == the caller's max_guided_samples
            # this is the reference's SILENT cap, rt_core.cuh:514)
            ov = ov | (dense & (ns >= S))
            if S > 0:
                m = rec[:, None] & (ns[:, None] == srange[None, :])
                t_buf = jnp.where(m, t[:, None], t_buf)
                ns = jnp.where(rec, ns + 1, ns)
            T = jnp.where(dense, T * att, T)
            stop = dense & (T < opt.stop_thresh)
            t = jnp.where(active, t + delta_t, t)
            active = active & ~stop & (t < tmax_c)
            return (t, T, t_buf, ns, ov, nst, active)

        c = jax.lax.while_loop(cond, body,
                               (t, T, t_buf, ns, ov, nst, active))
        return c[2], c[3], c[5], jnp.any(c[4])

    args = (jnp.broadcast_to(cen, (R, 3)), d, invdir, delta_scale,
            tmin, tmax, miss)
    if chunk_size and R % chunk_size == 0 and R > chunk_size:
        n_chunks = R // chunk_size
        args = tuple(a.reshape((n_chunks, chunk_size) + a.shape[1:])
                     for a in args)
        t_buf, ns, nst, ov = jax.lax.map(march_chunk, args)
        t_buf, ns, nst, ov = (t_buf.reshape(R, S), ns.reshape(R),
                              nst.reshape(R), jnp.any(ov))
    else:
        t_buf, ns, nst, ov = march_chunk(args)
    outs = (t_buf, ns) + ((nst,) if return_steps else ())
    if with_overflow:
        return outs + (ov,)
    return outs


@functools.partial(jax.jit, static_argnames=("opt",))
def reconstruct_samples(tree: N3Tree, dirs: jax.Array,
                        vdirs: jax.Array,
                        cen_world: jax.Array, t_buf: jax.Array,
                        num_samples: jax.Array, grid_dim, min_position,
                        pos_range, opt: RenderOptions):
    """Rebuild full guided-sample rows + cluster ids from recorded t
    (exact rt_core.cuh:514-549 math, vectorized over all slots)."""
    R, S = t_buf.shape
    d = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    d = d * delta_scale[:, None]
    valid = jnp.arange(S)[None, :] < num_samples[:, None]
    tz = t_buf[..., None] * d[:, None, :] / tree.scale[None, None, :]
    z = jnp.linalg.norm(tz, axis=-1)                       # [R, S]
    pos = cen_world[None, None, :] + dirs[:, None, :] * z[..., None]
    cols = [z[..., None], pos]
    if opt.need_viewdir:
        # the recorded viewdir is the rodrigues-shifted direction
        # (rt_core.cuh:530-533); sample positions use the true dir
        cols.append(jnp.broadcast_to(vdirs[:, None, :], (R, S, 3)))
    if opt.appearance_embedding != -1:
        cols.append(jnp.full((R, S, 1), opt.appearance_embedding,
                             jnp.float32))
    samples = jnp.concatenate(cols, axis=-1)
    samples = jnp.where(valid[..., None], samples, -1.0)
    from ..models.meganerf import cluster_ids_from_yz
    cluster_ids = cluster_ids_from_yz(pos[..., 1], pos[..., 2],
                                      grid_dim, min_position, pos_range)
    return samples, cluster_ids


# ----------------------------------------------------------------------
# Device-resident compact guided cache (production path)
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("opt", "budget"))
def _compact_reconstruct(tree: N3Tree, dirs: jax.Array, vdirs: jax.Array,
                         cen_world: jax.Array, t_buf: jax.Array,
                         ns: jax.Array, grid_dim: jax.Array,
                         min_position: jax.Array, pos_range: jax.Array,
                         opt: RenderOptions, budget: int):
    """Compact the padded per-ray t records into a flat valid-sample
    layout ON DEVICE and reconstruct MLP inputs from t (the exact
    rt_core.cuh:514-549 math) — no padded tensor ever crosses the
    host link (the reference's compaction, cuda_renderer.cpp:116-120,
    done the gather way instead of with stream compaction).

    Returns (x [budget, in_dim], cluster_ids [budget], z [budget],
    ray_of_p [budget] i32, offs [R] i32 inclusive-cumsum of ns).
    Positions >= sum(ns) are padding: they point at ray R-1 with slot
    clamped and are excluded by the compositor's segment bounds.
    """
    R = dirs.shape[0]
    offs = jnp.cumsum(ns, dtype=jnp.int32)                 # [R] inclusive
    total = offs[-1]
    p = jnp.arange(budget, dtype=jnp.int32)
    # ray_of_p == searchsorted(offs, p, 'right'), but built as a
    # sorted-indices scatter of segment-start flags + cumsum: XLA
    # lowers searchsorted to ~log2(M) chained gathers (measured 347 ms
    # at M=2M on v5e) while the flag scatter + scan costs 48 ms.
    # (an offs value == budget is out of bounds and correctly DROPPED
    # by the scatter — that segment starts beyond the buffer)
    ray_of_p = jnp.clip(
        jnp.cumsum(
            jnp.zeros((budget,), jnp.int32).at[offs[:-1]].add(
                1, indices_are_sorted=True)),
        0, R - 1)
    # ONE packed per-ray row gather replaces five separate per-sample
    # gathers (offs, ns, dirs, vdirs, scaled-dir): per-row gather cost
    # is flat to ~8 i32 words (PERFORMANCE.md fact 1), so packing
    # [dirs, (vdirs), zfac, bitcast(start)] into a single f32 row cuts
    # the reconstruct's gather bill ~3x (174 -> ~90 ms wall at 1080p,
    # probe 122).  zfac folds the tz norm per RAY: |t * dn / scale| =
    # t * |dn / scale| for t >= 0 (rt_core.cuh:527-534 math, ulp-level
    # association difference only).  ray_of_p is nondecreasing, so the
    # gather also carries the sorted-indices hint.
    d = dirs * tree.scale[None, :]
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    zfac = jnp.linalg.norm(dn / tree.scale[None, :], axis=-1)
    start_r = offs - ns                                    # [R] excl. starts
    parts = [dirs]
    if opt.need_viewdir:
        parts.append(vdirs)
    parts += [zfac[:, None],
              jax.lax.bitcast_convert_type(start_r, jnp.float32)[:, None]]
    ray_rows = jnp.concatenate(parts, axis=-1)             # [R, 5|8]
    g = ray_rows.at[ray_of_p].get(indices_are_sorted=True, mode="clip")
    start = jax.lax.bitcast_convert_type(g[:, -1], jnp.int32)
    S = t_buf.shape[1]
    slot = jnp.clip(p - start, 0, S - 1)
    # flat nondecreasing index into the t-buffer (2-D advanced indexing
    # would lower to an unhinted gather)
    t_v = t_buf.reshape(-1).at[
        jnp.clip(ray_of_p * S + slot, 0, R * S - 1)].get(
        indices_are_sorted=True, mode="clip")              # [budget]
    z = t_v * g[:, -2]
    pos = cen_world[None, :] + g[:, 0:3] * z[:, None]
    cols = [pos]
    if opt.need_viewdir:
        cols.append(g[:, 3:6])
    if opt.appearance_embedding != -1:
        cols.append(jnp.full((budget, 1), opt.appearance_embedding,
                             jnp.float32))
    x = jnp.concatenate(cols, axis=-1)
    valid = p < total
    x = jnp.where(valid[:, None], x, 0.0)
    from ..models.meganerf import cluster_ids_from_yz
    cids = cluster_ids_from_yz(pos[:, 1], pos[:, 2], grid_dim,
                               min_position, pos_range)
    cluster_ids = jnp.where(valid, cids, 0)
    return x, cluster_ids, jnp.where(valid, z, 0.0), ray_of_p, offs


@functools.partial(jax.jit, static_argnames=("opt", "budget"))
def _reconstruct_and_query(params, tree: N3Tree, dirs: jax.Array,
                           vdirs: jax.Array, cen_world: jax.Array,
                           t_buf: jax.Array, ns: jax.Array,
                           grid_dim: jax.Array, min_position: jax.Array,
                           pos_range: jax.Array, opt: RenderOptions,
                           budget: int):
    """Fused reconstruct + grouped MLP query: ONE dispatch instead of
    two (each round trip costs ~27 ms through the dev tunnel, ~1 ms
    production) and lets XLA overlap the reconstruct gathers with the
    query's sort skeleton."""
    from ..models.meganerf import query_grouped
    x, cids, z_c, ray_of_p, offs = _compact_reconstruct(
        tree, dirs, vdirs, cen_world, t_buf, ns, grid_dim,
        min_position, pos_range, opt, budget)
    res_c = query_grouped(params, cids, x)
    vdirs_c = x[:, 3:6] if opt.need_viewdir else None
    return res_c, z_c, ray_of_p, offs, vdirs_c


def segments_from_ns_hints(ns, max_samples: int,
                           quant: int = 16) -> tuple:
    """CDF-matched (fraction, S budget) classes for the segmented
    guided collect, from a previous invalidation's per-ray sample
    counts (the guided analogue of accel.DEFAULT_SEGMENTS, whose
    fractions came from the measured render-nrec CDF).

    Budget classes are powers of two up to ``max_samples``; each
    class's ray fraction is its CDF share floored to 1/``quant`` with
    one quantum of safety margin, so sorted rays in a class genuinely
    fit its budget even as hints drift a little (overflow escalation
    remains the correctness backstop).  Fractions are coarse on
    purpose: they are static jit keys, and the caller should reuse one
    segmentation across camera moves rather than re-deriving per frame.
    """
    from .accel import class_ladder
    ns = np.asarray(ns)
    classes = class_ladder(max_samples)[:-1]   # top handled by the
    segs = []                                  # final remainder append
    used = 0.0
    for cl in classes:
        f = np.floor(float((ns <= cl).mean()) * quant) / quant \
            - 1.0 / quant
        f = max(0.0, min(f, 1.0 - 1.0 / quant))
        if f > used:
            segs.append((f - used, cl))
            used = f
    segs.append((1.0 - used, max_samples))
    return tuple(segs)


def _seg_scan_prod(flag: jax.Array, v: jax.Array) -> jax.Array:
    """Segmented inclusive cumprod: ``flag`` marks segment starts."""
    def comb(a, b):
        f1, v1 = a
        f2, v2 = b
        return (f1 | f2, jnp.where(f2, v2, v1 * v2))
    _, prods = jax.lax.associative_scan(comb, (flag, v))
    return prods


def _seg_scan_sum(flag: jax.Array, v: jax.Array) -> jax.Array:
    """Segmented inclusive cumsum along axis 0 (flag [M], v [M, ...])."""
    f = flag if v.ndim == 1 else flag[:, None]
    def comb(a, b):
        f1, v1 = a
        f2, v2 = b
        return (f1 | f2, jnp.where(f2, v2, v1 + v2))
    _, sums = jax.lax.associative_scan(
        comb, (jnp.broadcast_to(f, v.shape), v))
    return sums


@functools.partial(jax.jit, static_argnames=("opt", "basis_dim",
                                              "fmt_sh"))
def composite_results_compact(res_c: jax.Array,     # [M, out_dim]
                              z_c: jax.Array,       # [M]
                              ray_of_p: jax.Array,  # [M] i32
                              offs: jax.Array,      # [R] i32 (incl. cumsum)
                              ns: jax.Array,        # [R] i32
                              vdirs: jax.Array,     # [R, 3]
                              opt: RenderOptions,
                              basis_dim: int,
                              fmt_sh: bool) -> jax.Array:
    """Composite MLP outputs over the COMPACT valid-sample layout
    (rt_core.cuh:334-416 semantics, zero padding work).

    T runs as a segmented cumprod (associative scan with reset flags) of
    ``exp(-sigma * delta)`` within each ray's contiguous sample run, and
    per-ray rgb as a segmented cumsum read at the segment end — both
    O(M log M) elementwise passes, no scatters.  vs the padded
    ``composite_results`` the only difference is f32 reduction order
    (tree instead of sequential): drift ~1e-7, well inside the 1e-3
    parity budget.  Returns [R, 4] rgba with alpha == 1
    (renderer_kernel.cu:316).
    """
    M, out_dim = res_c.shape
    R = ns.shape[0]
    sigma_idx = min(3, out_dim - 1)               # rt_core.cuh:365
    p = jnp.arange(M, dtype=jnp.int32)
    total = offs[-1]
    valid = p < total
    # segment flags from neighbor SHIFTS of the sorted ray_of_p (the
    # same derivation as the Pallas prep) — the equivalent
    # offs[ray_of_p]/ns[ray_of_p] forms are two [M]-row gathers
    # (~10 ns/row each, PERFORMANCE.md fact 1) for flags the shifts
    # produce with pure elementwise work
    prev_r = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), ray_of_p[:-1]])
    next_r = jnp.concatenate(
        [ray_of_p[1:], jnp.full((1,), -1, jnp.int32)])
    is_start = valid & (ray_of_p != prev_r)
    is_last = valid & ((ray_of_p != next_r) | (p == total - 1))
    same_next = jnp.concatenate(
        [(ray_of_p[1:] == ray_of_p[:-1]), jnp.zeros((1,), bool)])
    z_next = jnp.concatenate([z_c[1:], jnp.zeros((1,), jnp.float32)])
    # delta_i = z[i+1] - z[i] within the ray; unused (forced 0) on the
    # last sample of a ray, whose weight takes all remaining T
    delta = jnp.where(same_next & valid & ~is_last, z_next - z_c, 0.0)
    sigma = res_c[:, sigma_idx]
    wc = jnp.exp(-sigma * delta)
    wc_eff = jnp.where(valid & ~is_last, wc, 1.0)
    prods = _seg_scan_prod(is_start, wc_eff)      # inclusive
    T = jnp.where(is_start, 1.0,
                  jnp.concatenate([jnp.ones((1,), jnp.float32),
                                   prods[:-1]]))
    weight = jnp.where(is_last, T,
                       jnp.where(valid, T * (1.0 - wc), 0.0))

    if opt.render_depth:
        contrib = (weight * T)[:, None]           # rt_core.cuh:372
    elif fmt_sh and basis_dim >= 1:
        basis = masked_sh_basis(basis_dim, vdirs,
                                opt.basis_minmax[0],
                                opt.basis_minmax[1])          # [R, B]
        b_p = basis.at[ray_of_p].get(indices_are_sorted=True,
                                     mode="clip")             # [M, B]
        coeffs = res_c[:, :3 * basis_dim].reshape(M, 3, basis_dim)
        logits = jnp.einsum("mb,mcb->mc", b_p, coeffs)
        contrib = weight[:, None] * jax.nn.sigmoid(logits)    # [M, 3]
    else:
        contrib = weight[:, None] * res_c[:, :3]
    sums = _seg_scan_sum(is_start, contrib)       # [M, k]
    # per-ray total = segmented inclusive sum at the last valid slot
    last_idx = jnp.clip(offs - 1, 0, M - 1)       # [R]
    ray_tot = jnp.take(sums, last_idx, axis=0)
    ray_tot = jnp.where((ns > 0)[:, None], ray_tot, 0.0)
    if opt.render_depth:
        rgb = jnp.minimum(ray_tot[:, 0] * 0.3, 1.0)[:, None].repeat(
            3, axis=1)
    else:
        rgb = ray_tot[:, :3]
    return jnp.concatenate([rgb, jnp.ones((R, 1), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("opt", "width", "height",
                                              "basis_dim", "fmt_sh"))
def _composite_frame_compact_jit(res_c, z_c, ray_of_p, offs, ns,
                                 transform, intr, rot_dirs,
                                 opt: RenderOptions, width: int,
                                 height: int, basis_dim: int,
                                 fmt_sh: bool, perm=None, inv=None):
    """One-dispatch guided frame: raygen + compact composite.

    ``perm``/``inv`` (both or neither): the cache lives in sorted ray
    space (collect_and_query_fast with an order) — per-ray viewdirs
    are permuted into rank order before compositing and the finished
    [R, 4] frame is unpermuted back to pixel order (ONE narrow gather;
    the wide per-sample arrays never move)."""
    dirs, _ = screen2worlddir(width, height, intr[0], intr[1],
                              intr[2], intr[3], transform)
    vdirs = rodrigues(rot_dirs, dirs)
    if perm is not None:
        vdirs = vdirs.at[perm].get(unique_indices=True, mode="clip")
    out = composite_results_compact(res_c, z_c, ray_of_p, offs, ns,
                                    vdirs, opt, basis_dim, fmt_sh)
    if inv is not None:
        out = out.at[inv].get(unique_indices=True, mode="clip")
    return out.reshape(height, width, 4)


@jax.jit
def _unpermute_frame_jit(out_flat, inv):
    """Pixel-order restore for a sorted-space composited frame."""
    return out_flat.at[inv].get(unique_indices=True, mode="clip")


def collect_and_query_fast(tree: N3Tree, leaf_map, model, camera,
                           opt: RenderOptions, chunk_size: int = 1 << 15,
                           skip_table=None, order=None,
                           segments=None, budget_hint=None):
    """Leaf-map accelerated guided collection + MLP query, fully
    device-resident (reference invalidation path,
    cuda_renderer.cpp:107-134).

    The collection march records only per-ray t values; compaction,
    sample reconstruction, cluster assignment, and the grouped-matmul
    MLP query all run on device — the ONLY host traffic is one scalar
    (the valid-sample count, which sizes the static compact budget).
    The returned cache keeps results in the compact [M, out_dim]
    layout consumed by :func:`composite_results_compact`.

    Falls back to the host reconstruction path when the model runs on
    the eager-torch fallback (samples must cross to torch anyway).
    """
    if model._torch_modules is not None:
        return _collect_and_query_fast_host(tree, leaf_map, model,
                                            camera, opt, chunk_size,
                                            skip_table=skip_table)
    dirs, cen = screen2worlddir(
        camera.width, camera.height, camera.fx, camera.fy,
        camera.cx, camera.cy, jnp.asarray(camera.transform))
    R = dirs.shape[0]
    pad = (-R) % chunk_size if chunk_size else 0
    dirs_p = dirs if not pad else jnp.concatenate(
        [dirs, jnp.tile(dirs[-1:], (pad, 1))])
    if order is not None and pad:
        # extend the R-ray order to the padded tail (pad rays duplicate
        # the last pixel; append them after the sorted ranks)
        tail = jnp.arange(R, R + pad, dtype=jnp.int32)
        order = (jnp.concatenate([order[0], tail]),
                 jnp.concatenate([order[1], tail]))
    total = None
    steps_s = None
    settled_segs = None
    spec = None
    if budget_hint:
        budget_hint = -(-int(budget_hint) // (1 << 16)) * (1 << 16)
    # ray-space setup is collect-independent: hoisted so the
    # speculative branch below can enqueue reconstruct+query with it
    if order is not None:
        # rays (and their derived per-sample rows) live in sorted space
        perm_r = order[0][:R]
        dirs_r = dirs_p.at[perm_r].get(unique_indices=True, mode="clip")
    else:
        perm_r = None
        dirs_r = dirs
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs_r)
    # Ordered collects stay in SORTED ray space end to end: rank k of
    # every array is ray perm[k] (the pad tail was appended after the
    # sorted ranks, so ranks [0, R) are exactly the real rays).  The
    # [R, S] t-buffer inverse unpermute alone measured 142 ms at
    # 1080p/S=32 (128-byte rows on the wide-row gather plateau,
    # PERFORMANCE.md fact 1); staying sorted defers all reordering to
    # ONE narrow [R, 4] gather on the composited frame (~11 ms),
    # applied by composite_frame via the cached ``order_inv``.
    if order is not None and segments is not None:
        # CDF-budget segmented collect (VERDICT r2 item 4): reduced S
        # budgets for the hint-cheap ray classes.  The per-segment
        # overflow flags ride the SAME device fetch as the total
        # sample count the compact budget needs anyway, so — unlike
        # the zero_frac prototype — the stale-hint check costs NO
        # extra host sync; escalation (doubling the overflowed class)
        # is the rare stale-hint path only.
        segs = list(segments)
        while True:
            t_buf, ns, steps_s, seg_ov = collect_t_fast(
                tree, leaf_map, dirs_p, cen, opt,
                chunk_size=chunk_size, skip_table=skip_table,
                order=order, segments=tuple(segs),
                return_steps=True, keep_sorted=True)
            t_buf, ns = t_buf[:R], ns[:R]
            # enqueue the tiny stats op FIRST: the device runs work in
            # enqueue order, so it completes right after the collect —
            # the host fetch below then overlaps the speculative fused
            # program instead of waiting behind it
            stats_dev = jnp.concatenate(
                [jnp.sum(ns, dtype=jnp.int32)[None],
                 seg_ov.astype(jnp.int32)])
            if budget_hint:
                # SPECULATIVE budget execution: enqueue the fused
                # reconstruct+query at the caller's hinted budget
                # BEFORE the stats fetch, so the fetch's host round
                # trip (~1 ms production, ~27 ms dev tunnel) overlaps
                # device execution instead of serializing the
                # pipeline.  Discarded if a segment overflowed (the
                # t-buffer is budget-truncated) or the true total
                # exceeds the hint (the compact buffer would silently
                # drop samples, see _compact_reconstruct padding).
                spec = _reconstruct_and_query(
                    model.params, tree, dirs_r, vdirs, cen, t_buf, ns,
                    jnp.asarray(model.grid_dim, jnp.int32),
                    jnp.asarray(model.min_position, jnp.float32),
                    jnp.asarray(model.range, jnp.float32), opt,
                    budget_hint)
            stats = np.asarray(stats_dev)        # ONE combined fetch
            total = int(stats[0])
            ov = stats[1:] > 0
            if ov.any():
                spec = None                      # stale t-buffer
            if not ov.any():
                # expose the SETTLED ladder so the caller can start the
                # next invalidation here instead of re-walking the
                # escalation (each walk step is a full re-collect; a
                # novel tuple is a remote recompile — measured 4 walks
                # + 5-6 s compiles per pose before persistence)
                settled_segs = tuple(segs)
                break
            for i, hit in enumerate(ov):
                if hit:
                    segs[i] = (segs[i][0],
                               max(1, min(opt.max_guided_samples,
                                          segs[i][1] * 2)))
    elif order is not None:
        t_buf, ns, steps_s = collect_t_fast(
            tree, leaf_map, dirs_p, cen, opt, chunk_size=chunk_size,
            skip_table=skip_table, order=order,
            return_steps=True, keep_sorted=True)
        t_buf, ns = t_buf[:R], ns[:R]
    else:
        t_buf, ns, steps_s = collect_t_fast(
            tree, leaf_map, dirs_p, cen, opt, chunk_size=chunk_size,
            skip_table=skip_table, return_steps=True)
        t_buf, ns, steps_s = t_buf[:R], ns[:R], steps_s[:R]
    if total is None:
        total = int(jnp.sum(ns))             # one scalar fetch
    # static compact budget: next 64k multiple (power-of-2 sizing
    # padded ~1.5x at the 1080p benchmark scale — every budget-sized
    # op, the grouped matmuls included, paid for the padding; 64k
    # granularity keeps the jit-key count bounded at ~1.5% padding)
    budget = max(1 << 16, -(-total // (1 << 16)) * (1 << 16))
    if spec is not None and total <= budget_hint:
        res_c, z_c, ray_of_p, offs, vdirs_c = spec
        budget = budget_hint                 # arrays are hint-sized
    else:
        res_c, z_c, ray_of_p, offs, vdirs_c = _reconstruct_and_query(
            model.params, tree, dirs_r, vdirs, cen, t_buf, ns,
            jnp.asarray(model.grid_dim, jnp.int32),
            jnp.asarray(model.min_position, jnp.float32),
            jnp.asarray(model.range, jnp.float32), opt, budget)
    out = dict(
        results_c=res_c,
        z_c=z_c,
        ray_of_p=ray_of_p,
        offs=offs,
        num_samples=ns,
    )
    if settled_segs is not None:
        out["segments"] = settled_segs
    if order is not None:
        inv_r = order[1][:R]
        # external contract: num_samples (and collect_steps) are PIXEL
        # indexed — the Viewer feeds them straight to order_from_hints
        # — while the compact arrays stay sorted; the compositor picks
        # up num_samples_sorted + order_inv/order_perm from the cache
        out["num_samples_sorted"] = ns
        out["num_samples"] = ns.at[inv_r].get(unique_indices=True,
                                              mode="clip")
        out["order_perm"] = perm_r
        out["order_inv"] = inv_r
        if steps_s is not None:
            steps_s = steps_s[:R].at[inv_r].get(unique_indices=True,
                                                mode="clip")
    if steps_s is not None:
        out["collect_steps"] = steps_s
    if opt.need_viewdir:
        # per-sample viewdirs were already materialized as MLP input
        # columns — keep them so the Pallas compact compositor can
        # evaluate the SH basis in-register instead of re-gathering
        # [M, basis] rows (62 ms at M=2^21, measured).  They are only
        # valid for the COLLECT-time camera/rot_dirs: the reference
        # (and the XLA route) re-evaluates SH from the CURRENT frame's
        # view directions every composite (rt_core.cuh:334-416), so
        # composite_frame must not shade with these once the viewdir
        # inputs moved — record their signature for the route gate
        out["vdirs_c"] = vdirs_c
        out["vdirs_sig"] = _viewdir_signature(camera, opt)
    # budget hint for the caller's NEXT invalidation: one extra 64k
    # quantum of hysteresis keeps it valid under slow total drift, so
    # the speculative dispatch usually lands (and the executable family
    # stays bounded)
    out["budget_hint_next"] = max(
        1 << 16, -(-total // (1 << 16)) * (1 << 16)) + (1 << 16)
    return out


def _collect_and_query_fast_host(tree: N3Tree, leaf_map, model, camera,
                                 opt: RenderOptions,
                                 chunk_size: int = 1 << 15,
                                 skip_table=None):
    """Host-reconstruction variant of :func:`collect_and_query_fast`
    (eager-torch model fallback).

    Only the compact ``(t_buf, num_samples)`` record crosses to the host
    (the full padded [R, S, dim] sample tensor is ~8x larger and was the
    dominant invalidation cost); sample rows and cluster ids are
    reconstructed from ``t`` on the host over valid entries only — the
    same rt_core.cuh:514-549 float32 math as :func:`reconstruct_samples`.

    PERF CLIFF (accepted for a fallback): unlike the device path, the
    MLP results are scattered back into a PADDED ``[R, S, out_dim]``
    host array (and a padded ``z_vals``) before re-upload — exactly the
    [R, S]-shaped traffic the round-2 compact layout eliminated.  At
    1080p / S=32 that is ~0.5 GB of host numpy and a multi-second
    upload through the dev tunnel; the padded composite then pays the
    [R, S] shading cost every frame.  This path only runs when the
    model has no converted JAX weights (eager-torch fallback), where
    the MLP forward itself is host-bound anyway, so the cliff does not
    change the order of magnitude — but do NOT route converted models
    through here.
    """
    dirs, cen = screen2worlddir(
        camera.width, camera.height, camera.fx, camera.fy,
        camera.cx, camera.cy, jnp.asarray(camera.transform))
    R = dirs.shape[0]
    pad = (-R) % chunk_size if chunk_size else 0
    dirs_p = dirs if not pad else jnp.concatenate(
        [dirs, jnp.tile(dirs[-1:], (pad, 1))])
    t_buf, ns = collect_t_fast(tree, leaf_map, dirs_p, cen, opt,
                               chunk_size=chunk_size,
                               skip_table=skip_table)
    vd = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)

    t_np = np.asarray(t_buf)[:R]
    ns_np = np.asarray(ns)[:R]
    dirs_np = np.asarray(dirs, np.float32)
    vd_np = np.asarray(vd, np.float32)
    cen_np = np.asarray(cen, np.float32)
    scale = np.asarray(tree.scale, np.float32)
    S = t_np.shape[1]

    valid = np.arange(S)[None, :] < ns_np[:, None]
    ray_i, slot_i = np.nonzero(valid)
    t_v = t_np[ray_i, slot_i]
    # scaled-normalized direction (what t is measured along)
    d = dirs_np * scale[None, :]
    d = d / np.sqrt((d * d).sum(-1, keepdims=True, dtype=np.float32))
    tz = (t_v[:, None] * d[ray_i]) / scale[None, :]
    z_v = np.sqrt((tz * tz).sum(-1, dtype=np.float32)).astype(np.float32)
    pos = cen_np[None, :] + dirs_np[ray_i] * z_v[:, None]
    cols = [pos]
    if opt.need_viewdir:
        cols.append(vd_np[ray_i])
    if opt.appearance_embedding != -1:
        cols.append(np.full((len(ray_i), 1), opt.appearance_embedding,
                            np.float32))
    flat_samples = np.concatenate(cols, axis=-1)
    flat_ids = model.cluster_ids_for_points(pos[:, 1:3])

    res = model.query_device(flat_ids, flat_samples)
    out_dim = model.output_dim
    results = np.zeros((R, S, out_dim), np.float32)
    results[ray_i, slot_i] = np.asarray(res)
    z_vals = np.full((R, S), -1.0, np.float32)
    z_vals[ray_i, slot_i] = z_v
    return dict(
        results=jnp.asarray(results),
        z_vals=jnp.asarray(z_vals),
        num_samples=jnp.asarray(ns_np),
    )


# ----------------------------------------------------------------------
# Host orchestration used by the Viewer
# ----------------------------------------------------------------------
def collect_and_query(tree: N3Tree, model, camera, opt: RenderOptions,
                      track_visit: bool = False):
    """Collect guided samples and run the MLP over the valid set
    (reference frame path cuda_renderer.cpp:107-134)."""
    dirs, cen = screen2worlddir(
        camera.width, camera.height, camera.fx, camera.fy,
        camera.cx, camera.cy, jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    col = collect_samples(
        tree, dirs, vdirs, cen,
        jnp.asarray(model.grid_dim, jnp.int32),
        jnp.asarray(model.min_position, jnp.float32),
        jnp.asarray(model.range, jnp.float32),
        opt, track_visit=track_visit)
    ns = np.asarray(col.num_samples)
    samples = np.asarray(col.samples)
    ids = np.asarray(col.cluster_ids)
    R, S = ids.shape
    valid = np.arange(S)[None, :] < ns[:, None]
    flat_idx = np.nonzero(valid.reshape(-1))[0]
    flat_samples = samples.reshape(R * S, -1)[flat_idx]
    flat_ids = ids.reshape(-1)[flat_idx]
    res = model.query_device(flat_ids, flat_samples[:, 1:])
    out_dim = model.output_dim
    padded = np.zeros((R * S, out_dim), np.float32)
    padded[flat_idx] = np.asarray(res)
    cache = dict(
        results=jnp.asarray(padded.reshape(R, S, out_dim)),
        z_vals=jnp.asarray(samples[..., 0]),
        num_samples=jnp.asarray(ns),
    )
    from .render import RenderResult
    rres = RenderResult(jnp.zeros((R, 4), jnp.float32), col.split_vote,
                        col.sample_vote, col.visited)
    return cache, rres


def _viewdir_signature(camera, opt: RenderOptions) -> tuple:
    """Hashable signature of everything per-sample view directions
    depend on (camera pose/intrinsics + the rot_dirs Rodrigues knob):
    collect-time cached viewdirs are reusable for shading exactly
    while this matches the composite-time value."""
    return (np.asarray(camera.transform, np.float32).tobytes(),
            float(camera.fx), float(camera.fy),
            float(camera.cx), float(camera.cy),
            camera.width, camera.height,
            tuple(float(r) for r in opt.rot_dirs))


def composite_frame(tree: N3Tree, camera, opt: RenderOptions, cache,
                    use_pallas=None):
    """Per-frame composite of cached MLP results
    (reference render_nerf_results, renderer_kernel.cu:294-327).

    ``use_pallas``: None (default) auto-routes — compact SH caches
    with per-sample viewdirs take the single-pass Pallas
    segmented-scan kernel, everything else the XLA path; False forces
    XLA.  (The padded-layout [R, S] Pallas kernel measured SLOWER than
    XLA at frame scale and is no longer routed — it remains in
    pallas_composite.py as a validated reference kernel only.)"""
    fmt_sh = tree.data_format.format == "SH"
    if "results_c" in cache:
        # compact device-resident cache (collect_and_query_fast).
        # Default route for SH with per-sample viewdirs: the Pallas
        # single-pass segmented-scan compositor (pallas_composite.py)
        # — the XLA associative scans + basis gather it replaces
        # measured 96 + 62 ms of a 256 ms composite at M=2^21.
        # ``use_pallas=False`` forces the XLA path (also used for
        # depth mode / no-viewdir models, where the kernel has no
        # per-sample shading input).
        M = cache["results_c"].shape[0]
        # sorted-space caches (ordered collect) carry the pixel restore
        # permutation; per-ray inputs below must use the sorted ns
        ns_comp = cache.get("num_samples_sorted", cache["num_samples"])
        inv = cache.get("order_inv")
        from . import pallas_composite as pc
        if (use_pallas is not False and fmt_sh
                and not opt.render_depth
                and cache.get("vdirs_c") is not None
                and ("vdirs_sig" not in cache
                     or cache["vdirs_sig"] == _viewdir_signature(
                         camera, opt))
                and M % (pc._SUB * 128) == 0
                and not getattr(pc, "_compact_broken", False)):
            try:
                out = pc.composite_results_compact_pallas(
                    cache["results_c"], cache["z_c"],
                    cache["ray_of_p"], cache["offs"],
                    ns_comp, cache["vdirs_c"],
                    opt, tree.data_format.basis_dim, fmt_sh)
                if inv is not None:
                    out = _unpermute_frame_jit(out, inv)
                return out.reshape(camera.height, camera.width, 4)
            except Exception as e:  # pragma: no cover - backend-dep
                import warnings
                # don't retry the (remote, slow) compile every frame
                pc._compact_broken = True
                warnings.warn(f"Pallas compact compositor unavailable "
                              f"({e!r}); falling back to XLA")
        # raygen + composite fused into one dispatch (camera rides as
        # traced arrays so motion never recompiles)
        out = _composite_frame_compact_jit(
            cache["results_c"], cache["z_c"], cache["ray_of_p"],
            cache["offs"], ns_comp,
            jnp.asarray(camera.transform),
            jnp.asarray((camera.fx, camera.fy, camera.cx, camera.cy),
                        jnp.float32),
            jnp.asarray(opt.rot_dirs, jnp.float32),
            opt, camera.width, camera.height,
            tree.data_format.basis_dim, fmt_sh,
            perm=cache.get("order_perm"), inv=inv)
        return out
    dirs, cen = screen2worlddir(
        camera.width, camera.height, camera.fx, camera.fy,
        camera.cx, camera.cy, jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    out = composite_results(
        cache["results"], cache["z_vals"], cache["num_samples"],
        vdirs, opt, tree.data_format.basis_dim, fmt_sh)
    return out.reshape(camera.height, camera.width, 4)
