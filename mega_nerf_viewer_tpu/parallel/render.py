"""Multi-chip frame rendering via shard_map over the device mesh.

Rays (pixels) are sharded across the ``rays`` mesh axis; the octree and
options are replicated.  Visit marks are combined with a ``pmax``
collective so refinement bookkeeping sees the union of all chips' marks;
votes ride back with their rays (the host-side top-k aggregation already
operates on the full vote set).  This realizes BASELINE config 5: rays
sharded over chips, tiles gathered per frame — collectives ride ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from ..ops.render import render_rays, RenderResult, composite_background, \
    DEFAULT_MAX_LEVELS
from ..ops.rays import screen2worlddir, rodrigues
from .mesh import RAY_AXIS, default_mesh


@functools.lru_cache(maxsize=32)
def _exact_sharded_program(mesh: Mesh, opt: RenderOptions,
                           track_visit: bool, max_levels: int,
                           tree_treedef):
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    other_axes = tuple(n for n in mesh.axis_names if n != RAY_AXIS)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=RenderResult(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                               P()),
        check_vma=False)
    def _run(tree, dirs, vdirs, cen):
        res = render_rays(tree, dirs, vdirs, cen, opt,
                          track_visit=track_visit, max_levels=max_levels)
        visited = jax.lax.pmax(res.visited, RAY_AXIS)
        if other_axes:
            visited = jax.lax.pmax(visited, other_axes)
        return RenderResult(res.out, res.split_vote, res.sample_vote,
                            visited)

    return _run


def render_rays_sharded(tree: N3Tree,
                        dirs: jax.Array, vdirs: jax.Array,
                        cen_world: jax.Array,
                        opt: RenderOptions,
                        mesh: Mesh,
                        track_visit: bool = False,
                        max_levels: int = DEFAULT_MAX_LEVELS) -> RenderResult:
    """Shard the ray batch over ``mesh`` axis 'rays' (jitted program
    cached per mesh/options — see _exact_sharded_program).

    R must be divisible by the axis size (pad upstream).
    """
    run = _exact_sharded_program(mesh, opt, track_visit, max_levels,
                                 jax.tree_util.tree_structure(tree))
    return run(tree, dirs, vdirs, cen_world)


@functools.lru_cache(maxsize=32)
def _fast_sharded_program(mesh: Mesh, opt: RenderOptions,
                          max_dense: int, chunk_size: int,
                          tree_treedef, lm_treedef, has_skip: bool):
    """Build + jit the sharded fast-march program once per
    (mesh, options, shapes) — rebuilding the shard_map per frame would
    re-trace and recompile every call."""
    from ..ops.accel import render_rays_fast, FastRenderResult
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)
    skip_spec = (P(),) if has_skip else ()

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, P(RAY_AXIS), P(RAY_AXIS), P())
        + skip_spec,
        out_specs=FastRenderResult(P(RAY_AXIS), P(), P(RAY_AXIS),
                                   P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False)
    def _run(tree, lm, dirs, vdirs, cen, *skip):
        res = render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                               max_dense=max_dense,
                               chunk_size=chunk_size,
                               skip_table=skip[0] if skip else None)
        overflow = jax.lax.pmax(res.overflow.astype(jnp.int32), RAY_AXIS)
        other = tuple(n for n in mesh.axis_names if n != RAY_AXIS)
        if other:
            overflow = jax.lax.pmax(overflow, other)
        return FastRenderResult(res.out, overflow.astype(bool),
                                res.steps, res.split_vote,
                                res.sample_vote, res.nrec, res.skips)

    return _run


def render_rays_fast_sharded(tree: N3Tree, leaf_map,
                             dirs: jax.Array, vdirs: jax.Array,
                             cen_world: jax.Array,
                             opt: RenderOptions,
                             mesh: Mesh,
                             max_dense: int = 32,
                             chunk_size: int = 0,
                             skip_table: Optional[jax.Array] = None):
    """Leaf-map fast march with rays sharded over the 'rays' mesh axis
    (tree + leaf map replicated per chip — BASELINE config 5 layout).
    ``skip_table`` enables the Pallas entry-skip prepass per shard."""
    run = _fast_sharded_program(
        mesh, opt, max_dense, chunk_size,
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map),
        skip_table is not None)
    args = (tree, leaf_map, dirs, vdirs, cen_world)
    if skip_table is not None:
        args += (skip_table,)
    return run(*args)


def render_frame_fast_sharded(tree: N3Tree, leaf_map, camera,
                              opt: RenderOptions,
                              mesh: Optional[Mesh] = None,
                              max_dense: int = 32,
                              chunk_size: int = 0,
                              skip_table: Optional[jax.Array] = None):
    """Full sharded fast frame (4K orbit-batch layout).  Returns
    ([H, W, 4] f32, overflow bool)."""
    from ..ops.render import composite_background
    if mesh is None:
        mesh = default_mesh()
    n_shards = mesh.shape[RAY_AXIS]
    w, h = camera.width, camera.height
    dirs, cen = screen2worlddir(w, h, camera.fx, camera.fy,
                                camera.cx, camera.cy,
                                jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    R = dirs.shape[0]
    quantum = n_shards * max(chunk_size, 1)
    pad = (-R) % quantum
    if pad:
        dirs = jnp.concatenate([dirs, jnp.tile(dirs[-1:], (pad, 1))])
        vdirs = jnp.concatenate([vdirs, jnp.tile(vdirs[-1:], (pad, 1))])
    res = render_rays_fast_sharded(tree, leaf_map, dirs, vdirs, cen,
                                   opt, mesh, max_dense=max_dense,
                                   chunk_size=chunk_size,
                                   skip_table=skip_table)
    img = composite_background(res.out[:R], opt)
    return img.reshape(h, w, 4), res.overflow


def deal_chunks_balanced(chunk_costs, seg_counts, n_shards: int):
    """Cost-balanced chunk->shard assignment, stratified by budget class.

    The stride deal (shard s takes sorted chunks s, s+n, ...) balances
    only in expectation; on the aerial artifact its worst shard ran 23%
    over the mean (measured per-shard sums of chunk-max march steps:
    1125 vs mean 913 — the per-shard fps projection is the WORST chip).
    Greedy LPT within each budget stratum with equal per-shard chunk
    counts measures imbalance 1.009 on the same frame.

    ``chunk_costs``: host array [n_chunks] of per-chunk cost estimates
    (sum or max of the sorted step hints per chunk).  ``seg_counts``:
    ((n_chunks, budget), ...) strata; every count must be a multiple of
    ``n_shards`` (use seg_counts_from_hints(quantum=n_shards)).

    Returns (slot_of_chunk i32 [n_chunks], per_shard_seg_counts): chunk
    g lands at flat slot ``slot_of_chunk[g]`` = shard * per_shard_chunks
    + within-shard position; within a shard, chunks keep ascending
    global order so the per-shard segment layout is the same
    ``(n / n_shards, budget)`` tuple on every shard.
    """
    costs = np.asarray(chunk_costs, np.float64)
    n_chunks = costs.shape[0]
    assert sum(n for n, _ in seg_counts) == n_chunks, \
        (seg_counts, n_chunks)
    per_shard_chunks = n_chunks // n_shards
    shard_of = np.empty(n_chunks, np.int64)
    load = np.zeros(n_shards)
    start = 0
    for n, _md in seg_counts:
        assert n % n_shards == 0, (n, n_shards)
        idx = np.arange(start, start + n)
        cap = np.full(n_shards, n // n_shards)
        # LPT: heaviest chunk first onto the lightest shard with
        # remaining capacity in this stratum
        for g in idx[np.argsort(-costs[idx], kind="stable")]:
            cands = np.flatnonzero(cap > 0)
            s = cands[np.argmin(load[cands])]
            shard_of[g] = s
            load[s] += costs[g]
            cap[s] -= 1
        start += n
    # within-shard position = rank of the chunk's global index among
    # its shard's chunks (stable ascending order keeps strata aligned)
    slot_of_chunk = np.empty(n_chunks, np.int32)
    for s in range(n_shards):
        mine = np.flatnonzero(shard_of == s)
        slot_of_chunk[mine] = s * per_shard_chunks + np.arange(len(mine))
    per_shard = tuple((n // n_shards, md) for n, md in seg_counts)
    return slot_of_chunk, per_shard


def segmented_shard_body(tree, lm, pix, transform, intr, rot_dirs, skip,
                         *, opt: RenderOptions, seg_counts,
                         chunk_size: int, width: int,
                         return_hints: bool = False):
    """Per-shard computation of the segmented sharded frame: shard-local
    raygen from pixel indices + the per-segment fast marches.

    Factored out of the shard_map program below so a SINGLE chip can
    time exactly the per-shard workload — bench.py jits this directly
    to produce the driver-captured v5e-8 slice projection (the sharded
    program's only intra-frame collective is the scalar overflow pmax,
    so per-chip time ~= frame time; the cross-chip output unpermute is
    accounted separately).  Returns (out [per, 4], seg_overflow counts)
    — plus packed per-ray hints (accel.pack_hints, shard-local ray
    order) when ``return_hints``: the sharded MOTION step feeds them
    to the next pose's order rebuild (parallel/motion.py)."""
    from ..ops.accel import render_rays_fast, pack_hints
    from ..ops.rays import screen2worlddir_indices, rodrigues
    dirs_p, cen = screen2worlddir_indices(
        pix, width, intr[0], intr[1], intr[2], intr[3], transform)
    vdirs_p = rodrigues(rot_dirs, dirs_p)
    outs, ovs, hints = [], [], []
    off = 0
    for c_chunks, md in seg_counts:
        if c_chunks == 0:
            # empty layout slot (ray-floor chunk quantization,
            # accel.segment_chunks); keep overflow index-aligned
            ovs.append(jnp.zeros((), jnp.int32))
            continue
        n = c_chunks * chunk_size
        sl = slice(off, off + n)
        res = render_rays_fast(
            tree, lm, dirs_p[sl], vdirs_p[sl], cen, opt,
            max_dense=md,
            chunk_size=chunk_size if c_chunks > 1 else 0,
            skip_table=skip)
        outs.append(res.out)
        ovs.append(res.overflow)
        if return_hints:
            hints.append(pack_hints(res.steps, res.nrec, res.skips))
        off += n
    out = jnp.concatenate(outs, 0)
    if return_hints:
        return out, jnp.stack(ovs), jnp.concatenate(hints, 0)
    return out, jnp.stack(ovs)


@functools.lru_cache(maxsize=32)
def _fast_segmented_sharded_program(mesh: Mesh, opt: RenderOptions,
                                    seg_counts, chunk_size: int,
                                    width: int, tree_treedef,
                                    lm_treedef, has_skip: bool):
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)
    skip_spec = (P(),) if has_skip else ()
    other = tuple(n for n in mesh.axis_names if n != RAY_AXIS)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, P(RAY_AXIS), P(), P(), P())
        + skip_spec,
        out_specs=(P(RAY_AXIS), P()),
        check_vma=False)
    def _run(tree, lm, pix, transform, intr, rot_dirs, *skip):
        out, ovs = segmented_shard_body(
            tree, lm, pix, transform, intr, rot_dirs,
            skip[0] if skip else None, opt=opt, seg_counts=seg_counts,
            chunk_size=chunk_size, width=width)
        seg_ov = ovs.astype(jnp.int32)
        seg_ov = jax.lax.pmax(seg_ov, RAY_AXIS)
        if other:
            seg_ov = jax.lax.pmax(seg_ov, other)
        return out, seg_ov

    return _run


def render_frame_fast_segmented_sharded(
        tree: N3Tree, leaf_map, camera, opt: RenderOptions,
        order, segments, mesh: Optional[Mesh] = None,
        chunk_size: int = 1920, skip_table: Optional[jax.Array] = None,
        sorted_output: bool = False,
        seg_counts: Optional[tuple] = None,
        chunk_costs=None):
    """Record-sorted segmented fast frame, rays sharded over the mesh.

    Rays are DEALT to shards at CHUNK granularity: the sorted order is
    cut into ``chunk_size`` chunks and shard s takes chunks s, s+n,
    s+2n, ... — every chip gets an equal mix of cheap and expensive
    chunk classes (a contiguous split would send all heavy recorders
    to the last chip), while each chunk stays CONTIGUOUS in sorted
    order, preserving the within-block sort coherence the march and
    prepass depend on.  (Rank-granular dealing — rank r -> shard
    r % n — spread each 8192-ray prepass block over 8x the key range;
    measured 11.6 -> 9.1 ms per 1/8-frame shard when switched to
    chunk dealing, worst shard 9.5 ms.)  Within a shard rays stay
    sorted, so the same per-segment ``max_dense`` budget fractions
    apply locally; per-segment overflow flags are pmax-combined for
    the caller's escalation protocol.  Raygen runs shard-local from
    pixel indices; the only cross-chip data movement is the final
    unpermute gather of the [R, 4] output.

    ``sorted_output`` skips that gather: the background composite is
    elementwise (shard-local), so the device program then has NO
    cross-chip data movement at all — each chip's output rows go
    straight to the host/display, which applies the returned index
    map (``rows[index_map].reshape(h, w, 4)`` recovers pixel order
    bit-exactly).  This is the sharded analogue of the single-chip
    ``sorted_output`` (ops/accel.render_frame_fast_segmented) and
    removes the ICI output collective from the per-frame critical
    path entirely.

    ``seg_counts`` (with ``chunk_costs``) switches the deal and the
    budget layout to the chunk-exact scheme: ``seg_counts`` is a GLOBAL
    ((n_chunks, budget), ...) tuple whose counts are multiples of the
    shard count (ops.accel.seg_counts_from_hints, quantum = n_shards)
    and ``chunk_costs`` a host [n_chunks] cost estimate per sorted
    chunk; chunks are then dealt by stratified-LPT
    (:func:`deal_chunks_balanced`) instead of the stride.  Pixels stay
    bit-identical (the deal is a pure partition; budgets only ever
    cover more than the ladder classes would).

    Returns (img [H, W, 4], seg_overflow i32 [n_segments]) — or, when
    ``sorted_output``, (rows [R_padded, 4] in shard-dealt order,
    seg_overflow, index_map i32 [R]).
    """
    from ..ops.render import composite_background
    from ..ops.accel import segment_chunks
    if mesh is None:
        mesh = default_mesh()
    n = mesh.shape[RAY_AXIS]
    w, h = camera.width, camera.height
    R = w * h
    perm, inv = order
    cs = chunk_size
    quantum = n * cs
    pad = (-R) % quantum
    pix = perm if not pad else jnp.concatenate(
        [perm, jnp.broadcast_to(perm[-1:], (pad,))])
    Rp = R + pad
    per = Rp // n
    if seg_counts is not None:
        assert chunk_costs is not None, \
            "chunk-exact sharded frame needs chunk_costs for the deal"
        slot_of_chunk, per_shard_counts = deal_chunks_balanced(
            chunk_costs, tuple(seg_counts), n)
        chunk_at_slot = np.argsort(slot_of_chunk)
        pix_str = pix.reshape(-1, cs)[jnp.asarray(chunk_at_slot)] \
            .reshape(-1)
        slot_tab = jnp.asarray(slot_of_chunk)
        inv_str = slot_tab[inv // cs] * cs + inv % cs
        seg_counts = per_shard_counts
    else:
        # stride deal: shard s gets sorted chunks s, s+n, s+2n, ...
        pix_str = pix.reshape(-1, n, cs).transpose(1, 0, 2).reshape(-1)
        # a pixel at sorted rank r lands at flat position
        # ((r // cs) % n) * per + (r // (n * cs)) * cs + r % cs
        inv_str = ((inv // cs) % n) * per + (inv // (n * cs)) * cs \
            + inv % cs
        seg_counts = segment_chunks(per // chunk_size, tuple(segments))
    run = _fast_segmented_sharded_program(
        mesh, opt, seg_counts, chunk_size, w,
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map),
        skip_table is not None)
    transform = jnp.asarray(camera.transform)
    intr = jnp.asarray((camera.fx, camera.fy, camera.cx, camera.cy),
                       jnp.float32)
    rot_dirs = jnp.asarray(opt.rot_dirs, jnp.float32)
    args = (tree, leaf_map, pix_str, transform, intr, rot_dirs)
    if skip_table is not None:
        args += (skip_table,)
    out, seg_ov = run(*args)
    if sorted_output:
        return composite_background(out, opt), seg_ov, inv_str
    out = out.at[inv_str].get(unique_indices=True, mode="clip")
    img = composite_background(out, opt)
    return img.reshape(h, w, 4), seg_ov


def render_frame_sharded(tree: N3Tree, camera, opt: RenderOptions,
                         mesh: Optional[Mesh] = None,
                         track_visit: bool = False):
    """Full sharded frame: ray gen (replicated, cheap) -> sharded march ->
    gather -> background composite.  Returns [H, W, 4] f32."""
    if mesh is None:
        mesh = default_mesh()
    n_shards = mesh.shape[RAY_AXIS]
    w, h = camera.width, camera.height
    dirs, cen = screen2worlddir(w, h, camera.fx, camera.fy,
                                camera.cx, camera.cy,
                                jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    R = dirs.shape[0]
    pad = (-R) % n_shards
    if pad:
        dirs = jnp.concatenate(
            [dirs, jnp.tile(dirs[-1:], (pad, 1))], axis=0)
        vdirs = jnp.concatenate(
            [vdirs, jnp.tile(vdirs[-1:], (pad, 1))], axis=0)
    res = render_rays_sharded(tree, dirs, vdirs, cen, opt, mesh,
                              track_visit=track_visit)
    img = composite_background(res.out[:R], opt)
    return img.reshape(h, w, 4)
