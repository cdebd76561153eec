"""Dynamic octree refinement: split, resample, prune.

TPU-native, functional re-design of the reference's in-place tree surgery
(``src/renderer/cuda_renderer.cpp:205-381`` + the tree-edit kernels in
``src/cuda/renderer_kernel.cu:63-213``):

  * ``expand_voxels`` — aggregate per-ray split votes, take the
    most-voted leaves, allocate one child chunk per leaf at the array
    tail, fill child SH data with the mean of ``samples_per_corner``
    MLP evaluations (reference ``expand_voxels`` cuda_renderer.cpp:205-278,
    ``add_children_and_generate_samples_kernel`` renderer_kernel.cu:170-198).
  * ``get_more_samples`` — draw extra MLP samples for under-sampled
    leaves and fold them in with an incremental mean
    (reference cuda_renderer.cpp:280-341).
  * ``prune_tree`` — delete never-visited chunks, cumsum-shift indices,
    rewire parent/child links, compact by gather
    (reference cuda_renderer.cpp:343-381,
    ``adjust_parents_and_children_kernel`` renderer_kernel.cu:63-86).

All device work has static shapes (votes padded to ``split_batch_size``
with validity masks, compaction as a full-array permutation gather);
the top-k vote aggregation runs host-side exactly where the reference
also syncs to host (``.item()`` at cuda_renderer.cpp:182/219/347).

Known divergences from the reference (both are reference bugs, fixed here,
preserved in docstring for the record):
  * the reference does NOT compact ``sample_counts`` during prune
    (cuda_renderer.cpp:360-375 copies only data/child/parent), leaving
    counts misaligned; we compact it.
  * the reference's resampling path allocates rand tensors without the
    viewdir/appearance columns that ``generate_samples_inner`` writes
    (cuda_renderer.cpp:301 vs renderer_kernel.cu:136-152 — an OOB write);
    we allocate the full width.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..options import RenderOptions
from ..n3tree.tree import N3Tree

MAX_WALK_LEVELS = 24


# ----------------------------------------------------------------------
# Vote aggregation (host; mirrors the torch host ops in expand_voxels)
# ----------------------------------------------------------------------
def aggregate_split_votes(split_vote: np.ndarray,
                          split_batch_size: int) -> np.ndarray:
    """Top split candidates from per-ray votes.

    Reference (cuda_renderer.cpp:206-226): filter valid (chunk >= 0),
    unique rows + counts, keep count > 1, lexicographic sort on
    [-count, priority, chunk, child] ascending, take the head.
    Returns int32 [K, 2] = (chunk, child), K <= split_batch_size.
    """
    votes = np.asarray(split_vote)
    votes = votes[votes[:, 1] >= 0]
    if len(votes) == 0:
        return np.zeros((0, 2), np.int32)
    uniq, counts = np.unique(votes, axis=0, return_counts=True)
    keep = counts > 1
    uniq, counts = uniq[keep], counts[keep]
    if len(uniq) == 0:
        return np.zeros((0, 2), np.int32)
    rows = np.concatenate([-counts[:, None].astype(np.float32), uniq],
                          axis=1)
    order = np.lexsort(tuple(rows[:, c] for c in range(rows.shape[1] - 1,
                                                       -1, -1)))
    rows = rows[order][:split_batch_size]
    return rows[:, 2:4].astype(np.int32)


def aggregate_sample_votes(sample_vote: np.ndarray,
                           split_batch_size: int) -> np.ndarray:
    """Top resample candidates: lowest sample-count first
    (reference cuda_renderer.cpp:281-294, unique_dim ascending sort)."""
    votes = np.asarray(sample_vote)
    votes = votes[votes[:, 1] >= 0]
    if len(votes) == 0:
        return np.zeros((0, 2), np.int32)
    uniq = np.unique(votes, axis=0)
    return uniq[:split_batch_size, 1:3].astype(np.int32)


# ----------------------------------------------------------------------
# Voxel AABB reconstruction (parent walk)
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("N", "max_levels"))
def node_corners(child_parent: jax.Array, chunk: jax.Array,
                 cidx: jax.Array, N: int,
                 max_levels: int = MAX_WALK_LEVELS):
    """Tree-coords corner + depth of leaf voxels via parent walk.

    Vectorized analogue of ``generate_samples_inner``'s digit peel
    (renderer_kernel.cu:99-123): starting from packed ``chunk*N^3+cidx``,
    repeatedly peel 3 base-N digits, fold into the corner, and hop to
    ``parent[chunk]``.  Returns (corner [K,3] in [0,1], depth [K]) where
    the voxel side is ``N**-(depth+1)``.
    """
    N3 = N ** 3
    packed = chunk * N3 + cidx

    def body(l, c):
        packed, corner, depth, done = c
        cur_chunk = packed // N3
        rem = packed % N3
        k = rem % N
        j = (rem // N) % N
        i = rem // (N * N)
        digits = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
        new_corner = (corner + digits) / N
        corner = jnp.where(done[:, None], corner, new_corner)
        at_root = cur_chunk == 0
        new_packed = jnp.take(child_parent, cur_chunk, mode="clip")
        packed = jnp.where(done | at_root, packed, new_packed)
        depth = jnp.where(done | at_root, depth, depth + 1)
        done = done | at_root
        return (packed, corner, depth, done)

    K = chunk.shape[0]
    init = (packed, jnp.zeros((K, 3), jnp.float32),
            jnp.zeros((K,), jnp.int32), jnp.zeros((K,), bool))
    _, corner, depth, _ = jax.lax.fori_loop(0, max_levels, body, init)
    return corner, depth


def _make_samples(tree: N3Tree, model, opt: RenderOptions,
                  chunk: jax.Array, cidx: jax.Array,
                  key: jax.Array) -> Tuple[jax.Array, np.ndarray]:
    """Random MLP input samples inside the given leaf voxels.

    Mirrors ``generate_samples_inner`` (renderer_kernel.cu:88-168):
    uniform randoms scaled into each voxel's world AABB, default top-down
    viewdir (1,0,0), optional appearance id, cluster ids from world (y,z).
    Returns (samples [K, spc, dim] f32, cluster_ids [K, spc] i16).
    """
    spc = opt.samples_per_corner
    K = chunk.shape[0]
    corner, depth = node_corners(tree.parent, chunk, cidx, tree.N)
    length_local = jnp.power(
        jnp.float32(tree.N), -(depth.astype(jnp.float32) + 1.0))
    corner_world = (corner - tree.offset[None, :]) / tree.scale[None, :]
    rnd = jax.random.uniform(key, (K, spc, 3), jnp.float32)
    xyz = (rnd * (length_local[:, None, None] / tree.scale[None, None, :])
           + corner_world[:, None, :])
    cols = [xyz]
    if opt.need_viewdir:
        vd = jnp.zeros((K, spc, 3), jnp.float32).at[..., 0].set(1.0)
        cols.append(vd)
    if opt.appearance_embedding != -1:
        cols.append(jnp.full((K, spc, 1), opt.appearance_embedding,
                             jnp.float32))
    samples = jnp.concatenate(cols, axis=-1)
    cluster_ids = model.cluster_ids_device(xyz[..., 1:3])
    return samples, cluster_ids


# ----------------------------------------------------------------------
# Expand (split)
# ----------------------------------------------------------------------
def expand_voxels(tree: N3Tree, model, opt: RenderOptions,
                  split_vote, visit_tracker: jax.Array,
                  key: Optional[jax.Array] = None,
                  verbose: bool = False):
    """Split the most-voted leaves (reference cuda_renderer.cpp:205-278).

    Returns (tree, visit_tracker, n_added).  n_added == 0 signals the
    caller to fall back to :func:`get_more_samples` (the reference does
    the same at cuda_renderer.cpp:221-224).
    """
    if key is None:
        key = jax.random.PRNGKey(42)
    to_split = aggregate_split_votes(np.asarray(split_vote),
                                     opt.split_batch_size)
    if verbose:
        print(f"Split candidates: {len(to_split)}")
    if len(to_split) == 0:
        return tree, visit_tracker, 0

    cap = int(tree.capacity)
    if cap + len(to_split) > tree.max_capacity:
        if verbose:
            print("Full")
        return tree, visit_tracker, 0

    N3 = tree.N3
    pc = jnp.asarray(to_split[:, 0], jnp.int32)          # parent chunk
    pcc = jnp.asarray(to_split[:, 1], jnp.int32)         # parent child slot
    K = len(to_split)
    abs_chunk = cap + jnp.arange(K, dtype=jnp.int32)

    # samples inside each NEW child voxel: expand (abs_chunk, all slots)
    # NOTE: the child voxel corner = parent-leaf corner + slot offset; we
    # compute it directly from the parent walk rather than linking first.
    corner_p, depth_p = node_corners(tree.parent, pc, pcc, tree.N)
    child_side = jnp.power(
        jnp.float32(tree.N), -(depth_p.astype(jnp.float32) + 2.0))  # [K]
    slots = jnp.arange(N3, dtype=jnp.int32)
    di = (slots // (tree.N * tree.N)).astype(jnp.float32)
    dj = ((slots // tree.N) % tree.N).astype(jnp.float32)
    dk = (slots % tree.N).astype(jnp.float32)
    slot_off = jnp.stack([di, dj, dk], axis=-1)           # [N3, 3]
    corner_c = (corner_p[:, None, :]
                + slot_off[None, :, :] * child_side[:, None, None])
    corner_c = corner_c.reshape(K * N3, 3)
    corner_world = (corner_c - tree.offset[None, :]) / tree.scale[None, :]

    spc = opt.samples_per_corner
    rnd = jax.random.uniform(key, (K * N3, spc, 3), jnp.float32)
    side_rep = jnp.repeat(child_side, N3)
    xyz = (rnd * (side_rep[:, None, None] / tree.scale[None, None, :])
           + corner_world[:, None, :])
    cols = [xyz]
    if opt.need_viewdir:
        cols.append(jnp.zeros_like(xyz).at[..., 0].set(1.0))
    if opt.appearance_embedding != -1:
        cols.append(jnp.full(xyz.shape[:2] + (1,), opt.appearance_embedding,
                             jnp.float32))
    samples = jnp.concatenate(cols, axis=-1)
    cluster_ids = model.cluster_ids_device(xyz[..., 1:3])

    # grouped-matmul dispatch: one device program for all clusters
    # (replaces the reference's per-cluster chunked host loop,
    # cuda_renderer.cpp:165-203)
    results = model.query_device(cluster_ids.reshape(-1),
                                 samples.reshape(K * N3 * spc, -1))
    results = results.reshape(K * N3, spc, -1)
    new_data = jnp.mean(results[..., :tree.data_dim], axis=1)   # [K*N3, D]

    # Link + write (add_children_and_generate_samples_kernel semantics)
    child = tree.child.at[pc, pcc].set(abs_chunk - pc)
    parent = tree.parent.at[abs_chunk].set(pc * N3 + pcc)
    visit_tracker = visit_tracker.at[abs_chunk].set(
        jnp.take(visit_tracker, pc))
    data = jax.lax.dynamic_update_slice(
        tree.data, new_data.reshape(K, N3, tree.data_dim).astype(
            jnp.float16), (cap, 0, 0))
    sample_counts = jax.lax.dynamic_update_slice(
        tree.sample_counts,
        jnp.full((K, N3), spc, jnp.int16), (cap, 0))

    new_tree = N3Tree(
        data=data, child=child, parent=parent, sample_counts=sample_counts,
        scale=tree.scale, offset=tree.offset,
        capacity=jnp.asarray(cap + K, jnp.int32),
        N=tree.N, data_dim=tree.data_dim, data_format=tree.data_format)
    if verbose:
        print(f"Added: {K}, total size: {cap + K}")
    return new_tree, visit_tracker, K


# ----------------------------------------------------------------------
# Resample
# ----------------------------------------------------------------------
def get_more_samples(tree: N3Tree, model, opt: RenderOptions,
                     sample_vote, key: Optional[jax.Array] = None,
                     verbose: bool = False) -> N3Tree:
    """Extra MLP samples for under-sampled leaves, incremental mean update
    (reference cuda_renderer.cpp:280-341)."""
    if key is None:
        key = jax.random.PRNGKey(43)
    to_sample = aggregate_sample_votes(np.asarray(sample_vote),
                                       opt.split_batch_size)
    if verbose:
        print(f"Sample candidates: {len(to_sample)}")
    if len(to_sample) == 0:
        return tree

    chunk = jnp.asarray(to_sample[:, 0], jnp.int32)
    cidx = jnp.asarray(to_sample[:, 1], jnp.int32)
    spc = opt.samples_per_corner
    K = len(to_sample)
    samples, cluster_ids = _make_samples(tree, model, opt, chunk, cidx, key)
    results = model.query_device(cluster_ids.reshape(-1),
                                 samples.reshape(K * spc, -1))
    results = results.reshape(K, spc, -1)
    new_sum = jnp.sum(results[..., :tree.data_dim], axis=1)     # [K, D]

    node = chunk * tree.N3 + cidx
    data_flat = tree.data.reshape(-1, tree.data_dim)
    counts_flat = tree.sample_counts.reshape(-1)
    old = jnp.take(data_flat, node, axis=0).astype(jnp.float32)
    old_counts = jnp.take(counts_flat, node).astype(jnp.float32)
    new_counts = old_counts + spc
    # new mean = old + (sum_new - spc*old) / new_count, computed in f32
    # and written with ONE f16 rounding (a scatter-ADD of an f16 delta
    # would accumulate in f16 arithmetic — the f16-storage/f32-accumulate
    # contract requires the arithmetic to stay f32)
    new_mean = old + (new_sum - spc * old) / new_counts[:, None]
    data_flat = data_flat.at[node].set(
        new_mean.astype(jnp.float16), unique_indices=True)
    counts_flat = counts_flat.at[node].add(jnp.int16(spc))

    return N3Tree(
        data=data_flat.reshape(tree.data.shape),
        child=tree.child, parent=tree.parent,
        sample_counts=counts_flat.reshape(tree.sample_counts.shape),
        scale=tree.scale, offset=tree.offset, capacity=tree.capacity,
        N=tree.N, data_dim=tree.data_dim, data_format=tree.data_format)


# ----------------------------------------------------------------------
# Prune
# ----------------------------------------------------------------------
def prune_tree(tree: N3Tree, visit_tracker: jax.Array,
               verbose: bool = False):
    """Delete never-visited chunks and compact
    (reference cuda_renderer.cpp:343-381).

    Returns (tree, visit_tracker).  The visit tracker is reset to zeros
    (root stays 1) either way, matching cuda_renderer.cpp:351/379.
    """
    cap = int(tree.capacity)
    max_cap = tree.max_capacity
    visited = np.asarray(visit_tracker)[:cap]
    to_delete = visited == 0
    num_to_delete = int(to_delete.sum())
    if verbose:
        print("Pruning")
    fresh_tracker = jnp.zeros((max_cap,), jnp.int32).at[0].set(1)
    if num_to_delete == 0:
        if verbose:
            print("Nothing can be pruned")
        return tree, fresh_tracker

    new_tree = _prune_compact(tree, jnp.asarray(to_delete), cap)
    if verbose:
        print(f"Pruning finished - reclaimed: {num_to_delete}")
    return new_tree, fresh_tracker


@functools.partial(jax.jit, static_argnames=("cap",))
def _prune_compact(tree: N3Tree, to_delete: jax.Array, cap: int) -> N3Tree:
    """Rewire + compaction as pure gathers/scatters.

    Rewiring follows ``adjust_parents_and_children_kernel``
    (renderer_kernel.cu:63-86): for a deleted chunk, zero its incoming
    pointer at the parent; for a kept chunk c with parent p, the stored
    relative offset changes by ``shifts[p] - shifts[c]`` and the packed
    parent index drops by ``shifts[p] * N^3``.
    """
    N3 = tree.N3
    shifts = jnp.cumsum(to_delete.astype(jnp.int32))      # [cap]
    chunks = jnp.arange(cap, dtype=jnp.int32)
    parent = tree.parent[:cap]
    pc = parent // N3
    pcc = parent % N3

    child = tree.child
    # deleted chunks orphan their subtree root pointer (skip chunk 0: its
    # parent entry is the self-referential packed 0)
    del_mask = to_delete & (chunks > 0)
    child = child.at[jnp.where(del_mask, pc, tree.max_capacity),
                     pcc].set(0, mode="drop")
    keep_mask = (~to_delete) & (chunks > 0)
    adjust = jnp.take(shifts, pc) - shifts
    child = child.at[jnp.where(keep_mask, pc, tree.max_capacity),
                     pcc].add(jnp.where(keep_mask, adjust, 0), mode="drop")
    new_parent = tree.parent.at[:cap].add(
        jnp.where(keep_mask, -jnp.take(shifts, pc) * N3, 0))

    # compaction permutation: kept rows (in order) first
    key = jnp.where(jnp.arange(tree.max_capacity) < cap,
                    jnp.pad(to_delete.astype(jnp.int32), (0, tree.max_capacity - cap)),
                    2)
    perm = jnp.argsort(key, stable=True)
    n_keep = cap - jnp.sum(to_delete.astype(jnp.int32))
    live = jnp.arange(tree.max_capacity) < n_keep

    def take_rows(a):
        out = jnp.take(a, perm, axis=0)
        mask_shape = (tree.max_capacity,) + (1,) * (a.ndim - 1)
        return jnp.where(live.reshape(mask_shape), out,
                         jnp.zeros_like(out))

    return N3Tree(
        data=take_rows(tree.data),
        child=take_rows(child),
        parent=take_rows(new_parent),
        sample_counts=take_rows(tree.sample_counts),
        scale=tree.scale, offset=tree.offset,
        capacity=n_keep.astype(jnp.int32),
        N=tree.N, data_dim=tree.data_dim, data_format=tree.data_format)


# ----------------------------------------------------------------------
# Fully-jittable refinement (no host syncs) — TPU-native fast path
# ----------------------------------------------------------------------
def aggregate_split_votes_device(split_vote: jax.Array, N3: int,
                                 K: int):
    """Device-side top-K split-vote aggregation (jittable).

    Same policy as :func:`aggregate_split_votes` (count > 1, most-voted
    first, shallowest depth as tiebreak) expressed as fixed-size ops:
    ``jnp.unique(size=...)`` + two stable argsorts (lexicographic).
    Returns (nodes i32 [K] packed chunk*N3+child, priority f32 [K],
    valid bool [K]) with valid entries compacted to the front.
    """
    valid_in = split_vote[:, 1] >= 0
    packed = (split_vote[:, 1].astype(jnp.int32) * N3
              + split_vote[:, 2].astype(jnp.int32))
    packed = jnp.where(valid_in, packed, -1)
    Rn = packed.shape[0]
    # ONE sort + neighbor shifts replace the former
    # jnp.unique(size=R) + searchsorted(sort, uniq): split_vote is
    # frame-sized, and searchsorted lowers to ~log2(R) chained gathers
    # (347 ms at 2M rows on v5e, PERFORMANCE.md fact 2 / guided.py's
    # ray_of_p treatment).  Each unique node is represented at its
    # FIRST position in the sorted array; its vote count is the run
    # length (next start index - start index, one forward and one
    # reverse cumulative scan).
    order_rays = jnp.argsort(packed, stable=True)
    sp = jnp.take(packed, order_rays)
    pos = jnp.arange(Rn, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    start_or_big = jnp.where(is_start, pos, jnp.int32(Rn))
    from_right = jnp.flip(jax.lax.cummin(jnp.flip(start_or_big)))
    next_start = jnp.concatenate(
        [from_right[1:], jnp.full((1,), Rn, jnp.int32)])
    counts = next_start - pos                  # run length at starts
    # priority (= depth) of each node: its first voting ray in sorted
    # order (any voter works; the policy only sorts by depth)
    prio = jnp.take(split_vote[:, 0], order_rays)
    keep = is_start & (sp >= 0) & (counts > 1)
    # lexicographic (-count, priority): stable argsort by priority,
    # then by -count; invalid rows pushed last via +inf count key.
    # Ties resolve by sorted position = ascending node id, exactly as
    # the unique-based form did (jnp.unique returns ascending ids).
    neg_count = jnp.where(keep, -counts, jnp.iinfo(jnp.int32).max)
    i1 = jnp.argsort(prio, stable=True)
    i2 = jnp.argsort(jnp.take(neg_count, i1), stable=True)
    order = jnp.take(i1, i2)[:K]
    return (jnp.take(sp, order), jnp.take(prio, order),
            jnp.take(keep, order))


@functools.partial(jax.jit, static_argnames=("opt", "mlp_apply"))
def expand_voxels_jit(tree: N3Tree, params, grid_dim, min_position,
                      pos_range, opt: RenderOptions,
                      split_vote: jax.Array, visit_tracker: jax.Array,
                      key: jax.Array, mlp_apply=None):
    """Jittable expand: everything (vote top-K, child allocation, MLP
    fill) stays on device with static shapes — the TPU-native fast path
    the host-orchestrated :func:`expand_voxels` mirrors.

    ``mlp_apply(params, cluster_ids, x) -> [n, out_dim]`` defaults to the
    dense all-clusters forward; under shard_map pass the tensor-parallel
    variant.  Returns (tree, visit_tracker, n_added i32 scalar).
    """
    from ..models.meganerf import mlp_forward_all
    if mlp_apply is None:
        mlp_apply = mlp_forward_all

    N3 = tree.N3
    K = opt.split_batch_size
    nodes, prio, valid = aggregate_split_votes_device(split_vote, N3, K)
    n_new = jnp.sum(valid.astype(jnp.int32))
    cap = tree.capacity.astype(jnp.int32)
    # wholesale abort when over capacity (reference "Full",
    # cuda_renderer.cpp:228-231)
    fits = (cap + n_new) <= tree.max_capacity
    valid = valid & fits
    n_new = jnp.where(fits, n_new, 0)

    pc = jnp.clip(nodes // N3, 0, tree.max_capacity - 1)
    pcc = jnp.clip(nodes % N3, 0, N3 - 1)
    abs_chunk = cap + jnp.arange(K, dtype=jnp.int32)   # valid compacted
    drop = jnp.where(valid, abs_chunk, tree.max_capacity)

    corner_p, depth_p = node_corners(tree.parent, pc, pcc, tree.N)
    child_side = jnp.power(
        jnp.float32(tree.N), -(depth_p.astype(jnp.float32) + 2.0))
    slots = jnp.arange(N3, dtype=jnp.int32)
    slot_off = jnp.stack(
        [(slots // (tree.N * tree.N)).astype(jnp.float32),
         ((slots // tree.N) % tree.N).astype(jnp.float32),
         (slots % tree.N).astype(jnp.float32)], axis=-1)
    corner_c = (corner_p[:, None, :]
                + slot_off[None, :, :] * child_side[:, None, None])
    corner_world = ((corner_c - tree.offset[None, None, :])
                    / tree.scale[None, None, :])          # [K, N3, 3]

    spc = opt.samples_per_corner
    rnd = jax.random.uniform(key, (K, N3, spc, 3), jnp.float32)
    xyz = (rnd * (child_side[:, None, None, None]
                  / tree.scale[None, None, None, :])
           + corner_world[:, :, None, :])
    cols = [xyz]
    if opt.need_viewdir:
        cols.append(jnp.zeros_like(xyz).at[..., 0].set(1.0))
    if opt.appearance_embedding != -1:
        cols.append(jnp.full(xyz.shape[:-1] + (1,),
                             opt.appearance_embedding, jnp.float32))
    samples = jnp.concatenate(cols, axis=-1).reshape(K * N3 * spc, -1)

    from ..models.meganerf import cluster_ids_from_yz
    flat_xyz = xyz.reshape(K * N3 * spc, 3)
    cluster_ids = cluster_ids_from_yz(flat_xyz[:, 1], flat_xyz[:, 2],
                                      grid_dim, min_position, pos_range)

    results = mlp_apply(params, cluster_ids, samples)
    new_data = jnp.mean(
        results[:, :tree.data_dim].reshape(K, N3, spc, tree.data_dim),
        axis=2)

    child = tree.child.at[
        jnp.where(valid, pc, tree.max_capacity), pcc].set(
            abs_chunk - pc, mode="drop")
    parent = tree.parent.at[drop].set(pc * N3 + pcc, mode="drop")
    visit_tracker = visit_tracker.at[drop].set(
        jnp.take(visit_tracker, pc), mode="drop")
    data = tree.data.at[drop].set(new_data.astype(jnp.float16),
                                  mode="drop")
    sample_counts = tree.sample_counts.at[drop].set(
        jnp.full((K, N3), spc, jnp.int16), mode="drop")
    # new chunks are all-leaf
    child = child.at[drop].set(jnp.zeros((K, N3), jnp.int32), mode="drop")

    new_tree = N3Tree(
        data=data, child=child, parent=parent, sample_counts=sample_counts,
        scale=tree.scale, offset=tree.offset,
        capacity=cap + n_new,
        N=tree.N, data_dim=tree.data_dim, data_format=tree.data_format)
    return new_tree, visit_tracker, n_new
