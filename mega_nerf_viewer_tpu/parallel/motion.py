"""Sharded RE-HINT camera-motion rendering over the device mesh.

The single-chip motion analysis (PERFORMANCE.md round 4) showed a
moved pose decomposes into a quarter-resolution MEASUREMENT march, an
order rebuild from the measured keys, and the segmented march at
steady budgets (ops/accel._motion_core).  All three stages are
ray-local except one: a shard's full-resolution pixels take their
sort keys from neighboring quarter samples that may belong to OTHER
shards.  The sharded motion pose therefore runs exactly ONE data
collective — a ``psum`` union of the disjoint per-shard quarter-key
scatters ([H/2 * W/2] i32, ~2 MB at 1080p, riding ICI) — plus the
scalar per-segment overflow ``psum``.  Everything else (count march,
both sorts, segmented march, composite) is shard-local, so per-pose
device time divides by the mesh size like the steady sharded frame
(parallel/render.render_frame_fast_segmented_sharded).

Ray layout: full-resolution pixels and quarter pixels are
independently CHUNK-DEALT to shards from an episode-start steady
order (equal mix of cheap/expensive chunk classes per chip), and each
shard re-SORTS its own fixed pixel set by the fresh measured keys
every pose — the pixel->shard assignment changes only per episode,
the within-shard order every pose.  Budget segments are global static
tuples (SPMD: one program), derived with the same margin protocol as
the single-chip re-hint path.

The reference is strictly single-GPU (SURVEY §2); its per-pose
interactive loop is main.cpp:603-616.
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
from .mesh import RAY_AXIS, default_mesh

# sentinel pixel id for dealt padding rows: raygen clips it to a real
# ray (duplicate march, negligible), scatters drop it, and its sort
# key pins it into the last (top-budget) segment
_PAD = np.int32(1 << 30)
_PAD_KEY = np.int32(1 << 26)        # > any packed hint key (26 bits)


def _deal(perm: jax.Array, n: int, cs: int) -> jax.Array:
    """Chunk-deal a sorted pixel order to ``n`` shards at ``cs``
    granularity (shard s takes sorted chunks s, s+n, ...), padding
    with the _PAD sentinel.  Returns the flat [Rp] dealt layout (the
    concatenation of every shard's rows)."""
    R = perm.shape[0]
    quantum = n * cs
    pad = (-R) % quantum
    pix = perm if not pad else jnp.concatenate(
        [perm, jnp.full((pad,), _PAD, jnp.int32)])
    return pix.reshape(-1, n, cs).transpose(1, 0, 2).reshape(-1)


def motion_episode_layout(order: tuple, qperm: jax.Array,
                          mesh: Optional[Mesh] = None,
                          chunk_size: int = 2176,
                          hint_chunk: int = 2176) -> tuple:
    """Per-EPISODE shard layout for the motion loop.

    ``order`` is the steady (perm, inv) at the episode-start pose;
    ``qperm`` the steady quarter order (accel.quarter_order_from_packed).
    Both are chunk-dealt once — per-pose calls only re-sort within
    each shard.  Returns (pix_str [Rp], qpix_str [Qp]) device arrays
    (flat shard-major dealt layouts)."""
    if mesh is None:
        mesh = default_mesh()
    n = mesh.shape[RAY_AXIS]
    return (_deal(order[0], n, chunk_size),
            _deal(qperm, n, hint_chunk))


def _raygen(p, transform, intr, rot_dirs, width: int, R_full: int):
    """Shard-local raygen from pixel ids; _PAD sentinels clip to a
    real pixel (pad rows march a cheap duplicate ray; scatters and
    output maps drop them by id)."""
    from ..ops.rays import screen2worlddir_indices, rodrigues
    pc = jnp.minimum(p, jnp.int32(R_full - 1))
    dirs_p, cen = screen2worlddir_indices(
        pc, width, intr[0], intr[1], intr[2], intr[3], transform)
    return rodrigues(rot_dirs, dirs_p), dirs_p, cen


def _quarter_shard_body(tree, lm, qpix, transform, intr, rot_dirs,
                        skip, *, opt: RenderOptions, hint_chunk: int,
                        width: int, qw: int, qh: int):
    """Pass 1, shard-local: quarter-resolution count march + the
    shard's partial quarter-key image (disjoint scatter; the caller
    psums the partials into the full image).  Returns
    (qimg_partial [qh*qw] i32, qpix_next)."""
    from ..ops.accel import render_rays_fast, pack_hints
    Q = qpix.shape[0]
    qpad = (-Q) % hint_chunk
    qpix_p = qpix if not qpad else jnp.concatenate(
        [qpix, jnp.full((qpad,), _PAD, jnp.int32)])
    vq, dq, cen = _raygen(qpix_p, transform, intr, rot_dirs, width,
                          width * qh * 2)
    qres = render_rays_fast(
        tree, lm, dq, vq, cen, opt, max_dense=0,
        chunk_size=hint_chunk if qpix_p.shape[0] > hint_chunk else 0,
        skip_table=skip)
    qkey = pack_hints(qres.steps, qres.nrec, qres.skips)[:Q]
    qkey = jnp.where(qpix < _PAD, qkey, _PAD_KEY)
    # fresh shard-local quarter order for the NEXT pose's pass 1
    _, qpix_next = jax.lax.sort((qkey, qpix), num_keys=1,
                                is_stable=True)
    qy = qpix // width
    qx = qpix - qy * width
    qidx = jnp.where(qpix < _PAD, (qy >> 1) * qw + (qx >> 1), qw * qh)
    qimg = jnp.zeros((qw * qh + 1,), jnp.int32).at[qidx].set(
        qkey, mode="drop")[:qw * qh]
    return qimg, qpix_next


def _full_shard_body(tree, lm, qimg, pix, transform, intr, rot_dirs,
                     skip, *, opt: RenderOptions, seg_counts,
                     chunk_size: int, width: int, qw: int, qh: int):
    """Pass 2, shard-local: pool the (already psum-unioned) quarter
    image, sort the shard's own pixels by the pooled keys, and run
    the segmented march at steady budgets.  Returns (rows,
    seg_ov_local, pix_sorted, cdf)."""
    from ..ops.accel import render_rays_fast
    from ..ops.render import composite_background
    qimg = qimg.reshape(qh, qw)
    # forward 2x2 max (block pixels lie between forward samples)
    for ax in (0, 1):
        qimg = jnp.maximum(qimg, jnp.roll(qimg, -1, ax))
    # CDF parity with the single-chip core: each pooled cell covers 4
    # full-res pixels, so counts x4 with the trailing max unchanged
    qflat = qimg.reshape(-1)
    cdf = jnp.stack([jnp.sum(((qflat >> 18) <= c).astype(jnp.int32)) * 4
                     for c in (0, 1, 2, 4, 8)] + [jnp.max(qflat >> 18)])

    py = pix // width
    px = pix - py * width
    key_pix = jnp.where(
        pix < _PAD,
        qimg[jnp.minimum(py >> 1, qh - 1), jnp.minimum(px >> 1, qw - 1)],
        _PAD_KEY)
    _, pix_sorted = jax.lax.sort((key_pix, pix), num_keys=1,
                                 is_stable=True)

    v2, d2, cen2 = _raygen(pix_sorted, transform, intr, rot_dirs,
                           width, width * qh * 2)
    outs, ovs = [], []
    off = 0
    for c_chunks, md in seg_counts:
        if c_chunks == 0:
            ovs.append(jnp.zeros((), jnp.int32))
            continue
        m = c_chunks * chunk_size
        sl = slice(off, off + m)
        res = render_rays_fast(
            tree, lm, d2[sl], v2[sl], cen2, opt, max_dense=md,
            chunk_size=chunk_size if c_chunks > 1 else 0,
            skip_table=skip)
        outs.append(res.out)
        ovs.append(res.overflow)
        off += m
    rows = composite_background(jnp.concatenate(outs, 0), opt)
    return rows, jnp.stack(ovs), pix_sorted, cdf


def _pose_shard_body(tree, lm, qpix, pix, transform, intr, rot_dirs,
                     skip, *, opt: RenderOptions, seg_counts,
                     chunk_size: int, hint_chunk: int, width: int,
                     qw: int, qh: int, other_axes):
    """Per-shard motion pose: quarter body -> psum union -> full body
    (the benchmark projection times the two bodies standalone on one
    chip with the true full quarter image injected between them)."""
    qimg, qpix_next = _quarter_shard_body(
        tree, lm, qpix, transform, intr, rot_dirs, skip, opt=opt,
        hint_chunk=hint_chunk, width=width, qw=qw, qh=qh)
    if other_axes is not None:
        qimg = jax.lax.psum(qimg, RAY_AXIS)
    rows, seg_ov, pix_sorted, cdf = _full_shard_body(
        tree, lm, qimg, pix, transform, intr, rot_dirs, skip, opt=opt,
        seg_counts=seg_counts, chunk_size=chunk_size, width=width,
        qw=qw, qh=qh)
    if other_axes is not None:
        seg_ov = jax.lax.psum(seg_ov, RAY_AXIS)
        if other_axes:
            seg_ov = jax.lax.pmax(seg_ov, other_axes)
    return rows, seg_ov, pix_sorted, qpix_next, cdf


@functools.lru_cache(maxsize=32)
def _motion_sharded_program(mesh: Mesh, opt: RenderOptions, seg_counts,
                            chunk_size: int, hint_chunk: int,
                            width: int, qw: int, qh: int,
                            tree_treedef, lm_treedef, has_skip: bool):
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)
    skip_spec = (P(),) if has_skip else ()
    other = tuple(n for n in mesh.axis_names if n != RAY_AXIS)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, P(RAY_AXIS), P(RAY_AXIS),
                  P(), P(), P()) + skip_spec,
        out_specs=(P(RAY_AXIS), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        check_vma=False)
    def _run(tree, lm, qpix, pix, transform, intr, rot_dirs, *skip):
        return _pose_shard_body(
            tree, lm, qpix, pix, transform, intr, rot_dirs,
            skip[0] if skip else None, opt=opt, seg_counts=seg_counts,
            chunk_size=chunk_size, hint_chunk=hint_chunk, width=width,
            qw=qw, qh=qh, other_axes=other)

    return _run


def render_frame_motion_sharded(
        tree: N3Tree, leaf_map, camera, opt: RenderOptions,
        qpix_str: jax.Array, pix_str: jax.Array, segments,
        mesh: Optional[Mesh] = None, chunk_size: int = 2176,
        hint_chunk: int = 2176,
        skip_table: Optional[jax.Array] = None,
        sorted_output: bool = False):
    """One sharded re-hint motion pose.

    ``pix_str`` / ``qpix_str`` come from :func:`motion_episode_layout`
    (full and quarter pixel deals); pass the returned ``qpix_next`` as
    the next pose's ``qpix_str`` (it stays dealt — each shard re-sorts
    only its own rows).  ``segments`` should be a margin-1
    ``segments_from_hint_cdf`` derivation, refreshed asynchronously
    from the returned ``cdf`` exactly like the single-chip path.

    Returns (img [H, W, 4] — or, when ``sorted_output``, flat rows
    [Rp, 4] in shard-dealt sorted order plus the pixel-id map
    ``pix_sorted`` [Rp] for the consumer-side remap — seg_overflow
    i32 [n_segments] TOTAL counts, qpix_next, cdf [6]).
    """
    if mesh is None:
        mesh = default_mesh()
    n = mesh.shape[RAY_AXIS]
    w, h = camera.width, camera.height
    R = w * h
    if w % 2 or h % 2:
        raise ValueError("sharded motion needs even frame dimensions")
    from ..ops.accel import segment_chunks
    per = pix_str.shape[0] // n
    seg_counts = segment_chunks(per // chunk_size, tuple(segments))
    run = _motion_sharded_program(
        mesh, opt, seg_counts, chunk_size, hint_chunk, w,
        w // 2, h // 2,
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map),
        skip_table is not None)
    transform = jnp.asarray(camera.transform)
    intr = jnp.asarray((camera.fx, camera.fy, camera.cx, camera.cy),
                       jnp.float32)
    rot_dirs = jnp.asarray(opt.rot_dirs, jnp.float32)
    args = (tree, leaf_map, qpix_str, pix_str, transform, intr,
            rot_dirs)
    if skip_table is not None:
        args += (skip_table,)
    rows, seg_ov, pix_sorted, qpix_next, cdf = run(*args)
    if sorted_output:
        return rows, pix_sorted, seg_ov, qpix_next, cdf
    img = jnp.zeros((R + 1, 4), jnp.float32).at[
        jnp.minimum(pix_sorted, R)].set(rows, mode="drop")[:R]
    return img.reshape(h, w, 4), seg_ov, qpix_next, cdf