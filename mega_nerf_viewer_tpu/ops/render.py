"""Vectorized TPU-native octree volume renderer.

The production render path: the reference's one-CUDA-thread-per-pixel march
(``include/cuda/rt_core.cuh:162-332``, ``src/cuda/renderer_kernel.cu:243-292``)
re-designed as a ray-batched, step-synchronized march under ``jax.jit``:

  * All rays advance together inside one ``lax.while_loop``; per-ray early
    termination becomes an ``active`` mask (TPU has no per-lane exit).
  * The octree descent (``query_single_from_root``) is a bounded
    ``while_loop`` of vectorized flat gathers over ``child`` — one gather
    of [R] int32 per level instead of a per-thread pointer chase.
  * SH evaluation is a per-ray basis (computed once) dotted against the
    gathered leaf coefficients — a [R, basis_dim] x [R, 3, basis_dim]
    contraction fused by XLA into the compositing elementwise work.
  * Storage f16, accumulation f32, matching the reference (CUDA loads
    half data into float registers) — NOT bf16, per the 1e-3 parity target.

Outputs match ``render_voxels`` exactly: RGBA image plus per-ray split and
sample votes ([priority, chunk, child], -1-filled when absent) and an
optional visit-marking pass (``atomicCAS`` -> masked scatter-max).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from .sh import masked_sh_basis
from .rays import screen2worlddir, rodrigues

# Max octree levels a single descent will walk.  The reference's descent is
# unbounded; practical PlenOctrees are < 20 levels deep and the GUI caps
# split depth at 31 (main.cpp:244).
DEFAULT_MAX_LEVELS = 20


class RenderResult(NamedTuple):
    out: jax.Array          # [R, 4] f32 rgba (pre-background)
    split_vote: jax.Array   # [R, 3] f32 [priority, chunk, child]
    sample_vote: jax.Array  # [R, 3] f32
    visited: jax.Array      # [max_capacity] i32 visit marks (or zeros)


def _descend(child_flat: jax.Array, xyz: jax.Array, N: int,
             max_levels: int, visited: jax.Array, track_visit: bool):
    """Vectorized octree descent (reference rt_core.cuh:117-159).

    Args:
      child_flat: i32 [C*N^3] relative child offsets (0 = leaf).
      xyz: f32 [R, 3] tree-coords positions.
    Returns (frac_xyz [R,3], chunk [R], child_idx [R], depth [R], visited).
    """
    N3 = N ** 3
    R = xyz.shape[0]
    xyz = jnp.clip(xyz, 0.0, jnp.float32(1.0 - 1e-6))
    chunk = jnp.zeros((R,), jnp.int32)
    cidx = jnp.zeros((R,), jnp.int32)
    depth = jnp.ones((R,), jnp.int32)
    done = jnp.zeros((R,), bool)

    def cond(c):
        l, xyz, chunk, cidx, depth, done, visited = c
        return (l < max_levels) & ~jnp.all(done)

    def body(c):
        l, xyz, chunk, cidx, depth, done, visited = c
        upd = ~done
        if track_visit:
            visited = visited.at[chunk].max(upd.astype(jnp.int32),
                                            mode="drop")
        u = xyz * N
        digits = jnp.floor(u)
        idx = (digits[:, 0] * (N * N) + digits[:, 1] * N
               + digits[:, 2]).astype(jnp.int32)
        skip = jnp.take(child_flat, chunk * N3 + idx, mode="clip")
        leaf = skip == 0
        xyz = jnp.where(upd[:, None], u - digits, xyz)
        cidx = jnp.where(upd, idx, cidx)
        chunk = jnp.where(upd & ~leaf, chunk + skip, chunk)
        depth = jnp.where(upd & ~leaf, depth + 1, depth)
        done = done | leaf
        return (l + 1, xyz, chunk, cidx, depth, done, visited)

    c = jax.lax.while_loop(
        cond, body, (jnp.int32(0), xyz, chunk, cidx, depth, done, visited))
    _, xyz, chunk, cidx, depth, done, visited = c
    return xyz, chunk, cidx, depth, visited


def _dda_world_batch(cen, invdir, bbox):
    """Batched bbox clip (reference rt_core.cuh:71-86). cen [3], invdir [R,3]."""
    lo = jnp.asarray(bbox[:3], jnp.float32) + jnp.float32(1e-6)
    hi = jnp.asarray(bbox[3:], jnp.float32) - jnp.float32(1e-6)
    t1 = (lo[None, :] - cen[None, :]) * invdir
    t2 = (hi[None, :] - cen[None, :]) * invdir
    tmin = jnp.maximum(jnp.float32(0.0),
                       jnp.max(jnp.minimum(t1, t2), axis=-1))
    tmax = jnp.minimum(jnp.float32(1e4),
                       jnp.min(jnp.maximum(t1, t2), axis=-1))
    return tmin, tmax


def _dda_unit_batch(pos, invdir):
    """Batched unit-cube exit distance (reference rt_core.cuh:89-100)."""
    t1 = -pos * invdir
    t2 = t1 + invdir
    return jnp.minimum(jnp.float32(1e4),
                       jnp.min(jnp.maximum(t1, t2), axis=-1))


@functools.partial(
    jax.jit,
    static_argnames=("opt", "track_visit", "max_levels", "max_iters"))
def render_rays(tree: N3Tree,
                dirs: jax.Array,
                vdirs: jax.Array,
                cen_world: jax.Array,
                opt: RenderOptions,
                tmax_bg: Optional[jax.Array] = None,
                track_visit: bool = False,
                max_levels: int = DEFAULT_MAX_LEVELS,
                max_iters: int = 0) -> RenderResult:
    """March a batch of rays through the tree.

    Args:
      dirs: [R, 3] unit world ray directions.
      vdirs: [R, 3] view dirs for SH (post-Rodrigues).
      cen_world: [3] world camera center.
      tmax_bg: optional [R] background depth to composite against
        (the mesh-depth surface read in renderer_kernel.cu:277-280);
        None = offscreen (1e9).
      track_visit: mark visited chunks (rt_core.cuh:133 atomicCAS).
      max_iters: cap on march iterations; 0 = no cap (loop runs until all
        rays finish, like the reference's while(t < tmax)).
    """
    N, N3 = tree.N, tree.N3
    R = dirs.shape[0]
    data_dim = tree.data_dim
    basis_dim = tree.data_format.basis_dim
    use_sh = tree.data_format.format == "SH" and basis_dim >= 1

    child_flat = tree.child.reshape(-1)
    data_flat = tree.data.reshape(-1, data_dim)
    counts_flat = tree.sample_counts.reshape(-1)

    # world -> tree (renderer_kernel.cu:273-275; rt_core.cuh:182-192)
    cen = tree.offset + tree.scale * cen_world
    d = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)          # [R]
    d = d * delta_scale[:, None]
    if tmax_bg is None:
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)
    tmax_bg = tmax_bg / delta_scale
    invdir = 1.0 / (d + jnp.float32(1e-9))
    tmin, tmax = _dda_world_batch(cen, invdir, opt.render_bbox)
    tmax = jnp.minimum(tmax, tmax_bg)
    miss = (tmax < 0) | (tmin > tmax)

    if use_sh:
        basis = masked_sh_basis(basis_dim, vdirs,
                                opt.basis_minmax[0],
                                opt.basis_minmax[1])          # [R, B]
    else:
        basis = None

    out = jnp.zeros((R, 4), jnp.float32)
    split_vote = jnp.concatenate(
        [jnp.full((R, 1), opt.max_depth + 1, jnp.float32),
         jnp.full((R, 2), -1.0, jnp.float32)], axis=1)
    sample_vote = jnp.concatenate(
        [jnp.full((R, 1), opt.max_sample_count + 1, jnp.float32),
         jnp.full((R, 2), -1.0, jnp.float32)], axis=1)
    visited = jnp.zeros((tree.max_capacity,), jnp.int32)
    if track_visit:
        visited = visited.at[0].set(1)  # root, set in renderer set() path

    t = tmin
    T = jnp.ones((R,), jnp.float32)
    max_w = jnp.full((R,), -1.0, jnp.float32)
    max_sw = jnp.full((R,), -1.0, jnp.float32)
    stopped = jnp.zeros((R,), bool)
    active = ~miss & (t < tmax)

    carry0 = (jnp.int32(0), t, T, out, max_w, max_sw,
              split_vote, sample_vote, stopped, active, visited)

    def cond(c):
        it, *_, active, _ = c
        ok = jnp.any(active)
        if max_iters:
            ok = ok & (it < max_iters)
        return ok

    def body(c):
        (it, t, T, out, max_w, max_sw, split_vote, sample_vote,
         stopped, active, visited) = c
        pos = cen[None, :] + t[:, None] * d
        frac, chunk, cidx, depth, visited = _descend(
            child_flat, pos, N, max_levels, visited, track_visit)
        node = chunk * N3 + cidx
        cube_size = jnp.power(jnp.float32(N), depth.astype(jnp.float32))
        t_subcube = _dda_unit_batch(frac, invdir) / cube_size
        delta_t = t_subcube + jnp.float32(opt.step_size)
        leaf = jnp.take(data_flat, node, axis=0,
                        mode="clip").astype(jnp.float32)      # [R, D]
        sigma = leaf[:, data_dim - 1]
        dense = sigma > opt.sigma_thresh

        att = jnp.exp(-delta_t * delta_scale * sigma)
        weight = T * (1.0 - att)

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

        contribute = active & dense
        if opt.render_depth:
            out = out.at[:, 0].add(
                jnp.where(contribute, weight * t, 0.0))
        elif basis is not None:
            coeffs = leaf[:, :3 * basis_dim].reshape(R, 3, basis_dim)
            logits = jnp.einsum("rb,rcb->rc", basis, coeffs)
            rgb = jax.nn.sigmoid(logits)
            out = out.at[:, :3].add(
                jnp.where(contribute[:, None], weight[:, None] * rgb, 0.0))
        else:
            out = out.at[:, :3].add(
                jnp.where(contribute[:, None],
                          weight[:, None] * leaf[:, :3], 0.0))

        T = jnp.where(contribute, T * att, T)
        stop_now = contribute & (T < opt.stop_thresh)
        stopped = stopped | stop_now

        t = jnp.where(active, t + delta_t, t)
        active = active & ~stop_now & (t < tmax)
        return (it + 1, t, T, out, max_w, max_sw,
                split_vote, sample_vote, stopped, active, visited)

    (_, t, T, out, _, _, split_vote, sample_vote,
     stopped, _, visited) = jax.lax.while_loop(cond, body, carry0)

    # Postprocess (rt_core.cuh:295-331)
    if opt.render_depth:
        d0 = jnp.minimum(out[:, 0] * 0.3, 1.0)
        rgb = jnp.where(miss[:, None], 0.0,
                        jnp.broadcast_to(d0[:, None], (R, 3)))
        scale = jnp.where(stopped, 1.0 / (1.0 - T), 1.0)
        rgb = rgb * scale[:, None]
        out = jnp.concatenate([rgb, jnp.ones((R, 1), jnp.float32)], axis=1)
    else:
        scale = jnp.where(stopped, 1.0 / (1.0 - T), 1.0)
        rgb = out[:, :3] * scale[:, None]
        alpha = jnp.where(stopped, 1.0,
                          jnp.where(miss, 0.0, 1.0 - T))
        out = jnp.concatenate([rgb, alpha[:, None]], axis=1)

    return RenderResult(out, split_vote, sample_vote, visited)


def composite_background(out: jax.Array, opt: RenderOptions,
                         bg_rgb: Optional[jax.Array] = None,
                         bg_value=None) -> jax.Array:
    """Offscreen background composite (renderer_kernel.cu:215-241):
    rgb += bg * (1 - alpha).  ``bg_rgb`` [R, 3] overrides the flat
    background (the onscreen mesh-color path); ``bg_value`` is a traced
    scalar override of ``opt.background_brightness`` (dynamic-knob
    mode)."""
    nalpha = 1.0 - out[:, 3:4]
    if bg_rgb is not None:
        rgb = out[:, :3] + bg_rgb * nalpha
    elif bg_value is not None:
        rgb = out[:, :3] + bg_value * nalpha
    else:
        rgb = out[:, :3] + opt.background_brightness * nalpha
    return jnp.concatenate([rgb, out[:, 3:4]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "opt", "track_visit", "max_levels"))
def render_frame(tree: N3Tree,
                 width: int, height: int,
                 fx, fy, cx, cy,
                 transform: jax.Array,
                 opt: RenderOptions,
                 track_visit: bool = False,
                 max_levels: int = DEFAULT_MAX_LEVELS):
    """Render a full frame: ray gen + march + background composite.

    The whole frame is one compiled dispatch (ray generation, AABB clip,
    traversal, SH, compositing and framebuffer writeback all device-side).
    Returns (image [H, W, 4] f32, RenderResult).
    """
    dirs, cen = screen2worlddir(width, height, fx, fy, cx, cy, transform)
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    res = render_rays(tree, dirs, vdirs, cen, opt,
                      track_visit=track_visit, max_levels=max_levels)
    img = composite_background(res.out, opt)
    return img.reshape(height, width, 4), res


def to_rgba8(img: jax.Array) -> jax.Array:
    """f32 rgba -> uint8, clamped (reference casts without clamping:
    renderer_kernel.cu:237; clamping only diverges for out-of-range
    values that wrap in CUDA)."""
    return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
