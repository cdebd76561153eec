"""Camera ray generation and view-direction utilities.

TPU-native analogue of the reference's device-side ray setup:
``screen2worlddir`` (``src/cuda/renderer_kernel.cu:31-38``) and the
Rodrigues view-direction shift (``src/cuda/renderer_kernel.cu:40-61``).
Everything is vectorized over whole pixel grids and runs device-side under
jit, so a frame's ray generation is part of the single compiled dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp


def screen2worlddir(width: int, height: int,
                    fx, fy, cx, cy,
                    transform: jnp.ndarray):
    """Generate normalized world-space ray directions for every pixel.

    Args:
      width, height: image size (static ints).
      fx, fy, cx, cy: pinhole intrinsics (scalars, may be traced).
      transform: ``[4, 3]`` camera-to-world, rows = (right, up, back, center)
        (reference convention, ``src/camera.cpp:54-82``).

    Returns:
      (dirs ``[H*W, 3]`` unit world directions, cen ``[3]`` world origin).

    Reference math (``renderer_kernel.cu:31-38``): camera-space direction is
    ``((x+0.5-cx)/fx, -(y+0.5-cy)/fy, -1)`` mapped by the 3x3 rotation part.
    """
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    u = (xs[None, :] + 0.5 - cx) / fx          # [H?, W]
    v = -(ys[:, None] + 0.5 - cy) / fy         # [H, W?]
    u = jnp.broadcast_to(u, (height, width))
    v = jnp.broadcast_to(v, (height, width))
    cam_dirs = jnp.stack(
        [u, v, -jnp.ones_like(u)], axis=-1).reshape(-1, 3)   # [H*W, 3]
    rot = transform[:3, :]                                    # rows r,u,b
    world_dirs = cam_dirs @ rot                               # x*r + y*u + z*b
    world_dirs = world_dirs / jnp.linalg.norm(
        world_dirs, axis=-1, keepdims=True)
    cen = transform[3, :]
    return world_dirs, cen


def screen2worlddir_indices(pix: jnp.ndarray, width: int,
                            fx, fy, cx, cy,
                            transform: jnp.ndarray):
    """Ray directions for an arbitrary pixel-index order.

    Same math as :func:`screen2worlddir` but generates rays directly in
    the order of flat pixel indices ``pix`` — used by the fast path to
    produce cost-sorted ray batches arithmetically instead of gathering
    a pre-generated [R, 3] array (TPU gathers are expensive; see
    PERFORMANCE.md)."""
    x = (pix % width).astype(jnp.float32)
    y = (pix // width).astype(jnp.float32)
    u = (x + 0.5 - cx) / fx
    v = -(y + 0.5 - cy) / fy
    cam_dirs = jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)
    rot = transform[:3, :]
    world_dirs = cam_dirs @ rot
    world_dirs = world_dirs / jnp.linalg.norm(
        world_dirs, axis=-1, keepdims=True)
    return world_dirs, transform[3, :]


def rodrigues(aa, dirs: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``dirs`` by the axis-angle vector ``aa`` (Rodrigues formula).

    Matches the reference's viewdir shift (``renderer_kernel.cu:40-61``)
    including the no-op below-angle-1e-6 behavior (implemented as a smooth
    select so it stays jittable).
    """
    aa = jnp.asarray(aa, dtype=jnp.float32)
    angle = jnp.linalg.norm(aa)
    safe_angle = jnp.maximum(angle, 1e-12)
    k = aa / safe_angle
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)
    cross = jnp.cross(jnp.broadcast_to(k, dirs.shape), dirs)
    dot = jnp.sum(dirs * k, axis=-1, keepdims=True)
    rotated = (dirs * cos_a + cross * sin_a + k * dot * (1.0 - cos_a))
    return jnp.where(angle < 1e-6, dirs, rotated)
