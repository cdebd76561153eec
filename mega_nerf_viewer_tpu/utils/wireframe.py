"""Headless octree wireframe overlay.

Replaces the reference's GL mesh pass (``src/mesh.cpp`` +
``maybe_gen_wire``, cuda_renderer.cpp:545-551): the octree leaf AABBs are
projected with the camera's K / w2c and rasterized as depth-tested lines
into a color + linear-depth overlay.  The volume renderer then composites
against it exactly like the CUDA kernel composites against the mesh
surfaces: the line depth becomes the per-ray ``tmax_bg``
(renderer_kernel.cu:277-280) and the line color is the pre-existing
framebuffer color read by ``composite_and_write``
(renderer_kernel.cu:260-263).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# The 12 edges of a box as corner-index pairs (corners indexed by xyz bits)
_EDGES = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
          (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]


def rasterize_boxes(boxes: np.ndarray, camera,
                    color=(0.0, 0.0, 0.0),
                    max_depth_px: float = 1e9
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize world AABB wireframes.

    Args:
      boxes: [n, 6] world AABBs (min_xyz, max_xyz) from
        ``N3Tree.gen_wireframe``.
      camera: Camera (uses w2c and intrinsics).

    Returns (color [H, W, 3] f32, depth [H, W] f32 Euclidean camera
    distance, 1e9 where no line).  Matches the reference mesh shader,
    which writes ``length(FragPos.xyz)`` to its depth attachment and
    black unlit vertex color for the wire grid (``src/mesh.cpp`` frag
    shader; ``_push_wireframe_bb`` zero color, ``n3tree.cpp:249-259``).
    Lines with an endpoint behind the near plane are dropped rather than
    clipped (debug overlay approximation).
    """
    h, w = camera.height, camera.width
    color_buf = np.zeros((h, w, 3), np.float32)
    depth_buf = np.full((h, w), max_depth_px, np.float32)
    if len(boxes) == 0:
        return color_buf, depth_buf

    # corners [n, 8, 3]
    lo, hi = boxes[:, :3], boxes[:, 3:]
    corners = np.stack([
        np.where(np.array([(i >> 2) & 1, (i >> 1) & 1, i & 1], bool),
                 hi, lo) for i in range(8)], axis=1)

    w2c = camera.w2c  # [4,4]
    cam_pts = corners @ w2c[:3, :3].T + w2c[:3, 3]      # [n, 8, 3]
    # projection denominator: -z (camera looks along -z); stored depth is
    # the Euclidean distance like the reference shader
    z = -cam_pts[..., 2]
    dist = np.linalg.norm(cam_pts, axis=-1)
    # project with pinhole intrinsics (screen2worlddir inverse)
    with np.errstate(divide="ignore", invalid="ignore"):
        px = camera.cx + camera.fx * (cam_pts[..., 0] / z)
        py = camera.cy - camera.fy * (cam_pts[..., 1] / z)

    col = np.asarray(color, np.float32)
    for a, b in _EDGES:
        _draw_lines(color_buf, depth_buf,
                    px[:, a], py[:, a], z[:, a], dist[:, a],
                    px[:, b], py[:, b], z[:, b], dist[:, b], col)
    return color_buf, depth_buf


def _draw_lines(color_buf, depth_buf, x0, y0, z0, d0, x1, y1, z1, d1,
                col):
    """Depth-tested DDA line drawing (vectorized over segments)."""
    h, w = depth_buf.shape
    valid = (z0 > 1e-3) & (z1 > 1e-3)
    x0, y0, z0 = x0[valid], y0[valid], d0[valid]
    x1, y1, z1 = x1[valid], y1[valid], d1[valid]
    if len(x0) == 0:
        return
    length = np.maximum(np.abs(x1 - x0), np.abs(y1 - y0))
    n_steps = np.clip(length.astype(np.int64) + 1, 1, 4 * max(h, w))
    max_n = int(n_steps.max())
    ts = np.arange(max_n + 1, dtype=np.float32)
    for i in range(len(x0)):
        n = int(n_steps[i])
        t = ts[:n + 1] / n
        xs = np.round(x0[i] + (x1[i] - x0[i]) * t).astype(np.int64)
        ys = np.round(y0[i] + (y1[i] - y0[i]) * t).astype(np.int64)
        zs = z0[i] + (z1[i] - z0[i]) * t
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        xs, ys, zs = xs[ok], ys[ok], zs[ok]
        nearer = zs < depth_buf[ys, xs]
        xs, ys, zs = xs[nearer], ys[nearer], zs[nearer]
        depth_buf[ys, xs] = zs
        color_buf[ys, xs] = col


def grid_overlay(tree, camera, grid_max_depth: int):
    """Wireframe overlay for ``show_grid`` (RenderOptions.show_grid /
    grid_max_depth; reference main.cpp:230-238)."""
    boxes = tree.gen_wireframe(grid_max_depth)
    return rasterize_boxes(boxes, camera)
