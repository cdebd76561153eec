"""Headless render API.

Replaces the reference's GLFW/ImGui event loop + ``VolumeRenderer`` facade
(``include/renderer/renderer.hpp:9-40``) with a functional API matching the
reference CLI's octree_path/model_path semantics and pixel output.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .camera import Camera
from .n3tree import N3Tree
from .options import RenderOptions
from .ops.render import render_frame, to_rgba8
from .utils.png import write_png


def load_tree(octree_path: str, max_capacity: Optional[int] = None,
              bounds_only: bool = False) -> N3Tree:
    """Load a PlenOctree npz onto device (reference ``N3Tree::open`` +
    ``move_to_device``)."""
    return N3Tree.open(octree_path, max_capacity=max_capacity,
                       bounds_only=bounds_only)


def render(tree: N3Tree,
           camera: Optional[Camera] = None,
           options: Optional[RenderOptions] = None,
           out_path: Optional[str] = None,
           fast: bool = False,
           leaf_map=None) -> np.ndarray:
    """Render one frame; optionally write a PNG screenshot.

    Returns the ``[H, W, 4]`` float32 RGBA image (background-composited),
    matching the reference's offscreen pixel output
    (``renderer_kernel.cu:215-241``).

    ``fast=True`` uses the leaf-map accelerated path (ops/accel.py) —
    bit-identical, much faster for repeated renders; pass a prebuilt
    ``leaf_map`` to amortize its construction (or use the stateful
    :class:`Viewer`, which manages one automatically).
    """
    import jax.numpy as jnp

    camera = camera or Camera()
    options = options or RenderOptions()
    camera._update()
    if fast:
        from .ops import accel
        if leaf_map is None:
            leaf_map = accel.build_leaf_map(tree)
        img, overflow, _ = accel.render_frame_fast(
            tree, leaf_map, camera, options)
        if bool(overflow):
            img, _ = render_frame(
                tree, camera.width, camera.height,
                camera.fx, camera.fy, camera.cx, camera.cy,
                jnp.asarray(camera.transform), options)
    else:
        img, _ = render_frame(
            tree, camera.width, camera.height,
            camera.fx, camera.fy, camera.cx, camera.cy,
            jnp.asarray(camera.transform), options)
    img = np.asarray(img)
    if out_path is not None:
        write_png(out_path, np.asarray(to_rgba8(jnp.asarray(img))))
    return img
