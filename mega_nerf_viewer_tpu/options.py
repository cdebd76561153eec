"""Render-time options.

TPU-native analogue of the reference's ``RenderOptions`` struct
(reference: ``include/render_options.hpp:9-56``).  Every knob the reference
exposes is carried over with the same name, semantics and default.

The dataclass is frozen and hashable so a whole ``RenderOptions`` value can
be passed as a *static* argument to ``jax.jit``: the march kernels specialize
on booleans / integer caps, while the float thresholds are baked in as
compile-time constants exactly like the reference bakes them into each CUDA
kernel launch.  For interactive slider-style mutation (the reference's ImGui
panel), use :meth:`replace`, which returns a new value — recompilation only
happens for genuinely new option combinations and hits jit's cache otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Max number of global SH basis functions (reference:
# ``include/render_options.hpp:4`` VIEWER_GLOBAL_BASIS_MAX).
GLOBAL_BASIS_MAX = 25


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """All render-time knobs (reference ``include/render_options.hpp:9-56``)."""

    # * BASIC RENDERING
    # Epsilon added to steps to prevent hitting the current box again.
    step_size: float = 1e-4
    # Points with sigma < this are treated as empty space.
    sigma_thresh: float = 1e-2
    # Stop marching when remaining light intensity drops below this.
    stop_thresh: float = 1e-2
    # Background brightness composited behind the volume.
    background_brightness: float = 1.0

    # * VISUALIZATION
    # Rendering bounding box relative to the tree's [0,1] cube:
    # (minx, miny, minz, maxx, maxy, maxz).
    render_bbox: Tuple[float, float, float, float, float, float] = (
        0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    # Range of SH basis functions to use (inclusive); no effect for RGBA.
    basis_minmax: Tuple[int, int] = (0, GLOBAL_BASIS_MAX - 1)
    # Axis-angle rotation applied to view directions for all rays.
    rot_dirs: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # * ADVANCED VISUALIZATION
    # Draw the octree wireframe grid (headless: returns line vertices).
    show_grid: bool = False
    grid_max_depth: int = 4
    # Render expected-depth instead of color.
    render_depth: bool = False

    # * DYNAMIC REFINEMENT / GUIDED SAMPLING
    use_splitting: bool = False
    use_guided_sampling: bool = False

    max_depth: int = 16
    samples_per_corner: int = 8
    split_batch_size: int = 4096
    nerf_batch_size: int = 1024
    max_sample_count: int = 256

    need_viewdir: bool = False
    appearance_embedding: int = -1
    max_guided_samples: int = 128

    def replace(self, **kwargs) -> "RenderOptions":
        """Return a copy with the given fields replaced (live-settable knobs)."""
        return dataclasses.replace(self, **kwargs)

    @property
    def sample_dim(self) -> int:
        """Feature width of a guided sample excluding the leading z value:
        xyz (+viewdir) (+appearance).  Reference:
        ``src/renderer/cuda_renderer.cpp:471-489`` (init_sample_tensor)."""
        dim = 3
        if self.need_viewdir:
            dim += 3
        if self.appearance_embedding != -1:
            dim += 1
        return dim


def options_from_args(args) -> RenderOptions:
    """Build RenderOptions from parsed CLI args.

    Mirrors the reference's ``render_options_from_args``
    (``src/opts.cpp:49-68``) including the grid flag handling.
    """
    opts = RenderOptions(
        background_brightness=args.bg,
        step_size=args.step_size,
        stop_thresh=args.stop_thresh,
        sigma_thresh=args.sigma_thresh,
        split_batch_size=args.split_batch_size,
        nerf_batch_size=args.nerf_batch_size,
        samples_per_corner=args.samples_per_voxel,
        appearance_embedding=args.appearance_embedding,
        max_guided_samples=args.max_guided_samples,
    )
    if getattr(args, "grid", None) is not None:
        opts = opts.replace(show_grid=True, grid_max_depth=args.grid)
    return opts
