"""mega_nerf_viewer_tpu — a TPU-native Mega-NeRF / PlenOctree renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cmusatyalab/mega-nerf-viewer (a C++/CUDA interactive viewer for Mega-NeRF
models rendered via PlenOctree N3Tree sparse voxel octrees):

  * N3Tree octree loading (svox ``.npz`` schema, incl. vector-quantized
    colors) into padded device arrays (reference: ``src/n3tree/n3tree.cpp``).
  * Volume rendering: per-ray octree DDA traversal, spherical-harmonics
    color evaluation and front-to-back compositing
    (reference: ``include/cuda/rt_core.cuh``).
  * Dynamic octree refinement: MLP-driven voxel splitting, leaf resampling
    and capacity pruning (reference: ``src/renderer/cuda_renderer.cpp``).
  * Guided ray sampling: octree traversal places samples; a Mega-NeRF MLP
    shades them; a composite pass integrates along rays.
  * Multi-chip scale-out via ``jax.sharding`` + ``shard_map`` (new,
    idiomatic capability; the reference is single-GPU).

Unlike the reference, this framework is headless-first: the GLFW/ImGui GUI
is replaced by a stateful :class:`Viewer` + a functional ``render`` API and
CLI with matching flag semantics.
"""

from .version import __version__
from .options import RenderOptions
from .camera import Camera
from .n3tree import N3Tree, DataFormat
from .api import render, load_tree
from .viewer import Viewer

__all__ = [
    "__version__",
    "RenderOptions",
    "Camera",
    "N3Tree",
    "DataFormat",
    "render",
    "load_tree",
    "Viewer",
]
