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

import os as _os

# Persistent jit cache: TPU compiles route through a (sometimes queued)
# remote service and cold-process startup paid 30 s - minutes per
# executable; with the on-disk cache a warm artifact loads in <1 s
# (measured 29.5 s -> 0.5 s).  Respect an explicit user configuration.
#
# CPU runs get NO persistent cache: XLA:CPU cache entries are AOT
# machine code whose recorded target features include XLA-internal
# pseudo-features (+prefer-no-scatter/+prefer-no-gather) the loader
# can never match against a real host's CPUID set — every cache load
# warns "machine type ... doesn't match ... could lead to execution
# errors such as SIGILL" (jax 0.9.0, observed 2026-08-19), and two
# full-suite runs crashed with SIGSEGV at random late points
# (cache-entry serialize; an unrelated compile) consistent with a
# mis-loaded executable corrupting memory.  CPU compiles are local
# and fast; only the TPU remote-compile service needs the cache.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        and _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() \
        != "cpu":
    try:
        import jax as _jax
        # The axon plugin ignores JAX_PLATFORMS; CPU is forced via
        # jax.config.update("jax_platforms", "cpu") BEFORE importing
        # this package (conftest, _overrides, user scripts) — honor
        # that too, or CPU runs silently re-enable the AOT-cache
        # SIGILL/SIGSEGV path the env-var check exists to close.
        # CPU-forced means cpu is the PRIMARY (first) platform: the
        # environment reports "axon,cpu" on normal TPU runs (cpu as
        # fallback), and a substring test disabled the TPU cache on
        # every run — cold remote compiles each process (found as
        # 20+ min bench startups, 2026-08-20).
        _plats = (getattr(_jax.config, "jax_platforms", None) or "")
        _primary = _plats.split(",")[0].strip()
        if _primary == "cpu":
            raise ImportError("cpu platform forced via jax.config")
        if _primary and _primary != "tpu":
            # Out-of-tree PJRT plugin (e.g. "axon"): only trust the
            # cache when the plugin module is importable.  If it has
            # vanished (PYTHONPATH lost the plugin site dir — a
            # documented failure mode), jax falls back to the cpu
            # backend at init and a cache left enabled would write/
            # load CPU AOT entries — the SIGILL/SIGSEGV hazard this
            # gate exists to close.
            import importlib.util as _ilu
            if _ilu.find_spec(_primary) is None:
                raise ImportError(
                    f"{_primary} plugin not importable; cpu fallback "
                    "likely")
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "mega_nerf_viewer_tpu",
            "jit")
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:                        # pragma: no cover
        pass

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


def __getattr__(name):
    # lazy: web pulls in http.server/threading only when used
    if name in ("WebViewer", "serve"):
        from . import web
        return getattr(web, name)
    raise AttributeError(name)
