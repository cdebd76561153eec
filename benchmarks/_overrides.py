"""Dev-only smoke overrides shared by the benchmark scripts.

Environment knobs (any of them marks the run as a SMOKE run — the
scripts add ``"smoke": true`` to their JSON line so the number can
never be mistaken for a measurement):

* ``BENCH_FORCE_CPU=1`` — force the CPU platform.  Needed because the
  axon TPU plugin ignores the ``JAX_PLATFORMS`` env var; only
  ``jax.config.update`` before backend init works.
* ``BENCH_WH=WxH`` — override the frame size.
* ``BENCH_DEPTH=N`` — override the octree depth (where the script has
  a depth knob).

Purpose: after code changes land while the accelerator is unreachable,
``tools/smoke_benchmarks.sh`` exercises every benchmark end-to-end on
CPU at a tiny size, so the first real measurement run can't be lost to
a latent crash.
"""

import os


def apply(width: int, height: int, depth=None):
    """Apply env overrides; returns (width, height, depth, smoke)."""
    smoke = False
    if os.environ.get("BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        # The package enabled the persistent jit cache at import time
        # (before this override ran) believing the run was TPU; XLA:CPU
        # AOT cache entries are a SIGILL/SIGSEGV risk — turn it off.
        jax.config.update("jax_compilation_cache_dir", None)
        smoke = True
    wh = os.environ.get("BENCH_WH")
    if wh:
        width, height = (int(x) for x in wh.split("x"))
        smoke = True
    d = os.environ.get("BENCH_DEPTH")
    if d:
        if depth is not None:
            depth = int(d)
        smoke = True
    return width, height, depth, smoke
