"""Persistent-compile-cache gate (mega_nerf_viewer_tpu/__init__.py).

The gate must enable the on-disk jit cache exactly when the process
will compile for the TPU, and keep it OFF for any XLA:CPU session —
CPU AOT cache entries record pseudo target-features the loader can't
match (SIGILL warnings; two suite SIGSEGVs, 2026-08-19).  Two past
regressions pinned here:

* round-5: a ``"cpu" in jax_platforms`` substring test disabled the
  cache on EVERY TPU run (the environment reports ``"axon,cpu"`` —
  cpu as fallback), costing cold remote compiles each process;
* review find: with the plugin site dir lost from PYTHONPATH the
  plugin can't import, jax falls back to the cpu backend, and a cache
  left enabled would write/load CPU AOT entries.

Each case runs in a subprocess (the gate is import-time code).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = (
    "import jax{force}\n"
    "import mega_nerf_viewer_tpu\n"
    "print('CACHE=' + repr(jax.config.jax_compilation_cache_dir))\n"
)


def _probe(force_cpu=False, env_extra=None):
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    if env_extra:
        env.update(env_extra)
    src = PROBE.format(
        force="; jax.config.update('jax_platforms', 'cpu')"
        if force_cpu else "")
    out = subprocess.run(
        [sys.executable, "-c", src], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    for line in out.stdout.splitlines():
        if line.startswith("CACHE="):
            return eval(line[len("CACHE="):])
    raise AssertionError(f"no CACHE line in {out.stdout!r}")


def test_cpu_forced_disables_cache():
    assert _probe(force_cpu=True) is None


def test_explicit_env_dir_respected():
    """An explicit JAX_COMPILATION_CACHE_DIR wins: the gate must not
    override the user's directory with the package default."""
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/explicit")
    out = subprocess.run(
        [sys.executable, "-c", PROBE.format(force="")], env=env,
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    tail = out.stdout.split("CACHE=")[-1]
    assert "mega_nerf_viewer_tpu" not in tail, \
        "gate must respect JAX_COMPILATION_CACHE_DIR"


def test_accelerator_primary_enables_cache():
    """'axon,cpu' (cpu as FALLBACK) must keep the TPU cache ON —
    the round-5 regression disabled it on every run.  Only meaningful
    where the plugin is importable; skip otherwise."""
    import importlib.util
    if importlib.util.find_spec("axon") is None:
        import pytest
        pytest.skip("no out-of-tree TPU plugin on this box")
    # conftest exports JAX_PLATFORMS=cpu for the suite; restore the
    # environment's normal TPU-primary value for this subprocess
    cache = _probe(env_extra={"JAX_PLATFORMS": "axon,cpu"})
    assert cache is not None and "mega_nerf_viewer_tpu" in cache


def test_missing_plugin_disables_cache():
    """Primary platform names a plugin that can't import (PYTHONPATH
    lost the plugin site dir): jax will fall back to the cpu backend,
    so the cache must stay off."""
    cache = _probe(env_extra={"PYTHONPATH": "", "JAX_PLATFORMS":
                              "definitely_not_a_plugin,cpu"})
    assert cache is None
