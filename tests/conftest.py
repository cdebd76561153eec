"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per the repo build rules.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(session, config, items):
    """Isolate the web-server tests in a fresh subprocess when they are
    part of a larger session.

    XLA:CPU intermittently SIGSEGVs when COMPILING on a background
    thread late in a long-lived test process (four suite crashes on
    2026-08-19, every one inside native compile/serialize code on the
    web render thread at ~86% of the full run, with and without the
    persistent compile cache; standalone ``pytest tests/test_web.py``
    and half-suite runs always pass).  The web render thread is the
    only place the suite compiles off the main thread, so when other
    tests are collected too the in-process web tests are skipped and
    ``test_web_isolation.py`` re-runs them in a young subprocess.
    """
    web = [i for i in items if i.fspath and i.fspath.basename == "test_web.py"]
    if web and len(web) < len(items):
        mark = pytest.mark.skip(
            reason="runs in an isolated subprocess (test_web_isolation)")
        for item in web:
            item.add_marker(mark)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    XLA:CPU SIGSEGVs inside ``backend_compile_and_load`` late in a
    long-lived many-compile process (round 4: four crashes at ~86% of
    the full run on the web render thread; round 5: deterministic at
    test_viewer_mode_matrix_under_motion — both >500 compiles into the
    session, both fine standalone).  Dropping the Python-side executable
    caches at module boundaries releases the backend resources the
    session otherwise accumulates; modules rarely share jit keys, so
    the lost cache hits are minimal.
    """
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
