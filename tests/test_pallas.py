"""Pallas fused compositor vs the XLA implementation (interpret mode on
CPU; the TPU-compiled path is exercised by bench/TPU runs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.ops import guided
from mega_nerf_viewer_tpu.ops.pallas_composite import \
    composite_results_pallas

f32 = np.float32


def _data(rng, R=24, S=128, basis_dim=1):
    out_dim = 3 * basis_dim + 2
    results = rng.randn(R, S, out_dim).astype(f32)
    results[..., min(3, out_dim - 1)] = np.abs(
        results[..., min(3, out_dim - 1)]) * 3
    z = np.sort(rng.rand(R, S).astype(f32) * 2, axis=1)
    ns = rng.randint(0, S + 1, R).astype(np.int32)
    vdirs = rng.randn(R, 3).astype(f32)
    vdirs /= np.linalg.norm(vdirs, axis=-1, keepdims=True)
    return results, z, ns, vdirs, out_dim


@pytest.mark.parametrize("basis_dim", [1, 9])
def test_pallas_composite_matches_xla(rng, basis_dim):
    results, z, ns, vdirs, out_dim = _data(rng, basis_dim=basis_dim)
    opt = RenderOptions()
    want = np.asarray(guided.composite_results(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, basis_dim, True))
    got = np.asarray(composite_results_pallas(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, basis_dim, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_composite_depth_mode(rng):
    results, z, ns, vdirs, _ = _data(rng)
    opt = RenderOptions(render_depth=True)
    want = np.asarray(guided.composite_results(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, 1, True))
    got = np.asarray(composite_results_pallas(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, 1, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_composite_nondivisible_rows(rng):
    results, z, ns, vdirs, _ = _data(rng, R=13)
    opt = RenderOptions()
    want = np.asarray(guided.composite_results(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, 1, True))
    got = np.asarray(composite_results_pallas(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, 1, interpret=True))
    assert got.shape == (13, 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
