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


def _compact_data(rng, R=500, basis_dim=9, M=4096):
    """Compact layout matching _compact_reconstruct's contract:
    sorted ray_of_p, inclusive offs, -padded tail."""
    out_dim = 3 * basis_dim + 2
    ns = rng.randint(0, 7, R).astype(np.int32)
    total = int(ns.sum())
    assert total <= M
    offs = np.cumsum(ns).astype(np.int32)
    ray_of_p = np.searchsorted(offs, np.arange(M), side="right")
    ray_of_p = np.clip(ray_of_p, 0, R - 1).astype(np.int32)
    res_c = rng.randn(M, out_dim).astype(f32)
    res_c[:, min(3, out_dim - 1)] = np.abs(
        res_c[:, min(3, out_dim - 1)]) * 3
    # z increasing within each ray's run
    z = np.sort(rng.rand(M).astype(f32) * 2)
    vdirs_c = rng.randn(M, 3).astype(f32)
    vdirs_c /= np.linalg.norm(vdirs_c, axis=-1, keepdims=True)
    return res_c, z, ray_of_p, offs, ns, vdirs_c, out_dim


@pytest.mark.parametrize("basis_dim", [1, 9])
def test_pallas_compact_composite_matches_xla(rng, basis_dim):
    """Single-pass segmented-scan kernel vs the XLA compact compositor
    on the same compact cache — within the f32 scan-order budget.  The
    XLA path gathers per-sample basis from per-RAY vdirs; feed the
    kernel the row-expanded copies so both shade identically."""
    from mega_nerf_viewer_tpu.ops.pallas_composite import \
        composite_results_compact_pallas
    res_c, z, ray_of_p, offs, ns, _, out_dim = _compact_data(
        rng, basis_dim=basis_dim)
    R = ns.shape[0]
    vdirs_ray = rng.randn(R, 3).astype(f32)
    vdirs_ray /= np.linalg.norm(vdirs_ray, axis=-1, keepdims=True)
    vdirs_c = vdirs_ray[ray_of_p]
    opt = RenderOptions()
    want = np.asarray(guided.composite_results_compact(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_ray),
        opt, basis_dim, True))
    got = np.asarray(composite_results_compact_pallas(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_c),
        opt, basis_dim, True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_compact_composite_basis_minmax(rng):
    """basis_minmax trimming is applied statically in the kernel."""
    from mega_nerf_viewer_tpu.ops.pallas_composite import \
        composite_results_compact_pallas
    res_c, z, ray_of_p, offs, ns, _, out_dim = _compact_data(
        rng, basis_dim=9)
    R = ns.shape[0]
    vdirs_ray = rng.randn(R, 3).astype(f32)
    vdirs_ray /= np.linalg.norm(vdirs_ray, axis=-1, keepdims=True)
    vdirs_c = vdirs_ray[ray_of_p]
    opt = RenderOptions(basis_minmax=(1, 5))
    want = np.asarray(guided.composite_results_compact(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_ray),
        opt, 9, True))
    got = np.asarray(composite_results_compact_pallas(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_c),
        opt, 9, True, interpret=True))
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


def test_pallas_compact_composite_opaque_no_nan(rng):
    """A fully opaque sample (sigma*delta large enough that
    exp(-sigma*delta) underflows to exactly 0.0) must not poison the
    segmented transmittance: regression for the P/wc_eff division form,
    which yielded 0/0 = NaN at the opaque sample and NaN pixels for the
    whole ray (rt_core.cuh:363-368 semantics: T simply reaches 0)."""
    from mega_nerf_viewer_tpu.ops.pallas_composite import \
        composite_results_compact_pallas
    res_c, z, ray_of_p, offs, ns, _, out_dim = _compact_data(
        rng, basis_dim=1)
    R = ns.shape[0]
    sigma_idx = min(3, out_dim - 1)
    # first sample of every ray with >= 2 samples goes opaque: its wc
    # underflows to 0.0 yet later samples in the segment still need a
    # finite (zero) transmittance, not NaN
    starts = np.concatenate([[0], offs[:-1]]).astype(np.int64)
    res_c[starts[ns >= 2], sigma_idx] = 1e8
    vdirs_ray = rng.randn(R, 3).astype(f32)
    vdirs_ray /= np.linalg.norm(vdirs_ray, axis=-1, keepdims=True)
    vdirs_c = vdirs_ray[ray_of_p]
    opt = RenderOptions()
    want = np.asarray(guided.composite_results_compact(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_ray),
        opt, 1, True))
    got = np.asarray(composite_results_compact_pallas(
        jnp.asarray(res_c), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vdirs_c),
        opt, 1, True, interpret=True))
    assert np.isfinite(got).all(), "NaN/inf leaked from opaque samples"
    assert np.isfinite(want).all()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
