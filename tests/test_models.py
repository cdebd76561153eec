import numpy as np
import pytest

import jax.numpy as jnp

from mega_nerf_viewer_tpu.models import MegaNeRFModel, MLPParams, mlp_forward
from mega_nerf_viewer_tpu.models.meganerf import mlp_forward_all


def test_synthetic_model_query_matches_direct(rng):
    model = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4, seed=1)
    x = rng.randn(100, 3).astype(np.float32)
    ids = rng.randint(0, 4, 100).astype(np.int16)
    out = np.asarray(model.query(ids, x, nerf_batch_size=16, batch_mult=1))
    for i in range(100):
        want = np.asarray(mlp_forward(model.params, jnp.int32(int(ids[i])),
                                      jnp.asarray(x[i:i + 1])))[0]
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-5)


def test_query_empty():
    model = MegaNeRFModel.synthetic()
    out = model.query(np.zeros(0, np.int16), np.zeros((0, 3), np.float32))
    assert out.shape == (0, 5)


def test_mlp_forward_all_matches(rng):
    model = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4, seed=2)
    x = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 4, 64).astype(np.int32))
    got = np.asarray(mlp_forward_all(model.params, ids, x))
    want = np.asarray(model.query(np.asarray(ids), np.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cluster_ids_grid():
    model = MegaNeRFModel.synthetic(
        n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    # (y, z) quadrants: grid1 from y, grid2 from z (rt_core.cuh:541-549)
    pts = np.array([[-0.5, -0.5], [-0.5, 0.5], [0.5, -0.5], [0.5, 0.5]],
                   np.float32)
    ids = model.cluster_ids_for_points(pts)
    np.testing.assert_array_equal(ids, [0, 1, 2, 3])
    # clamping outside the box
    ids2 = model.cluster_ids_for_points(
        np.array([[-5.0, 5.0]], np.float32))
    assert ids2[0] == 1


def _build_torch_container(tmp_path, need_viewdir=False, skip=False):
    import torch
    import torch.nn as nn

    in_dim = 3 + (3 if need_viewdir else 0)

    class Sub(nn.Module):
        def __init__(self):
            super().__init__()
            self.l0 = nn.Linear(in_dim, 16)
            self.l1 = nn.Linear(16 + (in_dim if skip else 0), 16)
            self.l2 = nn.Linear(16, 5)

        def forward(self, x, sigma_only: bool = False):
            h = torch.relu(self.l0(x))
            if self.l1.in_features != h.shape[-1]:
                h = torch.cat([h, x], dim=-1)
            h = torch.relu(self.l1(h))
            return self.l2(h)

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.grid_dim = torch.tensor([2, 1], dtype=torch.int32)
            self.min_position = torch.tensor([-1.0, -1.0, -1.0])
            self.max_position = torch.tensor([1.0, 1.0, 1.0])
            self.centroids = torch.zeros(2, 3)
            self.need_viewdir = need_viewdir
            self.need_appearance_embedding = False
            self.sub_module_0 = torch.jit.script(Sub())
            self.sub_module_1 = torch.jit.script(Sub())

    torch.manual_seed(0)
    c = Container()
    path = str(tmp_path / "container.pt")
    torch.jit.save(torch.jit.script(c), path)
    return path, c


@pytest.mark.parametrize("skip", [False, True])
def test_torchscript_conversion(tmp_path, skip, rng):
    torch = pytest.importorskip("torch")
    path, container = _build_torch_container(tmp_path, skip=skip)
    model = MegaNeRFModel.from_torchscript(path)
    assert model.n_clusters == 2
    assert model._torch_modules is None, "conversion should verify clean"
    if skip:
        assert model.params.skips == (1,)
    x = rng.randn(32, 3).astype(np.float32)
    with torch.inference_mode():
        want0 = container.sub_module_0(torch.from_numpy(x), False).numpy()
        want1 = container.sub_module_1(torch.from_numpy(x), False).numpy()
    ids = np.array([0] * 16 + [1] * 16, np.int16)
    got = np.asarray(model.query(ids, x))
    np.testing.assert_allclose(got[:16], want0[:16], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[16:], want1[16:], rtol=1e-4, atol=1e-5)


def test_torchscript_fallback(tmp_path, rng):
    """An architecture the converter can't replay must fall back to eager
    torch execution with identical outputs."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class Weird(nn.Module):
        def __init__(self):
            super().__init__()
            self.l0 = nn.Linear(3, 8)
            self.l1 = nn.Linear(8, 5)

        def forward(self, x, sigma_only: bool = False):
            h = torch.sin(self.l0(x))    # non-ReLU: replay mismatch
            return self.l1(h)

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.grid_dim = torch.tensor([1, 1], dtype=torch.int32)
            self.min_position = torch.tensor([-1.0, -1.0, -1.0])
            self.max_position = torch.tensor([1.0, 1.0, 1.0])
            self.centroids = torch.zeros(1, 3)
            self.need_viewdir = False
            self.need_appearance_embedding = False
            self.sub_module_0 = torch.jit.script(Weird())

    torch.manual_seed(1)
    c = Container()
    path = str(tmp_path / "weird.pt")
    torch.jit.save(torch.jit.script(c), path)
    model = MegaNeRFModel.from_torchscript(path)
    assert model._torch_modules is not None
    x = rng.randn(8, 3).astype(np.float32)
    with torch.inference_mode():
        want = c.sub_module_0(torch.from_numpy(x), False).numpy()
    got = np.asarray(model.query(np.zeros(8, np.int16), x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_query_device_matches_host_loop():
    """Grouped ragged_dot dispatch must produce the host chunked-loop
    results for arbitrary cluster orderings (incl. empty clusters)."""
    import jax.numpy as jnp
    m = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4, hidden=16,
                                n_layers=3, grid_dim=(2, 2))
    rng = np.random.RandomState(3)
    x = rng.randn(333, 3).astype(np.float32)
    ids = rng.choice([0, 2, 3], size=333).astype(np.int32)  # 1 empty
    want = np.asarray(m.query(ids, x))
    got = np.asarray(m.query_device(jnp.asarray(ids), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grouped_forward_with_skips():
    """mlp_forward_grouped must honor NeRF skip-concat layers."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.models.meganerf import (
        MLPParams, mlp_forward, mlp_forward_grouped)
    rng = np.random.RandomState(4)
    C, in_dim, h = 3, 3, 8
    dims = [(in_dim, h), (h, h), (h + in_dim, h), (h, 5)]
    weights = [jnp.asarray(rng.randn(C, a, b).astype(np.float32) * 0.3)
               for a, b in dims]
    biases = [jnp.asarray(rng.randn(C, b).astype(np.float32) * 0.1)
              for _, b in dims]
    p = MLPParams(weights=weights, biases=biases, skips=(2,))
    x = rng.randn(30, in_dim).astype(np.float32)
    gs = jnp.asarray([12, 0, 18], jnp.int32)
    got = np.asarray(mlp_forward_grouped(p, jnp.asarray(x), gs))
    want = np.concatenate([
        np.asarray(mlp_forward(p, jnp.int32(0), jnp.asarray(x[:12]))),
        np.asarray(mlp_forward(p, jnp.int32(2), jnp.asarray(x[12:])))])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_query_chunked_matches_ragged():
    """The chunked-dense production dispatch (_query_chunked) must
    match the ragged_dot reference path for uneven cluster mixes
    (incl. empty clusters) and skip-concat layers."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.models.meganerf import (
        MLPParams, _query_grouped, _query_chunked)
    rng = np.random.RandomState(5)
    C, in_dim, h = 5, 4, 16
    dims = [(in_dim, h), (h, h), (h + in_dim, h), (h, 6)]
    weights = [jnp.asarray(rng.randn(C, a, b).astype(np.float32) * 0.3)
               for a, b in dims]
    biases = [jnp.asarray(rng.randn(C, b).astype(np.float32) * 0.1)
              for _, b in dims]
    p = MLPParams(weights=weights, biases=biases, skips=(2,))
    n = 1000
    x = rng.randn(n, in_dim).astype(np.float32)
    ids = rng.choice([0, 1, 3, 4], size=n,
                     p=[0.7, 0.1, 0.15, 0.05]).astype(np.int32)  # 2 empty
    want = np.asarray(_query_grouped(p, jnp.asarray(ids), jnp.asarray(x)))
    got = np.asarray(_query_chunked(p, jnp.asarray(ids), jnp.asarray(x),
                                    64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_query_grouped_large_routing():
    """query_grouped routes >=64k batches through the chunked-dense
    path; outputs must match the host loop at that scale."""
    import jax.numpy as jnp
    m = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4, hidden=16,
                                n_layers=2, grid_dim=(2, 2))
    rng = np.random.RandomState(6)
    n = (1 << 16) + 77
    x = rng.randn(n, 3).astype(np.float32)
    ids = rng.randint(0, 4, n).astype(np.int32)
    got = np.asarray(m.query_device(jnp.asarray(ids), jnp.asarray(x)))
    want = np.asarray(m.query(ids, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
