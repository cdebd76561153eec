import numpy as np
import pytest

import jax

from mega_nerf_viewer_tpu.n3tree import (
    N3Tree, DataFormat, sphere_tree, random_tree, load_npz_host)


def test_sphere_tree_basic():
    t = sphere_tree(basis_dim=1, depth=3)
    assert t.N == 2
    assert t.data_dim == 4
    assert int(t.capacity) > 1
    assert t.data.shape == (t.max_capacity, 8, 4)
    assert t.child.shape == (t.max_capacity, 8)


def test_tree_is_pytree():
    t = sphere_tree(basis_dim=1, depth=2)
    leaves = jax.tree_util.tree_leaves(t)
    assert len(leaves) == 7
    # passes through jit with static metadata
    f = jax.jit(lambda tr: tr.data.astype(np.float32).sum())
    f(t)


def test_child_offsets_valid():
    t = random_tree(n_chunks=50, seed=3)
    cap = int(t.capacity)
    child = np.asarray(t.child)[:cap]
    parent = np.asarray(t.parent)[:cap]
    for c in range(cap):
        for ci in range(8):
            off = child[c, ci]
            assert off >= 0
            if off > 0:
                target = c + off
                assert target < cap
                # parent link round-trip
                assert parent[target] == c * 8 + ci


def test_pack_unpack_roundtrip():
    t = sphere_tree(basis_dim=1, depth=2)
    packed = t.pack_index(5, 1, 0, 1)
    assert packed == 5 * 8 + 1 * 4 + 0 * 2 + 1
    assert t.unpack_index(packed) == (5, 1, 0, 1)


def test_npz_roundtrip(tmp_path):
    t = sphere_tree(basis_dim=4, depth=3, max_capacity=None)
    p = str(tmp_path / "tree.npz")
    t.save_npz(p)
    t2 = N3Tree.open(p)
    assert t2.data_format == t.data_format
    assert t2.data_dim == t.data_dim
    cap = int(t.capacity)
    assert int(t2.capacity) == cap
    np.testing.assert_array_equal(np.asarray(t2.child)[:cap],
                                  np.asarray(t.child)[:cap])
    np.testing.assert_array_equal(np.asarray(t2.parent)[:cap],
                                  np.asarray(t.parent)[:cap])
    np.testing.assert_array_equal(np.asarray(t2.data)[:cap],
                                  np.asarray(t.data)[:cap])
    np.testing.assert_allclose(np.asarray(t2.scale), np.asarray(t.scale))


def test_open_with_max_capacity_and_bounds_only(tmp_path):
    t = sphere_tree(basis_dim=1, depth=3)
    p = str(tmp_path / "tree.npz")
    t.save_npz(p)
    t2 = N3Tree.open(p, max_capacity=int(t.capacity) + 100)
    assert t2.max_capacity == int(t.capacity) + 100
    assert int(t2.capacity) == int(t.capacity)
    t3 = N3Tree.open(p, bounds_only=True)
    assert int(t3.capacity) == 1
    assert np.all(np.asarray(t3.child)[0] == 0)


def test_scalar_invradius(tmp_path):
    """svox trees may store a scalar invradius (n3tree.cpp:49-52)."""
    t = sphere_tree(basis_dim=1, depth=2)
    p = str(tmp_path / "tree.npz")
    cap = int(t.capacity)
    parent_depth = np.zeros((cap, 2), np.int32)
    parent_depth[:, 0] = np.asarray(t.parent)[:cap]
    np.savez(p,
             data_dim=np.int64(4),
             data_format=np.str_("SH1"),
             invradius=np.float64(0.7),
             offset=np.asarray(t.offset),
             child=np.asarray(t.child)[:cap].reshape(cap, 2, 2, 2),
             parent_depth=parent_depth,
             data=np.asarray(t.data)[:cap])
    t2 = N3Tree.open(p)
    np.testing.assert_allclose(np.asarray(t2.scale), [0.7, 0.7, 0.7],
                               rtol=1e-6)


def test_utf32_data_format(tmp_path):
    """The svox data_format field is UTF-32; the reference strips every
    4th byte (n3tree.cpp:33-37)."""
    import zipfile
    import io
    t = sphere_tree(basis_dim=1, depth=2)
    p = str(tmp_path / "t.npz")
    t.save_npz(p)
    npz = np.load(p)
    # numpy already delivers '<U' which we decode natively
    host = load_npz_host(npz)
    assert host[5] == DataFormat("SH", 1)


def test_vq_decode(tmp_path):
    """VQ color decode (n3tree.cpp:109-175), bug-compat index layout."""
    rng = np.random.RandomState(0)
    cap, n3, n_basis = 3, 8, 1
    data_dim = 3 * n_basis + 1
    codebook = rng.randn(n_basis, 65536, 3).astype(np.float16)
    qmap = rng.randint(0, 65536, size=(n_basis, cap, n3)).astype(np.uint16)
    sigma = rng.rand(cap, n3).astype(np.float16)
    t = sphere_tree(basis_dim=1, depth=2)
    cap_t = cap
    parent_depth = np.zeros((cap, 2), np.int32)
    child = np.zeros((cap, 2, 2, 2), np.int32)
    p = str(tmp_path / "vq.npz")
    np.savez(p,
             data_dim=np.int64(data_dim),
             data_format=np.str_("SH1"),
             invradius=np.float64(1.0),
             offset=np.zeros(3, np.float32),
             child=child,
             parent_depth=parent_depth,
             quant_colors=codebook,
             quant_map=qmap,
             sigma=sigma)
    t2 = N3Tree.open(p)
    data = np.asarray(t2.data)[:cap]
    for i in range(cap):
        for j in range(n3):
            expect = codebook[0, qmap[0, i, j]]
            for ch in range(3):
                assert data[i, j, ch * n_basis] == expect[ch]
            assert data[i, j, data_dim - 1] == sigma[i, j]


def test_wireframe():
    t = sphere_tree(basis_dim=1, depth=2)
    boxes = t.gen_wireframe(max_depth=2)
    assert boxes.shape[1] == 6
    assert len(boxes) >= 8
    assert np.all(boxes[:, 3:] > boxes[:, :3])


def test_alignment_errors(tmp_path):
    t = sphere_tree(basis_dim=1, depth=2)
    cap = int(t.capacity)
    p = str(tmp_path / "bad.npz")
    parent_depth = np.zeros((cap - 1, 2), np.int32)  # misaligned
    np.savez(p,
             data_dim=np.int64(4),
             data_format=np.str_("SH1"),
             invradius=np.float64(1.0),
             offset=np.zeros(3, np.float32),
             child=np.asarray(t.child)[:cap].reshape(cap, 2, 2, 2),
             parent_depth=parent_depth,
             data=np.asarray(t.data)[:cap])
    with pytest.raises(ValueError):
        N3Tree.open(p)


def test_fp16_required(tmp_path):
    t = sphere_tree(basis_dim=1, depth=2)
    cap = int(t.capacity)
    parent_depth = np.zeros((cap, 2), np.int32)
    parent_depth[:, 0] = np.asarray(t.parent)[:cap]
    p = str(tmp_path / "f32.npz")
    np.savez(p,
             data_dim=np.int64(4),
             data_format=np.str_("SH1"),
             invradius=np.float64(1.0),
             offset=np.zeros(3, np.float32),
             child=np.asarray(t.child)[:cap].reshape(cap, 2, 2, 2),
             parent_depth=parent_depth,
             data=np.asarray(t.data)[:cap].astype(np.float32))
    with pytest.raises(ValueError, match="half precision"):
        N3Tree.open(p)


def test_open_corrupt_file(tmp_path):
    p = str(tmp_path / "corrupt.npz")
    with open(p, "wb") as f:
        f.write(b"this is not a zip archive at all" * 10)
    with pytest.raises(Exception):
        N3Tree.open(p)


def test_open_zip_missing_fields(tmp_path):
    p = str(tmp_path / "partial.npz")
    np.savez(p, data_dim=np.int64(4), data_format=np.str_("SH1"))
    with pytest.raises(Exception):
        N3Tree.open(p)
