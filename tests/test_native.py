"""Native C++ data-path runtime (native/nerfview_native.cpp via ctypes):
npz parity with numpy, VQ decode parity with the pure-python decode."""

import numpy as np
import pytest

from mega_nerf_viewer_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


def test_npz_parity_stored_and_deflate(tmp_path, rng):
    arrs = dict(
        f16=rng.randn(37, 8, 28).astype(np.float16),
        i32=rng.randint(-1000, 1000, (129, 3)).astype(np.int32),
        i64scalar=np.int64(42),
        f64=np.float64(0.125),
        u16=rng.randint(0, 65535, (4, 9)).astype(np.uint16),
        s=np.str_("SH16"),
    )
    for name, saver in [("s.npz", np.savez),
                        ("c.npz", np.savez_compressed)]:
        p = str(tmp_path / name)
        saver(p, **arrs)
        out = native.load_npz(p)
        got_np = np.load(p)
        for k in arrs:
            if k == "s":
                assert str(out[k]) == "SH16"
            else:
                np.testing.assert_array_equal(out[k], got_np[k])


def test_vq_decode_parity(rng):
    from mega_nerf_viewer_tpu.n3tree import tree as tree_mod
    cap, n3 = 17, 8
    for n_basis_q, n_retain in [(1, 0), (2, 0), (2, 1)]:
        n_basis = n_basis_q + n_retain
        data_dim = 3 * n_basis + 1
        codebook = rng.randn(n_basis_q, 65536, 3).astype(np.float16)
        qmap = rng.randint(0, 65536, (n_basis_q, cap, n3)).astype(np.uint16)
        sigma = rng.rand(cap, n3).astype(np.float16)
        retained = (rng.randn(n_retain, cap, n3).astype(np.float16)
                    if n_retain else None)
        for bug_compat in (True, False):
            native_out = native.vq_decode(
                qmap, codebook, retained, sigma, data_dim,
                bug_compat=bug_compat)
            npz = dict(quant_colors=codebook, quant_map=qmap, sigma=sigma)
            if retained is not None:
                npz["data_retained"] = retained
            # force the numpy path by monkeypatching availability
            orig = native.available
            native.available = lambda: False
            try:
                numpy_out = tree_mod._decode_vq(npz, data_dim, n3,
                                                bug_compat)
            finally:
                native.available = orig
            np.testing.assert_array_equal(native_out, numpy_out)


def test_tree_open_uses_native(tmp_path):
    from mega_nerf_viewer_tpu.n3tree import sphere_tree, N3Tree
    t = sphere_tree(basis_dim=4, depth=3)
    p = str(tmp_path / "t.npz")
    t.save_npz(p)
    t2 = N3Tree.open(p)   # goes through the native loader
    cap = int(t.capacity)
    np.testing.assert_array_equal(np.asarray(t2.data)[:cap],
                                  np.asarray(t.data)[:cap])
    np.testing.assert_array_equal(np.asarray(t2.child)[:cap],
                                  np.asarray(t.child)[:cap])
    assert t2.data_format == t.data_format


def test_argsort_counts_matches_numpy(rng):
    keys = rng.randint(0, 500, 100000).astype(np.int32)
    perm, inv = native.argsort_counts(keys)
    want = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, want)
    np.testing.assert_array_equal(inv, np.argsort(want, kind="stable"))
    # inverse property
    np.testing.assert_array_equal(perm[inv], np.arange(len(keys)))
    with pytest.raises(RuntimeError):
        native.argsort_counts(np.array([-1, 2], np.int32))


def test_corrupt_oversized_payload_fails_cleanly(tmp_path):
    """A member whose zip payload exceeds its npy descr*shape geometry
    must raise, not overflow the destination buffer (nv_read_many_cap)."""
    import pytest
    from mega_nerf_viewer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    p = str(tmp_path / "evil.npz")
    np.savez(p, big=np.arange(4096, dtype=np.int64))
    raw = bytearray(open(p, "rb").read())
    # np.savez stores uncompressed: the npy header's shape tuple is raw
    # bytes — shrink the declared shape so geometry < actual payload
    idx = raw.find(b"(4096,)")
    assert idx > 0
    raw[idx:idx + 7] = b"(16,)  "
    open(p, "wb").write(bytes(raw))
    with pytest.raises(RuntimeError):
        native.load_npz(p)


def test_truncated_archive_fails_cleanly(tmp_path, rng):
    """Bytes missing from the middle of the archive (offsets now point
    past or at garbage) must raise RuntimeError, never read past the
    mapping (SIGBUS) or return corrupt arrays."""
    from mega_nerf_viewer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    p = tmp_path / "t.npz"
    np.savez_compressed(p, a=rng.randn(512, 16).astype(np.float32),
                        b=np.arange(4096, dtype=np.int32))
    raw = p.read_bytes()
    cut = p.with_suffix(".cut.npz")
    cut.write_bytes(raw[:1000] + raw[4000:])    # drop mid-file bytes
    with pytest.raises(RuntimeError):
        native.load_npz(str(cut))


def test_vq_decode_validates_geometry(rng):
    """Inconsistent VQ arrays (data_dim too small for n_basis, or a
    non-65536 codebook) must raise instead of writing out of bounds —
    the numpy fallback raises IndexError for the same archives."""
    from mega_nerf_viewer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    qm = rng.randint(0, 10, (2, 4, 8)).astype(np.uint16)
    qc = rng.randn(2, 65536, 3).astype(np.float16)
    sg = rng.randn(4, 8).astype(np.float16)
    with pytest.raises(ValueError):
        native.vq_decode(qm, qc, None, sg, data_dim=4)   # needs >= 7
    with pytest.raises(ValueError):
        native.vq_decode(qm, qc[:, :100], None, sg, data_dim=7)


@pytest.mark.parametrize("compressed", [False, True])
def test_npz_fuzz_sizes_dtypes(tmp_path, rng, compressed):
    """Randomized parity vs numpy across entry sizes straddling the
    4096-byte header probe and odd shapes/dtypes (the streaming-inflate
    rework must reproduce every byte, including the skip-past-header
    path for stored AND deflated members)."""
    from mega_nerf_viewer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    arrays = {
        "empty": np.zeros((0, 3), np.float32),
        "one": np.float32([[3.25]]),
        "probe_minus": rng.randint(0, 255, 4000).astype(np.uint8),
        "probe_plus": rng.randn(600).astype(np.float64),   # > 4096 B
        "big": rng.randn(333, 77).astype(np.float32),
        "halfs": rng.randn(1000).astype(np.float16),
        "ints": rng.randint(-2**40, 2**40, (57, 3)).astype(np.int64),
        "bools": rng.rand(129) > 0.5,
        "fmt": np.str_("SH16"),
    }
    p = tmp_path / ("c.npz" if compressed else "s.npz")
    (np.savez_compressed if compressed else np.savez)(str(p), **arrays)
    got = native.load_npz(str(p))
    want = np.load(str(p))
    for k in arrays:
        if k == "fmt":
            assert str(got[k]) == "SH16"
            continue
        np.testing.assert_array_equal(np.asarray(got[k]), want[k],
                                      err_msg=k)
