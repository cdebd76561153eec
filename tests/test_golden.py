"""Real-artifact golden tests (SURVEY §4 anchor).

The committed fixtures under ``tests/fixtures/`` are produced by
``gen_fixtures.py``'s INDEPENDENT svox-schema writer and a genuine
TorchScript export — they exercise the loader paths the reference
consumes from real PlenOctree/Mega-NeRF artifacts
(``/root/reference/src/n3tree/n3tree.cpp:28-205``,
``src/renderer/cuda_renderer.cpp:518-543``): scalar ``invradius``,
UTF-32 ``data_format``, i32 ``[cap, 2]`` ``parent_depth`` with a live
depth column, extra svox keys, a VQ codebook variant, and an 8-layer
skip-MLP TorchScript container.  The golden image pins the exact
renderer's output across refactors.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mega_nerf_viewer_tpu import Camera, RenderOptions
from mega_nerf_viewer_tpu.n3tree import N3Tree
from mega_nerf_viewer_tpu.utils.metrics import psnr
from mega_nerf_viewer_tpu.utils.png import read_png

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")


def _golden_camera():
    cam = Camera(160, 160, 170.0)
    cam.center = np.array([-1.1, 0.9, 1.6], np.float32)
    cam.v_back = cam.center / np.linalg.norm(cam.center)
    cam._update()
    return cam


def test_svox_schema_fixture_loads():
    """Scalar invradius, UTF-32 data_format, parent_depth depth column
    and extra svox keys all load (n3tree.cpp:28-205 paths)."""
    tree = N3Tree.open(os.path.join(FIXTURES, "digger_sh4.npz"))
    assert tree.N == 2
    assert tree.data_format.to_string() == "SH4"
    assert tree.data_dim == 13
    assert int(tree.capacity) == 1473
    # scalar invradius broadcasts to all three axes (n3tree.cpp:49-52)
    scale = np.asarray(tree.scale)
    assert scale[0] == scale[1] == scale[2]
    # parent links reconstruct a rooted forest
    cap = int(tree.capacity)
    parent = np.asarray(tree.parent[:cap]) // tree.N3
    assert parent[0] == 0 and (parent[1:] < np.arange(1, cap)).all()


def test_native_reader_parity_on_fixture():
    """The C++ mmap npz reader decodes the independently-written svox
    file identically to numpy (cnpy-equivalent, from scratch)."""
    from mega_nerf_viewer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    path = os.path.join(FIXTURES, "digger_sh4.npz")
    a = native.load_npz(path)
    b = np.load(path, allow_pickle=False)
    for key in ("data", "child", "parent_depth", "offset"):
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]))


def test_golden_image():
    """Exact render of the committed artifact matches the committed
    golden (regression pin), and the fast path matches the exact path
    bit-for-bit on a real-schema file."""
    from mega_nerf_viewer_tpu.ops.render import render_frame, to_rgba8
    from mega_nerf_viewer_tpu.ops import accel
    tree = N3Tree.open(os.path.join(FIXTURES, "digger_sh4.npz"))
    cam = _golden_camera()
    opt = RenderOptions(background_brightness=0.9)
    img, _ = render_frame(tree, cam.width, cam.height, cam.fx, cam.fy,
                          cam.cx, cam.cy, jnp.asarray(cam.transform), opt)
    got = np.asarray(to_rgba8(img)).astype(np.float32) / 255.0
    want = read_png(os.path.join(FIXTURES,
                                 "digger_sh4_golden.png")) / 255.0
    assert psnr(got, want) > 45.0
    # fast vs exact: identical step math, but XLA fuses/rounds the f32
    # ray-setup reductions differently per batch shape (the exact path's
    # own output differs ~1e-5 between R=1 and R=25600 at this camera —
    # measured; single-ray fast == single-ray exact bit-for-bit), so the
    # frame-level comparison carries an f32 fusion-order budget well
    # inside the 1e-3 parity target.  See PARITY.md.
    lm = accel.build_leaf_map(tree)
    fast, overflow, _ = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=0)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(img),
                               atol=1e-4)


def test_big_aerial_fixture_golden():
    """Mill-19-scale artifact (VERDICT r2 item 7): >= 100k chunks of
    realistic aerial occupancy written through the independent svox
    writer.  Too large to commit — regenerated deterministically into
    tests/fixtures/.cache when absent (vectorized builder, ~8 s) —
    while the 160x160 EXACT-render golden PNG is committed and pins the
    output across rounds.  Asserts load, scale, exact-vs-golden PSNR,
    and fast-path PSNR/parity on the large real-schema file."""
    import sys
    sys.path.insert(0, FIXTURES)
    import gen_fixtures
    from mega_nerf_viewer_tpu.ops.render import render_frame, to_rgba8
    from mega_nerf_viewer_tpu.ops import accel

    if not os.path.exists(gen_fixtures.BIG_CACHE):
        gen_fixtures.make_big_scene_npz()
    tree = N3Tree.open(gen_fixtures.BIG_CACHE)
    assert int(tree.capacity) >= 100_000
    assert tree.data_format.to_string() == "SH4"

    cam = gen_fixtures.aerial_camera()
    opt = RenderOptions(background_brightness=0.9)
    img, _ = render_frame(tree, cam.width, cam.height, cam.fx, cam.fy,
                          cam.cx, cam.cy, jnp.asarray(cam.transform), opt)
    got = np.asarray(to_rgba8(img)).astype(np.float32) / 255.0
    want = read_png(os.path.join(
        FIXTURES, "aerial_sh4_d9_golden.png")) / 255.0
    # exact vs committed golden: 8-bit quantization alone sits ~55 dB;
    # a small margin tolerates cross-platform libm 1-ulp drift in the
    # generated field
    assert psnr(got, want) > 48.0
    # fast path on the 175k-chunk artifact: same frame within the f32
    # fusion-order budget (PARITY.md), PSNR effectively exact
    lm = accel.build_leaf_map(tree)
    fast, overflow, _ = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=0)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(img),
                               atol=1e-4)
    assert psnr(np.asarray(fast)[..., :3],
                np.asarray(img)[..., :3]) > 60.0


def test_big_aerial_fixture_golden_512():
    """512x512 PSNR pin on the Mill-19-scale artifact (VERDICT r3
    item 6): the committed golden was rendered by the EXACT path at
    512^2 (tests/fixtures/aerial_sh4_d9_golden512.png, generator run
    2026-08-19); this test renders the FAST production path at the
    same pose and asserts PSNR — pinning both the output across
    rounds and the fast-vs-exact agreement at real-artifact scale
    (exact-vs-golden sits ~55 dB at 8-bit quantization; fast-vs-exact
    ~60 dB, so the combined bound is comfortably above 45)."""
    import sys
    sys.path.insert(0, FIXTURES)
    import gen_fixtures
    from mega_nerf_viewer_tpu.ops import accel

    if not os.path.exists(gen_fixtures.BIG_CACHE):
        gen_fixtures.make_big_scene_npz()
    tree = N3Tree.open(gen_fixtures.BIG_CACHE)

    base = gen_fixtures.aerial_camera()
    cam = Camera(512, 512, base.fx * 512.0 / 160.0)
    cam.center = np.array([-0.9, 1.1, 1.5], np.float32)
    cam.v_back = cam.center / np.linalg.norm(cam.center)
    cam._update()
    opt = RenderOptions(background_brightness=0.9)
    lm = accel.build_leaf_map(tree)
    fast, overflow, _ = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=0)
    assert not bool(overflow)
    from mega_nerf_viewer_tpu.ops.render import to_rgba8
    got = np.asarray(to_rgba8(jnp.asarray(fast))).astype(np.float32) / 255.0
    want = read_png(os.path.join(
        FIXTURES, "aerial_sh4_d9_golden512.png")) / 255.0
    assert psnr(got, want) > 45.0


def test_vq_fixture_decodes():
    """VQ codebook variant decodes; n_basis == 1 is the case where the
    reference's write-index behavior is exact (n3tree.cpp:145,161), so
    decoded colors match the original payload to codebook precision."""
    tree = N3Tree.open(os.path.join(FIXTURES, "digger_vq.npz"))
    assert tree.data_dim == 4
    cap = int(tree.capacity)
    data = np.asarray(tree.data[:cap], np.float32)
    assert np.isfinite(data).all()
    assert (data[..., 3] > 1.0).any()         # sigma channel present
    # decode == codebook[map] exactly (n3tree.cpp:109-175, nq == 1)
    npz = np.load(os.path.join(FIXTURES, "digger_vq.npz"))
    want = np.asarray(npz["quant_colors"][0], np.float32)[
        npz["quant_map"][0].astype(np.int64)]
    np.testing.assert_array_equal(data[..., :3], want)
    np.testing.assert_array_equal(
        data[..., 3], np.asarray(npz["sigma"], np.float32).reshape(cap, 8))
    # bug-compat and corrected layouts agree for n_basis == 1
    tree2 = N3Tree.open(os.path.join(FIXTURES, "digger_vq.npz"),
                        vq_bug_compat=False)
    np.testing.assert_array_equal(
        np.asarray(tree.data[: int(tree.capacity)]),
        np.asarray(tree2.data[: int(tree2.capacity)]))


def test_torchscript_container_golden():
    """The genuine TorchScript container (8-layer skip MLP submodules,
    full attr set) converts with verification — no eager-torch fallback
    — and drives a guided-sampling frame end to end."""
    from mega_nerf_viewer_tpu.models import MegaNeRFModel
    from mega_nerf_viewer_tpu import Viewer
    import torch

    path = os.path.join(FIXTURES, "meganerf_8x64.pt")
    model = MegaNeRFModel.from_torchscript(path)
    assert model._torch_modules is None, "conversion fell back to torch"
    assert model.n_clusters == 4
    assert model.need_viewdir and model.need_appearance_embedding
    assert model.params.skips == (4,)

    # converted forward matches the TorchScript graph per cluster
    x = np.random.RandomState(0).randn(16, 7).astype(np.float32)
    container = torch.jit.load(path)
    for c in range(4):
        with torch.inference_mode():
            want = getattr(container, f"sub_module_{c}")(
                torch.from_numpy(x), False).numpy()
        got = np.asarray(model.query_device(np.full(16, c), x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # end-to-end guided frame on the real-schema VQ tree (SH1 — matches
    # the container's data_dim+1 output contract, cuda_renderer.cpp:492)
    tree = N3Tree.open(os.path.join(FIXTURES, "digger_vq.npz"))
    v = Viewer(tree)
    v.camera = _golden_camera()
    v.model = model
    v.options = v.options.replace(
        use_guided_sampling=True, need_viewdir=True,
        appearance_embedding=0, max_guided_samples=16,
        basis_minmax=(0, 0))
    img = v.render()
    assert img.shape == (160, 160, 4)
    assert np.isfinite(img).all()
