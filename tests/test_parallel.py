"""Multi-chip sharding on the 8-device virtual CPU mesh: sharded render
equals single-device render; tp MLP equals dense MLP; the full jitted
frame+refine step runs and grows the tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import sphere_tree
from mega_nerf_viewer_tpu.models import MegaNeRFModel
from mega_nerf_viewer_tpu.models.meganerf import mlp_forward_all
from mega_nerf_viewer_tpu.ops.render import render_rays
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues
from mega_nerf_viewer_tpu import parallel


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _rays(cam, opt):
    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy, jnp.asarray(cam.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    return dirs, vdirs, cen


def test_sharded_render_matches_single(eight_devices):
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = Camera(16, 16, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    res_sharded = parallel.render_rays_sharded(
        tree, dirs, vdirs, cen, opt, mesh, track_visit=True)
    res_single = render_rays(tree, dirs, vdirs, cen, opt, track_visit=True)
    np.testing.assert_allclose(np.asarray(res_sharded.out),
                               np.asarray(res_single.out), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_sharded.split_vote),
                                  np.asarray(res_single.split_vote))
    np.testing.assert_array_equal(np.asarray(res_sharded.visited),
                                  np.asarray(res_single.visited))


def test_render_frame_sharded_pads_nondivisible(eight_devices):
    tree = sphere_tree(basis_dim=1, depth=2)
    opt = RenderOptions()
    cam = Camera(9, 7, 10.0)   # 63 rays, not divisible by 8
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    img = parallel.render_frame_sharded(tree, cam, opt, mesh)
    assert img.shape == (7, 9, 4)
    assert np.isfinite(np.asarray(img)).all()


def test_tp_mlp_matches_dense(eight_devices, rng):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import functools

    model = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4,
                                    hidden=32, n_layers=4, seed=3)
    mesh = parallel.make_mesh((4, 2),
                              (parallel.RAY_AXIS, parallel.MODEL_AXIS),
                              eight_devices)
    x = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 4, 64).astype(np.int32))
    pspecs = parallel.tp_param_specs(model.params)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspecs, P(parallel.RAY_AXIS), P(parallel.RAY_AXIS)),
        out_specs=P(parallel.RAY_AXIS), check_vma=False)
    def tp_apply(p, cid, xx):
        return parallel.mlp_forward_all_tp(p, cid, xx)

    got = np.asarray(tp_apply(model.params, ids, x))
    want = np.asarray(mlp_forward_all(model.params, ids, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frame_refine_step(eight_devices):
    tree = sphere_tree(basis_dim=1, depth=3, max_capacity=2000)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, hidden=16, n_layers=4,
        grid_dim=(2, 2), min_position=(-2, -2, -2), max_position=(2, 2, 2))
    opt = RenderOptions(use_splitting=True, split_batch_size=16,
                        samples_per_corner=8)
    mesh = parallel.make_mesh((4, 2),
                              (parallel.RAY_AXIS, parallel.MODEL_AXIS),
                              eight_devices)
    step = parallel.make_frame_refine_step(mesh, opt)
    cam = Camera(16, 16, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    tracker = jnp.zeros((tree.max_capacity,), jnp.int32).at[0].set(1)
    out, new_tree, tracker, n_added = step(
        tree, model.params,
        jnp.asarray(model.grid_dim, jnp.int32),
        jnp.asarray(model.min_position, jnp.float32),
        jnp.asarray(model.range, jnp.float32),
        dirs, vdirs, cen, tracker, jax.random.PRNGKey(0))
    assert out.shape == (16 * 16, 4)
    assert int(n_added) > 0
    assert int(new_tree.capacity) == int(tree.capacity) + int(n_added)
    # refined tree renders fine
    res = render_rays(new_tree, dirs, vdirs, cen, opt)
    assert np.isfinite(np.asarray(res.out)).all()


def test_expand_jit_matches_host_policy():
    """Device-side vote aggregation selects the same nodes as the host
    aggregation (same count>1 / most-voted-first policy)."""
    from mega_nerf_viewer_tpu.ops import refine
    votes = np.array([
        [2, 5, 1], [2, 5, 1], [2, 5, 1],
        [1, 3, 0], [1, 3, 0],
        [2, 7, 2], [2, 7, 2],
        [4, 9, 3],
        [9, -1, -1],
    ], np.float32)
    host = refine.aggregate_split_votes(votes, 8)
    nodes, prio, valid = refine.aggregate_split_votes_device(
        jnp.asarray(votes), 8, 8)
    nodes = np.asarray(nodes)[np.asarray(valid)]
    got = np.stack([nodes // 8, nodes % 8], axis=1)
    np.testing.assert_array_equal(got, host)


def test_fast_sharded_matches_single(eight_devices):
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=4, depth=3)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions(background_brightness=0.3)
    cam = Camera(16, 16, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    img, overflow = parallel.render_frame_fast_sharded(
        tree, lm, cam, opt, mesh)
    assert not bool(overflow)
    lm2 = accel.build_leaf_map(tree)
    img1, ov1, _ = accel.render_frame_fast(tree, lm2, cam, opt,
                                           chunk_size=0)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img1),
                               atol=1e-6)


def test_cli_sharded_smoke(tmp_path, eight_devices):
    from mega_nerf_viewer_tpu.cli import main
    tree = sphere_tree(basis_dim=1, depth=2)
    npz = str(tmp_path / "t.npz")
    tree.save_npz(npz)
    out = str(tmp_path / "s.png")
    rc = main([npz, "-w", "16", "--height", "16", "--fx", "16",
               "--center=-1.5,0.1,1.4", "--sharded", "-o", out])
    assert rc == 0
    from mega_nerf_viewer_tpu.utils import read_png
    assert read_png(out).shape == (16, 16, 4)


def test_guided_frame_sharded_matches_single():
    """Sharded guided pipeline (collect/compact/MLP/composite local per
    shard) == the single-device compact path, pixel for pixel."""
    from mega_nerf_viewer_tpu import parallel
    from mega_nerf_viewer_tpu.ops import accel, guided
    from mega_nerf_viewer_tpu.models import MegaNeRFModel
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1),
        need_viewdir=True)
    opt = RenderOptions(max_guided_samples=16, need_viewdir=True,
                        use_guided_sampling=True)
    cam = Camera(16, 16, 18.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    mesh = parallel.make_mesh((4,), (parallel.RAY_AXIS,),
                              jax.devices()[:4])
    img_s, overflow = parallel.guided_frame_sharded(
        tree, lm, model, cam, opt, mesh, budget=1 << 12)
    assert not overflow
    cache = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                          chunk_size=0)
    img_1 = guided.composite_frame(tree, cam, opt, cache)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1),
                               atol=1e-5)
    # under-budget shards raise the overflow flag
    _, overflow2 = parallel.guided_frame_sharded(
        tree, lm, model, cam, opt, mesh, budget=1)
    assert overflow2


def test_fast_sharded_with_skip_table():
    """The sharded fast march accepts the Pallas skip table (interpret
    mode on CPU) and matches the unsharded path."""
    from mega_nerf_viewer_tpu import parallel
    from mega_nerf_viewer_tpu.ops import accel
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions()
    tab = build_skip_table(tree, opt.sigma_thresh)
    cam = Camera(16, 16, 18.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    mesh = parallel.make_mesh((4,), (parallel.RAY_AXIS,),
                              jax.devices()[:4])
    img_s, ov = parallel.render_frame_fast_sharded(
        tree, lm, cam, opt, mesh, max_dense=16, skip_table=tab)
    assert not bool(ov)
    img_1 = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                    chunk_size=0, skip_table=tab)[0]
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1),
                               atol=1e-6)


def test_fast_segmented_sharded_1080p_equality(eight_devices):
    """Full 1080p-shaped sharded-vs-single equality on the virtual
     8-mesh (VERDICT r2: the small-frame tests can't catch
    shape-dependent sharding bugs — padding, chunk dealing and the
    inverse-permutation index math all change character at 1920x1080).
    Shallow tree keeps CPU march cost tractable; equality is exact."""
    from mega_nerf_viewer_tpu import parallel
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=2)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions()
    cam = Camera(1920, 1080, 1111.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()
    img0, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=8, chunk_size=0, return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    # zero segment sized under the measured empty fraction (chunk
    # dealing spreads sorted chunks across shards, so keep a margin)
    frac0 = max(0.0,
                np.floor((np.asarray(nrec) == 0).mean() * 16) / 16 - 0.125)
    segments = ((frac0, 0), (1.0 - frac0 - 0.25, 2), (0.25, 8))
    # production dealing granularity (2176) — 1080p does not divide it,
    # exercising the pad path at the real shape
    img_s, seg_ov = parallel.render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order,
        segments=segments, mesh=mesh,
        chunk_size=2176)
    assert not np.asarray(seg_ov).any()
    a, b = np.asarray(img_s), np.asarray(img0)
    assert a.shape == (1080, 1920, 4)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fast_segmented_sharded_matches_single():
    """Stride-dealt segmented sharded frame == unsegmented fast frame
    (per-shard budgets sized like the single-device segments)."""
    from mega_nerf_viewer_tpu import parallel
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions()
    cam = Camera(32, 32, 24.0)
    cam.center = np.array([-1.6, 0.3, 1.5], np.float32)
    cam._update()
    img0, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=64, block=8,
        return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    mesh = parallel.make_mesh((4,), (parallel.RAY_AXIS,),
                              jax.devices()[:4])
    img_s, seg_ov = parallel.render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 2), (0.25, 4), (0.25, 16)), mesh=mesh,
        chunk_size=64)
    assert not np.asarray(seg_ov).any()
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img0),
                               atol=1e-5)
    # starving every budget flags overflow
    _, seg_ov2 = parallel.render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 0), (0.25, 0), (0.25, 1)), mesh=mesh,
        chunk_size=64)
    assert np.asarray(seg_ov2).any()


def test_multihost_broadcast_and_sharded_frame(tmp_path):
    """Multi-HOST capability (SURVEY §5 distributed-backend row): two
    jax.distributed CPU processes (4 virtual devices each) broadcast
    the tree from process 0 over the coordinator link, render one
    frame with rays sharded over the 8-device GLOBAL mesh, and both
    hold the full replicated image — equal to the single-process
    render.  Process 1 starts with a deliberately wrong tree, so
    equality proves the broadcast carried real data."""
    import socket
    import subprocess
    import sys as _sys
    import os as _os
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    worker = _os.path.join(root, "tests", "mh_worker.py")
    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(port), str(pid), str(tmp_path)],
        cwd=root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    a = np.load(str(tmp_path / "mh_0.npy"))
    b = np.load(str(tmp_path / "mh_1.npy"))
    ref = np.load(str(tmp_path / "mh_ref.npy"))
    np.testing.assert_array_equal(a, b)       # replicated output
    # cross-shape f32 fusion-order budget (PARITY.md), not bit-exact
    np.testing.assert_allclose(a, ref, atol=1e-4)
    assert a[..., 3].max() > 0.5              # broadcast tree is opaque
    # guided pipeline over the global mesh (weights broadcast from p0)
    ga = np.load(str(tmp_path / "mhg_0.npy"))
    gb = np.load(str(tmp_path / "mhg_1.npy"))
    gref = np.load(str(tmp_path / "mhg_ref.npy"))
    np.testing.assert_array_equal(ga, gb)
    np.testing.assert_allclose(ga, gref, atol=1e-3)


def test_fast_segmented_sharded_sorted_output():
    """Sorted output on the sharded frame: shard-dealt rows + index map
    recover the pixel-order sharded frame BIT-exactly, with no
    cross-chip unpermute in the device program (the composite is
    elementwise and shard-local)."""
    from mega_nerf_viewer_tpu import parallel
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions()
    cam = Camera(32, 32, 24.0)
    cam.center = np.array([-1.6, 0.3, 1.5], np.float32)
    cam._update()
    _, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=64, block=8,
        return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    mesh = parallel.make_mesh((4,), (parallel.RAY_AXIS,),
                              jax.devices()[:4])
    segs = ((0.5, 2), (0.25, 4), (0.25, 16))
    img, seg_ov = parallel.render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order, segments=segs, mesh=mesh,
        chunk_size=64)
    rows, seg_ov2, idx = parallel.render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order, segments=segs, mesh=mesh,
        chunk_size=64, sorted_output=True)
    assert not np.asarray(seg_ov2).any()
    np.testing.assert_array_equal(
        np.asarray(rows)[np.asarray(idx)].reshape(32, 32, 4),
        np.asarray(img))


def test_motion_rehint_sharded_matches_single(eight_devices):
    """Sharded re-hint motion pose (parallel/motion.py): on clean
    (no-overflow) poses the frame equals the plain fast frame, the
    measured CDF matches the single-chip motion core bit-exactly
    (pooled-quarter x4 parity), and the quarter order re-deal stays a
    permutation of the quarter pixels.  The only data collective is
    the quarter-key psum — everything else is shard-local, which is
    what the v5e-8 motion projection divides by."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=4, depth=4)
    opt = RenderOptions()
    cam = Camera(64, 48, 70.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    lm = accel.build_leaf_map(tree)
    R = 64 * 48
    _, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=0,
        return_nrec=True, return_skips=True)
    assert not bool(ov0)
    ph = accel.pack_hints(steps, nrec, skips)
    perm, inv = accel.order_from_packed_device(ph)
    qperm = accel.quarter_order_from_packed(ph, width=64)
    cdf0 = np.asarray(accel.hint_class_cdf(jnp.asarray(nrec)))
    # margin=2: on this tiny scene one quantum is only 192 rays, so a
    # second quantum absorbs the sub-sample features small frames hit
    # (1080p uses margin=1; overflow there is the async tolerance's
    # job, see PERFORMANCE.md)
    segs = accel.segments_from_hint_cdf(cdf0, R, margin=2,
                                        top_headroom=True)
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    pix_str, qpix_str = parallel.motion_episode_layout(
        (perm, inv), qperm, mesh=mesh, chunk_size=64, hint_chunk=32)
    qsp = qperm
    for step_i, pose in enumerate([(-1.45, 0.12, 1.35),
                                   (-1.42, 0.14, 1.38)]):
        cam.center = np.array(pose, np.float32)
        cam._update()
        img_s, seg_ov, qpix_str, cdf_s = \
            parallel.render_frame_motion_sharded(
                tree, lm, cam, opt, qpix_str, pix_str, segs,
                mesh=mesh, chunk_size=64, hint_chunk=32)
        _, seg_ov_1, _, cdf_1, qsp = accel.render_frame_motion(
            tree, lm, cam, opt, qsp, segments=segs, chunk_size=64,
            hint_stride=2)
        assert not np.asarray(seg_ov).any(), (step_i, np.asarray(seg_ov))
        assert not np.asarray(seg_ov_1).any()
        # measured-CDF parity with the single-chip motion core
        np.testing.assert_array_equal(np.asarray(cdf_s),
                                      np.asarray(cdf_1))
        ref, *_ = accel.render_frame_fast(
            tree, lm, cam, opt, max_dense=16, chunk_size=0,
            return_nrec=True)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(ref),
                                   atol=1e-5)
        # the carried quarter deal remains a permutation of the
        # quarter pixels (plus dealt padding sentinels)
        qp = np.asarray(qpix_str)
        real = np.sort(qp[qp < (1 << 30)])
        np.testing.assert_array_equal(real, np.sort(np.asarray(qperm)))


def test_motion_sharded_sorted_output_roundtrip(eight_devices):
    """sorted_output mode: flat shard-dealt sorted rows + the pixel-id
    map recover the pixel-order frame exactly (the display-consumer
    contract of the steady sorted path, extended to motion)."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = Camera(32, 24, 24.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    lm = accel.build_leaf_map(tree)
    R = 32 * 24
    _, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=0,
        return_nrec=True, return_skips=True)
    ph = accel.pack_hints(steps, nrec, skips)
    perm, inv = accel.order_from_packed_device(ph)
    qperm = accel.quarter_order_from_packed(ph, width=32)
    segs = ((0.5, 2), (0.5, 16))
    mesh = parallel.make_mesh((8,), (parallel.RAY_AXIS,), eight_devices)
    pix_str, qpix_str = parallel.motion_episode_layout(
        (perm, inv), qperm, mesh=mesh, chunk_size=16, hint_chunk=16)
    cam.center = np.array([-1.45, 0.12, 1.38], np.float32)
    cam._update()
    img_px, seg_ov, _, _ = parallel.render_frame_motion_sharded(
        tree, lm, cam, opt, qpix_str, pix_str, segs, mesh=mesh,
        chunk_size=16, hint_chunk=16)
    rows, pix_sorted, seg_ov2, _, _ = parallel.render_frame_motion_sharded(
        tree, lm, cam, opt, qpix_str, pix_str, segs, mesh=mesh,
        chunk_size=16, hint_chunk=16, sorted_output=True)
    # consumer-side remap: scatter rows at their pixel ids, drop pads
    rows = np.asarray(rows)
    pid = np.asarray(pix_sorted)
    out = np.zeros((R, 4), np.float32)
    out[pid[pid < R]] = rows[pid < R]
    np.testing.assert_array_equal(out.reshape(24, 32, 4),
                                  np.asarray(img_px))
