"""Fast leaf-map renderer vs the exact renderer (which itself matches the
scalar oracle)."""

import numpy as np

import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import sphere_tree, random_tree
from mega_nerf_viewer_tpu.ops.render import render_rays
from mega_nerf_viewer_tpu.ops import accel
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues


def _rays(cam, opt):
    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy, jnp.asarray(cam.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    return dirs, vdirs, cen


def _cam(w=16, h=16, fx=20.0):
    cam = Camera(w, h, fx)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    return cam


def _check(tree, opt, cam, level=None, chunk_size=0, atol=1e-6):
    lm = accel.build_leaf_map(tree, level=level)
    dirs, vdirs, cen = _rays(cam, opt)
    exact = render_rays(tree, dirs, vdirs, cen, opt)
    fast = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                  chunk_size=chunk_size)
    assert not bool(fast.overflow)
    np.testing.assert_allclose(np.asarray(fast.out),
                               np.asarray(exact.out), atol=atol)
    return lm


def test_leaf_map_full_coverage():
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    assert lm.deep_levels == 0
    assert lm.rows.shape == (lm.grid ** 3, 2)
    # no internal cells when map covers the full tree
    meta = np.asarray(lm.rows[:, 1])
    assert np.all((meta & accel._INTERNAL_BIT) == 0)


def test_fast_matches_exact_sh1():
    _check(sphere_tree(basis_dim=1, depth=3), RenderOptions(), _cam())


def test_fast_matches_exact_sh9():
    _check(sphere_tree(basis_dim=9, depth=3), RenderOptions(),
           _cam(12, 12, 16.0))


def test_fast_matches_exact_shallow_map():
    """Map at level 2 < tree depth: internal cells + resumed descent."""
    tree = sphere_tree(basis_dim=1, depth=4)
    lm = _check(tree, RenderOptions(), _cam(), level=2)
    assert lm.deep_levels > 0
    meta = np.asarray(lm.rows[:, 1])
    assert np.any((meta & accel._INTERNAL_BIT) != 0)


def test_fast_matches_exact_random_topology():
    _check(random_tree(n_chunks=80, basis_dim=4, seed=7, density=1.0),
           RenderOptions(), _cam(12, 12, 14.0), level=3)


def test_fast_matches_depth_mode():
    _check(sphere_tree(basis_dim=1, depth=3),
           RenderOptions(render_depth=True), _cam(10, 10, 14.0))


def test_fast_matches_bbox():
    _check(sphere_tree(basis_dim=1, depth=3),
           RenderOptions(render_bbox=(0.25, 0.0, 0.25, 0.9, 0.8, 1.0)),
           _cam(10, 10, 14.0))


def test_fast_chunked_matches():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = _cam(16, 16, 20.0)
    _check(tree, opt, cam, chunk_size=64)


def test_render_frame_fast():
    tree = sphere_tree(basis_dim=4, depth=3)
    opt = RenderOptions(background_brightness=0.5)
    cam = _cam(20, 20, 26.0)
    lm = accel.build_leaf_map(tree)
    img, overflow, steps = accel.render_frame_fast(tree, lm, cam, opt,
                                                   chunk_size=128, block=8)
    assert steps.shape == (400,)
    assert int(steps.max()) > 0
    assert img.shape == (20, 20, 4)
    assert not bool(overflow)
    from mega_nerf_viewer_tpu.ops.render import render_frame
    want, _ = render_frame(tree, cam.width, cam.height, cam.fx, cam.fy,
                           cam.cx, cam.cy, jnp.asarray(cam.transform), opt)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want),
                               atol=1e-6)


def test_overflow_flag():
    """A tree dense everywhere with tiny sigma -> many dense samples."""
    tree = sphere_tree(basis_dim=1, depth=4, sigma_inside=0.02)
    # sigma 0.02 > thresh 0.01, but tiny -> no early termination
    opt = RenderOptions()
    cam = _cam(4, 4, 6.0)
    lm = accel.build_leaf_map(tree)
    dirs, vdirs, cen = _rays(cam, opt)
    fast = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                  max_dense=2)
    assert bool(fast.overflow)


def test_block_permutation_inverse():
    perm, inv = accel.block_permutation(9, 7, block=4)
    p = np.asarray(perm)
    i = np.asarray(inv)
    assert sorted(p.tolist()) == list(range(63))
    np.testing.assert_array_equal(p[i], np.arange(63))


def test_tree_max_depth():
    assert accel.tree_max_depth(sphere_tree(basis_dim=1, depth=3)) == 3
    assert accel.tree_max_depth(sphere_tree(basis_dim=1, depth=4)) == 4


def test_fast_votes_match_exact():
    """need_votes=True reproduces the exact march's split/sample votes."""
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions(max_depth=4, max_sample_count=256)
    cam = _cam(14, 14, 18.0)
    lm = accel.build_leaf_map(tree)
    dirs, vdirs, cen = _rays(cam, opt)
    exact = render_rays(tree, dirs, vdirs, cen, opt)
    fast = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                  need_votes=True)
    np.testing.assert_array_equal(np.asarray(fast.split_vote),
                                  np.asarray(exact.split_vote))
    np.testing.assert_array_equal(np.asarray(fast.sample_vote),
                                  np.asarray(exact.sample_vote))
    np.testing.assert_allclose(np.asarray(fast.out),
                               np.asarray(exact.out), atol=1e-6)
    # chunked variant too
    fast2 = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                   need_votes=True, chunk_size=49)
    np.testing.assert_array_equal(np.asarray(fast2.split_vote),
                                  np.asarray(exact.split_vote))


def _oversubdivided_tree():
    """Fully subdivided to depth 3 but dense only in a small ball —
    the over-subdivided-empty-space case the turbo map targets."""
    from mega_nerf_viewer_tpu.n3tree import build_host_tree, N3Tree

    def depth_map(vc, d):
        return d < 3

    def data_fn(vc, size):
        out = np.zeros(4, np.float32)
        if np.linalg.norm(vc - 0.5) < 0.15:
            out[-1] = 50.0
            out[0] = 1.0
        return out

    host = build_host_tree(depth_map, data_fn, 4, 1)
    return N3Tree.from_arrays(*host)


def test_turbo_leaf_map_close_and_fewer_steps():
    """Max-empty-cube map: near-identical image, fewer march steps."""
    tree = _oversubdivided_tree()
    opt = RenderOptions()
    cam = _cam(20, 20, 26.0)
    dirs, vdirs, cen = _rays(cam, opt)
    lm = accel.build_leaf_map(tree)
    turbo = accel.build_turbo_leaf_map(tree, sigma_thresh=opt.sigma_thresh)
    exact = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt)
    fast = accel.render_rays_fast(tree, turbo, dirs, vdirs, cen, opt)
    # drift bounded by skipped step_size epsilons (sub-1e-3)
    np.testing.assert_allclose(np.asarray(fast.out),
                               np.asarray(exact.out), atol=2e-3)
    # over-subdivided empty space collapses into big cube steps
    assert int(fast.steps.sum()) < 0.6 * int(exact.steps.sum())
    # well-pruned trees are unchanged-or-better, never worse
    t2 = sphere_tree(basis_dim=1, depth=4)
    lm2 = accel.build_leaf_map(t2)
    tb2 = accel.build_turbo_leaf_map(t2)
    e2 = accel.render_rays_fast(t2, lm2, dirs, vdirs, cen, opt)
    f2 = accel.render_rays_fast(t2, tb2, dirs, vdirs, cen, opt)
    assert int(f2.steps.sum()) <= int(e2.steps.sum())
    np.testing.assert_allclose(np.asarray(f2.out),
                               np.asarray(e2.out), atol=2e-3)


def test_turbo_map_occupied_depths_unchanged():
    import jax.numpy as jnp
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    turbo = accel.build_turbo_leaf_map(tree)
    meta_a = np.asarray(lm.rows[:, 1])
    meta_b = np.asarray(turbo.rows[:, 1])
    sigma = np.asarray(accel._f16_bits_to_f32(
        jnp.asarray((meta_a >> 16) & 0xFFFF)))
    occupied = sigma > 1e-2
    # occupied cells: identical meta; empty cells: depth can only shrink
    np.testing.assert_array_equal(meta_a[occupied], meta_b[occupied])
    d_a = meta_a & 31
    d_b = meta_b & 31
    assert np.all(d_b[~occupied] <= d_a[~occupied])
    # non-depth bits preserved everywhere
    np.testing.assert_array_equal(meta_a & ~np.int32(31),
                                  meta_b & ~np.int32(31))
    np.testing.assert_array_equal(np.asarray(lm.rows[:, 0]),
                                  np.asarray(turbo.rows[:, 0]))


def test_fast_tmax_bg_parity():
    """Background-depth bound (mesh composite input) in the fast path."""
    import jax.numpy as jnp
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = _cam(10, 10, 14.0)
    dirs, vdirs, cen = _rays(cam, opt)
    lm = accel.build_leaf_map(tree)
    tb = jnp.full((dirs.shape[0],), 2.2, jnp.float32)
    exact = render_rays(tree, dirs, vdirs, cen, opt, tmax_bg=tb)
    fast = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                  tmax_bg=tb)
    np.testing.assert_allclose(np.asarray(fast.out),
                               np.asarray(exact.out), atol=1e-6)


def test_viewer_turbo_flag():
    from mega_nerf_viewer_tpu import Viewer, Camera, RenderOptions
    tree = sphere_tree(basis_dim=1, depth=3)
    cam = _cam(12, 12, 16.0)
    v1 = Viewer(tree, camera=cam)
    img1 = v1.render()
    cam2 = _cam(12, 12, 16.0)
    v2 = Viewer(tree, camera=cam2)
    v2.use_turbo_map = True
    img2 = v2.render()
    np.testing.assert_allclose(img2, img1, atol=2e-3)


def test_dynamic_knobs_match_static():
    """Traced continuous knobs produce the same pixels as static opts
    and reuse one compiled executable across knob values."""
    tree = sphere_tree(basis_dim=4, depth=3)
    cam = _cam(16, 16, 20.0)
    lm = accel.build_leaf_map(tree)
    variants = [
        RenderOptions(),
        RenderOptions(step_size=5e-4, sigma_thresh=0.2, stop_thresh=0.05,
                      background_brightness=0.4,
                      render_bbox=(0.1, 0.0, 0.1, 0.95, 1.0, 0.9)),
    ]
    for opt in variants:
        a, _, _ = accel.render_frame_fast(tree, lm, cam, opt,
                                          chunk_size=0)
        b, _, _ = accel.render_frame_fast(tree, lm, cam, opt,
                                          chunk_size=0,
                                          dynamic_knobs=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6)
    # no recompile across knob values (shared float-normalized static key)
    size_fn = getattr(accel.render_rays_fast, "_cache_size", None)
    if size_fn is not None:
        accel.render_frame_fast(tree, lm, cam,
                                RenderOptions(sigma_thresh=0.03),
                                chunk_size=0, dynamic_knobs=True)
        n0 = size_fn()
        for st in (0.07, 0.11, 0.123):
            accel.render_frame_fast(tree, lm, cam,
                                    RenderOptions(sigma_thresh=st),
                                    chunk_size=0, dynamic_knobs=True)
        assert size_fn() == n0


def test_segmented_frame_bit_equals_unsegmented():
    """Record-sorted segmented rendering only partitions rays across
    calls with different max_dense budgets — pixels must be IDENTICAL
    to a single-segment frame (and to the exact renderer by
    transitivity)."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    img1, seg_ov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 1), (0.25, 2), (0.25, 16)), chunk_size=cs)
    assert not bool(np.asarray(seg_ov).any())
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    # votes ride through segmentation identically
    imgv, seg_ovv, sv, pv = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 1), (0.25, 2), (0.25, 16)), chunk_size=cs,
        need_votes=True)
    _, _, _, sv0, pv0, _ = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        need_votes=True, return_nrec=True)
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(sv0))
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(pv0))


def test_group_sorted_frame_bit_equals_ray_sorted():
    """Group-of-g ordering (order_from_hints(group=g) + the grouped
    unpermute in _frame_core) only changes HOW rays are permuted and
    how the output moves back — pixels must be identical to the
    ray-granular segmented frame."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True, return_skips=True)
    assert not bool(ov0)
    segs = ((0.5, 2), (0.25, 4), (0.25, 16))
    order1 = accel.order_from_hints(steps, nrec, skips)
    img1, ov1 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order1, segments=segs, chunk_size=cs)
    assert not bool(np.asarray(ov1).any())
    for g in (2, 4):
        order_g = accel.order_from_hints(steps, nrec, skips, group=g)
        # structure check: groups move as units
        perm = np.asarray(order_g[0])
        assert (perm.reshape(-1, g)
                == perm.reshape(-1, g)[:, :1] + np.arange(g)).all()
        img_g, ov_g = accel.render_frame_fast_segmented(
            tree, lm, cam, opt, order=order_g, segments=segs,
            chunk_size=cs, group=g)
        assert not bool(np.asarray(ov_g).any())
        np.testing.assert_array_equal(np.asarray(img1),
                                      np.asarray(img_g))


def test_segmented_overflow_flags_per_segment():
    """A segment whose max_dense budget is too small must raise ITS
    overflow flag (callers escalate that segment only)."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    _, _, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    order = accel.order_from_hints(steps, nrec)
    assert np.asarray(nrec).max() > 1   # fixture records multiple
    # starve the tail segment: heaviest rays land there by construction
    _, seg_ov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 16), (0.5, 1)), chunk_size=cs)
    ov = np.asarray(seg_ov)
    assert ov[1] and not ov[0]


def test_entry_skip_prepass_bit_exact():
    """The Pallas entry-skip prepass advances t with the exact march's
    float math — whole frames must be BIT-identical with and without
    it, with strictly fewer march steps."""
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    tab = build_skip_table(tree, opt.sigma_thresh)
    a = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                chunk_size=256, block=16)
    b = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                chunk_size=256, block=16, skip_table=tab)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(np.asarray(b[2]).sum()) < int(np.asarray(a[2]).sum())
    # dynamic-knob mode rides through the prepass too
    c = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                chunk_size=256, block=16, skip_table=tab,
                                dynamic_knobs=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(c[0]),
                               atol=1e-6)


def test_skip_table_thresh_semantics():
    """A cell is skippable iff its (depth<=4) leaf has sigma <= the
    build threshold — the exact complement of the march's dense test,
    so a skipped step can never carry color."""
    from mega_nerf_viewer_tpu.ops.pallas_march import (
        build_skip_table, _GRID)
    tree = sphere_tree(basis_dim=1, depth=3)
    lo = np.asarray(build_skip_table(tree, 1e-2)).reshape(-1)
    hi = np.asarray(build_skip_table(tree, 1e9)).reshape(-1)
    def nskip(words):
        n = 0
        for w in words[:_GRID ** 3 // 8]:
            for j in range(8):
                n += (int(w) >> (4 * j + 3)) & 1
        return n
    # raising the threshold can only make MORE cells skippable
    assert nskip(hi) >= nskip(lo)
    assert nskip(hi) > 0


def test_entry_skip_deep_bits_bit_exact():
    """The level-5 and level-6 bit planes of the skip table engage on
    trees deeper than the nibble level (depth-5/6 empty leaves under
    internal level-4 cells) and the prepass stays bit-exact and
    strictly faster as each plane is enabled."""
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    tree = sphere_tree(basis_dim=1, depth=7)
    lm = accel.build_leaf_map(tree)
    cam = Camera(48, 48, 45.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    tab = np.asarray(build_skip_table(tree, opt.sigma_thresh))
    assert tab.shape == (80, 128)
    assert np.any(tab[8:16] != 0), "level-5 bit rows never engaged"
    assert np.any(tab[16:] != 0), "level-6 bit rows never engaged"
    # zero out the deep rows: pixels must match bit-for-bit, with
    # each deeper plane taking no more march steps
    def run(t):
        return accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                       chunk_size=256, block=16,
                                       skip_table=jnp.asarray(t))
    tab4 = tab.copy(); tab4[8:] = 0
    tab5 = tab.copy(); tab5[16:] = 0
    a = run(tab4)
    b = run(tab5)
    c = run(tab)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(c[0]))
    s4 = int(np.asarray(a[2]).sum())
    s5 = int(np.asarray(b[2]).sum())
    s6 = int(np.asarray(c[2]).sum())
    assert s5 <= s4 and s6 <= s5
    assert s6 < s4, "deep planes eliminated no steps"


def test_zero_record_segment():
    """max_dense == 0 segments: rays that record nothing render
    closed-form (no record buffers / shading gather) and stay
    pixel-identical; any dense sample in such a segment raises its
    overflow flag so stale hints escalate."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 24.0)   # wide FOV: many rays miss the sphere
    cam.center = np.array([-1.6, 0.3, 1.5], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, _, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    nrec_np = np.asarray(nrec)
    assert (nrec_np == 0).mean() > 0.25   # fixture has empty rays
    order = accel.order_from_hints(steps, nrec)
    # zero-record fraction sized under the true empty fraction
    frac0 = (np.floor((nrec_np == 0).mean() * 16) / 16) - 1 / 16
    img1, seg_ov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((frac0, 0), (1 - frac0, 16)), chunk_size=cs)
    assert not bool(np.asarray(seg_ov).any())
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    # oversized zero segment catches recording rays via overflow
    _, seg_ov2 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.875, 0), (0.125, 16)), chunk_size=cs)
    assert bool(np.asarray(seg_ov2)[0])


def test_device_order_matches_host():
    """order_from_hints_device == order_from_hints (same key packing,
    same stable sort) so the motion path's on-device rebuild is a pure
    transport optimization."""
    rng = np.random.default_rng(3)
    steps = rng.integers(0, 600, 5000).astype(np.int32)
    nrec = rng.integers(0, 20, 5000).astype(np.int32)
    skips = rng.integers(0, 600, 5000).astype(np.int32)
    ph, ih = accel.order_from_hints(steps, nrec, skips)
    pd, id_ = accel.order_from_hints_device(
        jnp.asarray(steps), jnp.asarray(nrec), jnp.asarray(skips))
    np.testing.assert_array_equal(np.asarray(pd), np.asarray(ph))
    np.testing.assert_array_equal(np.asarray(id_), np.asarray(ih))
    # 2-key variant (no skips)
    ph2, ih2 = accel.order_from_hints(steps, np.minimum(nrec, 255))
    # host 2-key packs (nrec<<12)|steps with wider caps — compare the
    # permutations' sort keys instead of exact ranks when caps differ:
    # here both under the caps, so the device 3-key with zero skips
    # must equal the host 3-key with zero skips
    ph3, ih3 = accel.order_from_hints(steps, nrec,
                                      np.zeros_like(steps))
    pd3, id3 = accel.order_from_hints_device(jnp.asarray(steps),
                                             jnp.asarray(nrec))
    np.testing.assert_array_equal(np.asarray(pd3), np.asarray(ph3))
    np.testing.assert_array_equal(np.asarray(id3), np.asarray(ih3))


def test_guided_device_order_matches_host():
    """order_from_ns_steps_device == order_from_hints(steps, ns) for
    guided ranges (ns < 64, steps < 4096): same (ns, steps) key order,
    same stable tie-break — the Viewer's on-device guided order rebuild
    is a pure transport optimization."""
    rng = np.random.default_rng(7)
    ns = rng.integers(0, 33, 5000).astype(np.int32)
    steps = rng.integers(0, 2000, 5000).astype(np.int32)
    ph, ih = accel.order_from_hints(steps, ns)
    pd, idv = accel.order_from_ns_steps_device(jnp.asarray(ns),
                                               jnp.asarray(steps))
    np.testing.assert_array_equal(np.asarray(pd), np.asarray(ph))
    np.testing.assert_array_equal(np.asarray(idv), np.asarray(ih))


def test_dilate_hints_and_cdf_segments():
    """dilate_hints = per-pixel neighborhood max within the window
    (wrap-around at edges is allowed to over-budget, never under), and
    segments_from_hint_cdf boundaries never exceed their class CDF —
    so with dilated (upper-bound) keys every class provably fits."""
    rng = np.random.default_rng(5)
    H, W = 16, 24
    nrec = rng.integers(0, 9, (H, W)).astype(np.int32)
    z = np.zeros_like(nrec)
    _, d, _ = accel.dilate_hints(
        jnp.asarray(z.reshape(-1)), jnp.asarray(nrec.reshape(-1)),
        jnp.asarray(z.reshape(-1)), width=W, height=H, window=2)
    d = np.asarray(d).reshape(H, W)
    assert (d >= nrec).all()                 # dilation only raises
    # interior pixels: exactly the (2*window-1)-ish neighborhood max
    # (doubling roll-max covers radius >= window-1 per axis)
    for y in range(2, H - 2):
        for x in range(2, W - 2):
            assert d[y, x] >= nrec[y - 1:y + 2, x - 1:x + 2].max()
    # CDF-derived fractions sit at or below their class CDF
    cdf = np.asarray(accel.hint_class_cdf(jnp.asarray(nrec.reshape(-1))))
    segs = accel.segments_from_hint_cdf(cdf, H * W)
    assert abs(sum(f for f, _ in segs) - 1.0) < 1e-9
    used = 0.0
    classes = (0, 1, 2, 4, 8)
    for (f, md) in segs[:-1]:
        used += f
        ci = classes.index(md)
        assert used * H * W <= cdf[ci] + 1e-9
    assert segs[-1][1] == 8


def test_cdf_segments_heavy_tail_keeps_ladder_boundary():
    """When the observed hint max exceeds the ladder top, classes[-1]
    must stay a REAL boundary and only the remainder pays the raised
    top budget.  The old merge rendered the whole final ladder class at
    the raised top — on the aerial artifact (hint max 18) that was 38%
    of frame rays at budget 32 instead of 8 (370 vs 217 ms measured)."""
    R = 2073600
    # counts for classes (0,1,2,4,8) + trailing max, the measured
    # aerial_sh4_d9 histogram
    cdf = np.array([1199592, 1202712, 1204868, 1407083, 1986254, 18])
    segs = accel.segments_from_hint_cdf(cdf, R)
    assert abs(sum(f for f, _ in segs) - 1.0) < 1e-9
    # the 8-budget class must exist and cover the <=8 band
    by_md = dict((md, f) for f, md in segs)
    assert 8 in by_md and by_md[8] >= 0.25
    # only the small overflow remainder pays the raised top
    assert segs[-1][1] == 32 and segs[-1][0] <= 0.0625 + 1e-9
    # every boundary still sits at or below its class CDF
    used = 0.0
    classes = (0, 1, 2, 4, 8)
    for (f, md) in segs[:-1]:
        used += f
        assert used * R <= cdf[classes.index(md)] + 1e-9
    # scenes whose max fits the ladder are unchanged (top == classes[-1])
    cdf_light = np.array([1000, 1100, 1200, 1500, 2000, 8])
    segs_light = accel.segments_from_hint_cdf(cdf_light, 2000)
    assert segs_light[-1][1] == 8
    assert all(md in classes for _, md in segs_light)
    # headroom: the final REAL boundary class steps one ladder up,
    # capped at the raised top
    segs_h = accel.segments_from_hint_cdf(cdf, R, headroom=True)
    mds = [md for _, md in segs_h]
    assert mds[-1] == 32
    assert 16 in mds  # the <=8 class at one ladder step of headroom


def test_dilate_directional_windows():
    """A (wy, wx) window tuple dilates each image axis by its own
    reach (window-1 per direction, doubling roll-max): the anisotropic
    pool must equal a manual per-axis neighborhood max in the
    interior, for both the 3-array and the packed dilation."""
    rng = np.random.default_rng(11)
    H, W = 20, 32
    nrec = rng.integers(0, 9, (H, W)).astype(np.int32)
    z = np.zeros_like(nrec).reshape(-1)
    wy, wx = 2, 4
    _, d, _ = accel.dilate_hints(
        jnp.asarray(z), jnp.asarray(nrec.reshape(-1)), jnp.asarray(z),
        width=W, height=H, window=(wy, wx))
    d = np.asarray(d).reshape(H, W)
    ph = accel.pack_hints(jnp.asarray(z), jnp.asarray(nrec.reshape(-1)),
                          jnp.asarray(z))
    dp = np.asarray(accel.dilate_packed(
        ph, width=W, height=H, window=(wy, wx))).reshape(H, W) >> 18
    ry, rx = wy - 1, wx - 1                  # true reach per direction
    exp = np.array([[nrec[max(0, y - ry):y + ry + 1,
                          max(0, x - rx):x + rx + 1].max()
                     for x in range(rx, W - rx)]
                    for y in range(ry, H - ry)])
    np.testing.assert_array_equal(d[ry:H - ry, rx:W - rx], exp)
    np.testing.assert_array_equal(dp[ry:H - ry, rx:W - rx], exp)


def test_segmented_return_hints():
    """return_hints on the segmented frame returns the same pixel-order
    hints an unsegmented hint frame would (modulo per-segment nrec
    caps, which this fixture stays under)."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True, return_skips=True)
    order = accel.order_from_hints(steps, nrec, skips)
    img1, sov, s1, n1, k1 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 2), (0.25, 4), (0.25, 16)), chunk_size=cs,
        return_hints=True)
    assert not np.asarray(sov).any()
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(steps))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nrec))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(skips))


def test_segmented_packed_hints():
    """return_hints="packed" folds the three hint arrays into one i32
    (pack_hints layout) with identical pixels, and the packed rebuild
    chain (dilate_packed / hint_class_cdf_packed /
    order_from_packed_device) matches the 3-array chain where the
    contracts overlap: exact nrec field under dilation, identical CDF,
    identical class grouping in the rebuilt order."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, _, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True, return_skips=True)
    order = accel.order_from_hints(steps, nrec, skips)
    segs = ((0.5, 2), (0.25, 4), (0.25, 16))
    out = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs,
        return_hints="packed")
    img1, sov, ph = out
    assert not np.asarray(sov).any()
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
    np.testing.assert_array_equal(
        np.asarray(ph), np.asarray(accel.pack_hints(steps, nrec, skips)))
    # dilated nrec field == independently dilated nrec (exact max)
    dh3 = accel.dilate_hints(steps, nrec, skips, width=64, height=64,
                             window=4)
    dp = accel.dilate_packed(ph, width=64, height=64, window=4)
    np.testing.assert_array_equal(np.asarray(dp) >> 18,
                                  np.minimum(np.asarray(dh3[1]), 255))
    np.testing.assert_array_equal(
        np.asarray(accel.hint_class_cdf_packed(dp)),
        np.asarray(accel.hint_class_cdf(dh3[1])))
    # rebuilt order groups rays into the same nrec classes (the part
    # budgets depend on); secondary tie-break may differ by design
    perm3, inv3 = accel.order_from_hints_device(*dh3)
    permp, invp = accel.order_from_packed_device(dp)
    n_of = np.asarray(dh3[1])
    np.testing.assert_array_equal(n_of[np.asarray(perm3)],
                                  n_of[np.asarray(permp)])
    np.testing.assert_array_equal(
        np.asarray(permp)[np.asarray(invp)], np.arange(64 * 64))


def test_device_fallback_escalation():
    """device_fallback folds budget escalation into the compiled frame
    (XLA conditional): fresh budgets -> bit-identical to the plain
    segmented frame with fb_overflow False; starved budgets -> the
    frame is STILL correct (the cond re-marched at the cap on device)
    while seg_overflow reports staleness asynchronously."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    img0, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    segs = ((0.5, 1), (0.25, 2), (0.25, 16))
    img1, sov1 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs)
    assert not np.asarray(sov1).any()
    img2, sov2, fb2 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs,
        device_fallback=True)
    assert not np.asarray(sov2).any() and not bool(fb2)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    # starved budgets: flags fire but the frame stays correct
    img3, sov3, fb3 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.75, 0), (0.25, 1)), chunk_size=cs,
        device_fallback=True)
    assert np.asarray(sov3).any() and not bool(fb3)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img3))
    # votes ride through the fallback branch identically
    _, _, _, sv0, pv0, _ = accel.render_frame_fast(
        tree, lm, cam, RenderOptions(max_depth=5), max_dense=16,
        chunk_size=cs, block=16, need_votes=True, return_nrec=True)
    _, _, sv3, pv3, fbv = accel.render_frame_fast_segmented(
        tree, lm, cam, RenderOptions(max_depth=5), order=order,
        segments=((0.75, 0), (0.25, 1)), chunk_size=cs,
        need_votes=True, device_fallback=True)
    np.testing.assert_array_equal(np.asarray(sv3), np.asarray(sv0))
    np.testing.assert_array_equal(np.asarray(pv3), np.asarray(pv0))


def test_zero_record_segment_depth_mode():
    """Depth mode x zero-record segments: the reference writes alpha 1
    for EVERY ray in depth mode (rt_core.cuh:254-255, 297-298, 325-327;
    miss rays at :195) — the closed-form max_dense==0 composite must
    honor that, or the background leaks into depth renders for miss and
    empty rays (confirmed round-2 bug; empty rays never overflow, so
    escalation cannot catch it)."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 24.0)   # wide FOV: many rays miss the sphere
    cam.center = np.array([-1.6, 0.3, 1.5], np.float32)
    cam._update()
    opt = RenderOptions(render_depth=True, background_brightness=0.7)
    cs = 256
    img0, _, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    nrec_np = np.asarray(nrec)
    assert (nrec_np == 0).mean() > 0.25   # fixture has empty rays
    order = accel.order_from_hints(steps, nrec)
    frac0 = (np.floor((nrec_np == 0).mean() * 16) / 16) - 1 / 16
    img1, seg_ov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((frac0, 0), (1 - frac0, 16)), chunk_size=cs)
    assert not bool(np.asarray(seg_ov).any())
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    # the specific round-2 repro: every depth-mode pixel is opaque, so
    # the composited frame carries no background anywhere
    assert np.asarray(img1)[..., 3].min() == 1.0


def test_segment_chunks_floor_invariant():
    """Chunk boundaries must sit AT OR BELOW their cumulative ray
    fractions (the 'classes provably fit' contract): nearest-rounding
    pushed boundaries past CDF points whenever the 1/16-floor slack was
    under a chunk.  Zero-chunk slots are allowed; the last segment
    absorbs the remainder."""
    segs = ((0.125, 0), (0.3125, 1), (0.1875, 2), (0.125, 4), (0.25, 8))
    for R, cs in ((1728, 128), (2073600, 2176), (1000, 300)):
        n_chunks = (R + cs - 1) // cs
        counts = accel.segment_chunks(n_chunks, segs, n_rays=R,
                                      chunk_size=cs)
        assert len(counts) == len(segs)
        assert sum(c for c, _ in counts) == n_chunks
        cum_rays, cum_frac = 0, 0.0
        for (c, _), (f, _) in zip(counts[:-1], segs[:-1]):
            cum_rays += c * cs
            cum_frac += f
            assert cum_rays <= cum_frac * R + 1e-6, (R, cs, counts)
    # degenerate fewer-chunks-than-segments still sums correctly
    counts = accel.segment_chunks(3, segs)
    assert sum(c for c, _ in counts) == 3


def test_segmented_shard_body_zero_chunk_slot():
    """segmented_shard_body must skip zero-chunk layout slots (the
    ray-floor quantization can emit them mid-list) and keep the
    overflow vector aligned with the segment list."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.parallel.render import segmented_shard_body
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions()
    cs = 64
    seg_counts = ((1, 0), (0, 1), (2, 8))       # mid-list empty slot
    per = sum(c for c, _ in seg_counts) * cs
    cam = Camera(per, 1, 40.0)
    cam.center = np.array([-1.6, 0.2, 1.5], np.float32)
    cam._update()
    pix = jnp.arange(per, dtype=jnp.int32)
    out, ov = segmented_shard_body(
        tree, lm, pix, jnp.asarray(cam.transform),
        jnp.asarray((cam.fx, cam.fy, cam.cx, cam.cy), jnp.float32),
        jnp.asarray(opt.rot_dirs, jnp.float32), None,
        opt=opt, seg_counts=seg_counts, chunk_size=cs, width=per)
    assert out.shape == (per, 4)
    assert ov.shape == (len(seg_counts),)
    assert int(ov[1]) == 0                      # empty slot: no overflow


def test_fast_matches_exact_rgba_format():
    """Non-SH (RGBA) data format through the fast path: the deferred
    shading's no-sigmoid branch must match the exact renderer
    (rt_core.cuh:285-290 raw-coefficient composite)."""
    from mega_nerf_viewer_tpu.n3tree import N3Tree
    from mega_nerf_viewer_tpu.n3tree.data_format import DataFormat
    t = random_tree(n_chunks=60, basis_dim=4, seed=11, density=1.0)
    t = N3Tree(
        data=t.data, child=t.child, parent=t.parent,
        sample_counts=t.sample_counts, scale=t.scale, offset=t.offset,
        capacity=t.capacity, N=t.N, data_dim=t.data_dim,
        data_format=DataFormat("RGBA", -1))
    _check(t, RenderOptions(), _cam(10, 10, 14.0))


def test_fast_matches_exact_random_option_combos():
    """Randomized option COMBINATIONS (depth mode x bbox x thresholds x
    rot_dirs x basis trimming x background): each knob has its own
    parity test, but interaction bugs only show when they stack."""
    rng = np.random.RandomState(42)
    for trial in range(6):
        basis_dim = (1, 4, 9)[trial % 3]
        tree = random_tree(n_chunks=60, basis_dim=basis_dim,
                           seed=100 + trial, density=1.0)
        lo = float(rng.uniform(0.0, 0.2, 3).min())
        bbox = (lo, lo, lo) + tuple(rng.uniform(0.7, 1.0, 3))
        bmin = int(rng.randint(0, basis_dim))
        bmax = int(rng.randint(bmin, basis_dim))
        opt = RenderOptions(
            render_depth=bool(trial % 2),
            sigma_thresh=float(rng.choice([0.0, 1e-2, 0.3])),
            stop_thresh=float(rng.choice([0.0, 1e-2])),
            step_size=float(rng.choice([1e-4, 1e-3])),
            background_brightness=float(rng.rand()),
            render_bbox=tuple(float(b) for b in bbox),
            rot_dirs=tuple(float(r) for r in rng.randn(3) * 0.3),
            basis_minmax=(bmin, bmax))
        _check(tree, opt, _cam(8, 8, 10.0))


def test_sorted_output_matches_unpermuted():
    """``sorted_output`` skips the device-side unpermute and returns
    FLAT [R, 4] rows in perm order: ``flat[inv]`` must be BIT-identical
    to the pixel-order frame (the background composite is elementwise,
    so compositing in sorted space changes nothing) — for the plain
    segmented frame, under device_fallback, and through the
    small-frame degenerate path."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = Camera(64, 64, 60.0)
    cam.center = np.array([-1.3, 0.2, 1.2], np.float32)
    cam._update()
    opt = RenderOptions()
    cs = 256
    _, ov0, steps, nrec = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=16, chunk_size=cs, block=16,
        return_nrec=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec)
    inv = np.asarray(order[1])
    segs = ((0.5, 2), (0.25, 4), (0.25, 16))

    img, sov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs)
    flat, sov1 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs,
        sorted_output=True)
    assert flat.shape == (64 * 64, 4)
    assert not np.asarray(sov1).any()
    np.testing.assert_array_equal(
        np.asarray(flat)[inv].reshape(64, 64, 4), np.asarray(img))

    # device_fallback: both the untaken-cond frame and hints ride along
    flat2, sov2, fb2, s2, n2, k2 = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=cs,
        sorted_output=True, device_fallback=True, return_hints=True)
    assert not np.asarray(sov2).any() and not bool(fb2)
    np.testing.assert_array_equal(
        np.asarray(flat2)[inv].reshape(64, 64, 4), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(steps))

    # small-frame degenerate path (n_chunks < len(segments)): same
    # perm-order contract
    img3, _ = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=4096)
    flat3, _ = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=segs, chunk_size=4096,
        sorted_output=True)
    assert flat3.shape == (64 * 64, 4)
    np.testing.assert_array_equal(
        np.asarray(flat3)[inv].reshape(64, 64, 4), np.asarray(img3))
