"""Guided sampling: collection march + NeRF-results compositor vs scalar
numpy transliterations of get_samples_trace_ray (rt_core.cuh:418-576) and
composite_nerf_results (rt_core.cuh:334-416)."""

import numpy as np

import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import sphere_tree
from mega_nerf_viewer_tpu.models import MegaNeRFModel
from mega_nerf_viewer_tpu.ops import oracle, guided
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues
from mega_nerf_viewer_tpu.ops.sh import eval_sh_basis

f32 = np.float32


def _rays(cam, opt):
    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy, jnp.asarray(cam.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    return dirs, vdirs, cen


def _guided_oracle(host, dir_w, vdir, cen_w, opt, grid_dim, min_pos, rng_):
    """Scalar transliteration of get_samples_trace_ray."""
    scale = np.asarray(host["scale"], f32)
    offset = np.asarray(host["offset"], f32)
    N = host["N"]
    data = host["data"]
    child = host["child"]
    data_dim = data.shape[-1]

    cen = offset + scale * np.asarray(cen_w, f32)
    d = np.asarray(dir_w, f32) * scale
    ds = f32(1.0) / np.linalg.norm(d).astype(f32)
    d = d * ds
    invdir = (f32(1.0) / (d + f32(1e-9))).astype(f32)
    tmin, tmax = oracle.dda_world(cen, invdir, opt.render_bbox)
    rows, cids = [], []
    if tmax < 0 or tmin > tmax:
        return rows, cids
    T = f32(1.0)
    t = f32(tmin)
    while t < tmax:
        pos = (cen + t * d).astype(f32)
        chunk, cidx, depth, frac, _ = oracle.query_single_from_root(
            child, pos, N)
        cube = f32(N) ** f32(depth)
        dt = oracle.dda_unit(frac, invdir) / cube + f32(opt.step_size)
        sigma = f32(data[chunk, cidx, data_dim - 1])
        if sigma > f32(opt.sigma_thresh):
            att = np.exp(f32(-dt * ds * sigma)).astype(f32)
            if len(rows) < opt.max_guided_samples:
                tz = (t * d) / scale
                z = np.linalg.norm(tz.astype(f32)).astype(f32)
                p = np.asarray(cen_w, f32) + np.asarray(dir_w, f32) * z
                row = [z, p[0], p[1], p[2]]
                if opt.need_viewdir:
                    row += list(vdir)
                if opt.appearance_embedding != -1:
                    row.append(opt.appearance_embedding)
                rows.append(np.asarray(row, f32))
                g1 = int(max(min((p[1] - min_pos[1]) / rng_[1] * grid_dim[0],
                                 grid_dim[0] - 1.0), 0.0))
                g2 = int(max(min((p[2] - min_pos[2]) / rng_[2] * grid_dim[1],
                                 grid_dim[1] - 1.0), 0.0))
                cids.append(g1 * grid_dim[1] + g2)
            T = T * att
            if T < f32(opt.stop_thresh):
                break
        t = t + dt
    return rows, cids


def test_collect_samples_matches_oracle():
    tree = sphere_tree(basis_dim=1, depth=3)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    opt = RenderOptions(max_guided_samples=32)
    cam = Camera(10, 10, 14.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    col = guided.collect_samples(
        tree, dirs, vdirs, cen,
        jnp.asarray(model.grid_dim, jnp.int32),
        jnp.asarray(model.min_position, jnp.float32),
        jnp.asarray(model.range, jnp.float32), opt)
    host = oracle.tree_to_host(tree)
    d_np, v_np, c_np = map(np.asarray, (dirs, vdirs, cen))
    ns = np.asarray(col.num_samples)
    samples = np.asarray(col.samples)
    ids = np.asarray(col.cluster_ids)
    n_match = 0
    for i in range(len(d_np)):
        rows, cids = _guided_oracle(host, d_np[i], v_np[i], c_np, opt,
                                    model.grid_dim, model.min_position,
                                    model.range)
        if len(rows) != ns[i]:
            continue
        if len(rows) == 0:
            n_match += 1
            continue
        want = np.stack(rows)
        got = samples[i, :len(rows)]
        if np.allclose(got, want, atol=2e-4) and \
                np.array_equal(ids[i, :len(rows)], cids):
            n_match += 1
    assert n_match >= 0.98 * len(d_np), f"{n_match}/{len(d_np)}"
    assert ns.max() > 2   # non-trivial


def _composite_oracle(samples_vals, z_vals, opt, basis, basis_dim):
    """Scalar transliteration of composite_nerf_results."""
    out = np.zeros(4, f32)
    out[3] = 1.0
    n = len(z_vals)
    if n == 0:
        return out
    ti = f32(1.0)
    wc = f32(1.0)
    for i in range(n):
        if i < n - 1:
            delta = f32(z_vals[i + 1] - z_vals[i])
            wc = np.exp(f32(-samples_vals[i][3] * delta)).astype(f32)
            w = ti * (f32(1.0) - wc)
        else:
            w = ti
        if opt.render_depth:
            out[0] += w * ti
        else:
            for c in range(3):
                tmp = f32(np.dot(basis,
                                 samples_vals[i][c * basis_dim:
                                                 (c + 1) * basis_dim]))
                out[c] += w / (f32(1.0) + np.exp(-tmp))
        ti = ti * wc
    if opt.render_depth:
        out[0] = out[1] = out[2] = min(out[0] * f32(0.3), f32(1.0))
    return out


def test_composite_results_matches_oracle(rng):
    R, S, basis_dim = 24, 16, 1
    out_dim = 3 * basis_dim + 2   # data_dim + 1
    opt = RenderOptions()
    results = rng.randn(R, S, out_dim).astype(f32)
    results[..., 3] = np.abs(results[..., 3]) * 3   # sigma >= 0
    z = np.sort(rng.rand(R, S).astype(f32) * 2, axis=1)
    ns = rng.randint(0, S + 1, R).astype(np.int32)
    vdirs = rng.randn(R, 3).astype(f32)
    vdirs /= np.linalg.norm(vdirs, axis=-1, keepdims=True)
    got = np.asarray(guided.composite_results(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, basis_dim, True))
    for i in range(R):
        basis = np.asarray(eval_sh_basis(basis_dim, vdirs[i])).astype(f32)
        want = _composite_oracle(results[i, :ns[i]], z[i, :ns[i]], opt,
                                 basis, basis_dim)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_composite_depth_mode(rng):
    R, S = 8, 8
    opt = RenderOptions(render_depth=True)
    results = np.abs(rng.randn(R, S, 5).astype(f32))
    z = np.sort(rng.rand(R, S).astype(f32), axis=1)
    ns = np.full(R, S, np.int32)
    vdirs = np.tile(np.array([[0, 0, 1]], f32), (R, 1))
    got = np.asarray(guided.composite_results(
        jnp.asarray(results), jnp.asarray(z), jnp.asarray(ns),
        jnp.asarray(vdirs), opt, 1, True))
    for i in range(R):
        basis = np.asarray(eval_sh_basis(1, vdirs[i])).astype(f32)
        want = _composite_oracle(results[i], z[i], opt, basis, 1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_collect_and_query_end_to_end():
    tree = sphere_tree(basis_dim=1, depth=3)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    opt = RenderOptions(max_guided_samples=16, use_guided_sampling=True)
    cam = Camera(8, 8, 12.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    cache, res = guided.collect_and_query(tree, model, cam, opt)
    img = guided.composite_frame(tree, cam, opt, cache)
    img = np.asarray(img)
    assert img.shape == (8, 8, 4)
    assert np.all(img[..., 3] == 1.0)       # alpha forced to 1
    assert np.isfinite(img).all()
    # rays with samples should have non-trivial color
    ns = np.asarray(cache["num_samples"]).reshape(8, 8)
    assert ns.max() > 0
    # MLP results for valid slots should be nonzero somewhere
    r = np.asarray(cache["results"])
    assert np.abs(r).max() > 0


def test_fast_collection_matches_exact():
    """Leaf-map t-recording collection == the exact collection march."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=3)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1),
        need_viewdir=True)
    opt = RenderOptions(max_guided_samples=32, need_viewdir=True,
                        rot_dirs=(0.1, -0.05, 0.2))
    cam = Camera(10, 10, 14.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)

    cache_exact, _ = guided.collect_and_query(tree, model, cam, opt)
    cache_fast = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                               chunk_size=0)
    np.testing.assert_array_equal(
        np.asarray(cache_fast["num_samples"]),
        np.asarray(cache_exact["num_samples"]))
    ns = np.asarray(cache_exact["num_samples"])
    S = np.asarray(cache_exact["z_vals"]).shape[1]
    valid = np.arange(S)[None, :] < ns[:, None]
    total = int(ns.sum())
    # compact layout is ray-major: valid rows align with padded[valid]
    np.testing.assert_allclose(
        np.asarray(cache_fast["z_c"])[:total],
        np.asarray(cache_exact["z_vals"])[valid], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cache_fast["results_c"])[:total],
        np.asarray(cache_exact["results"])[valid], rtol=1e-4, atol=1e-4)
    # composited frames agree (padded cumprod vs compact segmented scan)
    img_a = np.asarray(guided.composite_frame(tree, cam, opt, cache_exact))
    img_b = np.asarray(guided.composite_frame(tree, cam, opt, cache_fast))
    np.testing.assert_allclose(img_a, img_b, atol=1e-4)
    # (the padded-layout Pallas compositor is reference-only and no
    # longer routed by composite_frame; it stays validated directly in
    # tests/test_pallas.py)


def test_fast_collection_appearance_embedding():
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=3)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1),
        need_appearance_embedding=True)
    opt = RenderOptions(max_guided_samples=16, appearance_embedding=3)
    cam = Camera(8, 8, 12.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)
    cache_exact, _ = guided.collect_and_query(tree, model, cam, opt)
    cache_fast = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                               chunk_size=0)
    np.testing.assert_array_equal(
        np.asarray(cache_fast["num_samples"]),
        np.asarray(cache_exact["num_samples"]))
    ns = np.asarray(cache_exact["num_samples"])
    S = np.asarray(cache_exact["z_vals"]).shape[1]
    valid = np.arange(S)[None, :] < ns[:, None]
    np.testing.assert_allclose(
        np.asarray(cache_fast["results_c"])[:int(ns.sum())],
        np.asarray(cache_exact["results"])[valid], rtol=1e-4, atol=1e-4)


def _pixel_rows(cache, total):
    """Compact (z, results) rows in pixel-ray order regardless of the
    cache's internal layout: ordered caches stay in SORTED ray space
    (rank k = ray order_perm[k]) to avoid the wide [R, S] unpermute;
    restore pixel order here for comparisons."""
    z = np.asarray(cache["z_c"])[:total]
    res = np.asarray(cache["results_c"])[:total]
    if "order_perm" in cache:
        rop = np.asarray(cache["ray_of_p"])[:total]
        pix = np.asarray(cache["order_perm"])[rop]
        o = np.argsort(pix, kind="stable")
        z, res = z[o], res[o]
    return z, res


def test_ordered_collect_identical():
    """collect_t_fast/collect_and_query_fast with a cost-sorted ray
    order produce outputs identical to the unordered call (ordering is
    pure perf — march chunks change, records don't)."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=4)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    opt = RenderOptions(max_guided_samples=16)
    cam = Camera(24, 18, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)

    a = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                      chunk_size=64)
    order = accel.order_from_hints(
        np.zeros(cam.width * cam.height, np.int32), a["num_samples"])
    b = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                      chunk_size=64, order=order)
    np.testing.assert_array_equal(np.asarray(a["num_samples"]),
                                  np.asarray(b["num_samples"]))
    total = int(np.asarray(a["num_samples"]).sum())
    za, ra = _pixel_rows(a, total)
    zb, rb = _pixel_rows(b, total)
    np.testing.assert_array_equal(za, zb)
    np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-5)
    # end-to-end: the sorted-space cache composites to the same frame
    # (exercises the perm/inv restore in _composite_frame_compact_jit)
    img_a = np.asarray(guided.composite_frame(tree, cam, opt, a))
    img_b = np.asarray(guided.composite_frame(tree, cam, opt, b))
    np.testing.assert_allclose(img_a, img_b, rtol=1e-5, atol=1e-5)


def test_segmented_collect_identical_and_escalates():
    """CDF-budget segmented collect (render-path treatment applied to
    collection): hint-cheap ray classes march with reduced record
    buffers (zero class with none) — records identical; stale hints
    (a ray exceeding its class budget) raise that segment's overflow
    and the caller escalates that class only, still converging to
    identical records."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=4)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    opt = RenderOptions(max_guided_samples=16)
    cam = Camera(32, 24, 7.0)   # wide FOV: many rays miss the sphere
    cam.center = np.array([-1.8, 0.3, 1.7], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)

    a = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                      chunk_size=64)
    ns = np.asarray(a["num_samples"])
    order = accel.order_from_hints(np.zeros(ns.shape[0], np.int32), ns)
    segs = guided.segments_from_ns_hints(ns, opt.max_guided_samples)
    assert segs[0][1] == 0 and segs[0][0] > 0.1, \
        "fixture should have a real zero class"
    assert len(segs) >= 3, "fixture should spread over several classes"
    b = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                      chunk_size=64, order=order,
                                      segments=segs)
    np.testing.assert_array_equal(ns, np.asarray(b["num_samples"]))
    total = int(ns.sum())
    np.testing.assert_array_equal(_pixel_rows(a, total)[0],
                                  _pixel_rows(b, total)[0])
    # stale hints: push the whole frame into starved classes — the
    # per-segment escalation must still produce identical records
    R = ns.shape[0]
    bad_order = accel.order_from_hints(np.zeros(R, np.int32),
                                       np.zeros(R, np.int32))
    c = guided.collect_and_query_fast(
        tree, lm, model, cam, opt, chunk_size=64, order=bad_order,
        segments=((0.5, 0), (0.4, 1), (0.1, 16)))
    np.testing.assert_array_equal(ns, np.asarray(c["num_samples"]))
    total = int(ns.sum())
    np.testing.assert_array_equal(_pixel_rows(a, total)[0],
                                  _pixel_rows(c, total)[0])


def test_speculative_budget_identical():
    """collect_and_query_fast with a budget_hint (speculative fused
    dispatch ahead of the stats fetch) must produce outputs identical
    to the unhinted call, for an adequate hint (speculation lands), an
    undersized hint (redo at the true budget), and under escalation
    (speculation discarded with the stale t-buffer)."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=1, depth=4)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1))
    opt = RenderOptions(max_guided_samples=16)
    cam = Camera(24, 18, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)

    a = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                      chunk_size=64)
    ns = np.asarray(a["num_samples"])
    total = int(ns.sum())
    order = accel.order_from_hints(np.zeros(ns.shape[0], np.int32), ns)
    segs = guided.segments_from_ns_hints(ns, opt.max_guided_samples)
    base = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                         chunk_size=64, order=order,
                                         segments=segs)
    assert base["budget_hint_next"] >= total
    for hint in (base["budget_hint_next"], 1):   # adequate, undersized
        b = guided.collect_and_query_fast(
            tree, lm, model, cam, opt, chunk_size=64, order=order,
            segments=segs, budget_hint=hint)
        np.testing.assert_array_equal(ns, np.asarray(b["num_samples"]))
        np.testing.assert_array_equal(_pixel_rows(base, total)[0],
                                      _pixel_rows(b, total)[0])
        np.testing.assert_allclose(_pixel_rows(base, total)[1],
                                   _pixel_rows(b, total)[1],
                                   rtol=0, atol=1e-6)
    # escalation path: starved classes force a re-collect; the
    # speculative results from the truncated buffer must be discarded
    c = guided.collect_and_query_fast(
        tree, lm, model, cam, opt, chunk_size=64, order=order,
        segments=((0.5, 0), (0.4, 1), (0.1, 16)),
        budget_hint=base["budget_hint_next"])
    np.testing.assert_array_equal(ns, np.asarray(c["num_samples"]))
    np.testing.assert_array_equal(_pixel_rows(base, total)[0],
                                  _pixel_rows(c, total)[0])


def test_composite_route_gate_on_viewdir_change():
    """The auto-routed Pallas compact compositor shades with COLLECT-
    time per-sample viewdirs (cache["vdirs_c"]); once rot_dirs (or the
    camera) moves after collection, the route gate must fall back to
    the XLA path, which re-evaluates SH from the CURRENT view
    directions every composite — the reference recomputes per-frame
    (rt_core.cuh:334-416), so a rot_dirs change must be visible even
    on a cached collection."""
    from mega_nerf_viewer_tpu.ops import accel
    tree = sphere_tree(basis_dim=4, depth=3)
    model = MegaNeRFModel.synthetic(
        data_dim=13, n_clusters=4, grid_dim=(2, 2),
        min_position=(-1, -1, -1), max_position=(1, 1, 1),
        need_viewdir=True)
    opt = RenderOptions(max_guided_samples=16, need_viewdir=True)
    cam = Camera(12, 10, 14.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    lm = accel.build_leaf_map(tree)
    cache = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                          chunk_size=0)
    assert "vdirs_sig" in cache
    base = np.asarray(guided.composite_frame(tree, cam, opt, cache))
    opt2 = opt.replace(rot_dirs=(0.35, -0.2, 0.1))
    auto = np.asarray(guided.composite_frame(tree, cam, opt2, cache))
    xla = np.asarray(guided.composite_frame(tree, cam, opt2, cache,
                                            use_pallas=False))
    np.testing.assert_array_equal(auto, xla)     # gate took the XLA route
    assert not np.array_equal(auto, base)        # rot_dirs change visible


def test_collect_t_fast_ordered_with_overflow():
    """order= + with_overflow=True must return the overflow flag (the
    ordered non-segmented branch used to silently drop it, so callers
    unpacked the steps array as the flag)."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.ops import accel
    from mega_nerf_viewer_tpu.ops.rays import screen2worlddir
    tree = sphere_tree(basis_dim=1, depth=3)
    lm = accel.build_leaf_map(tree)
    opt = RenderOptions(max_guided_samples=8)
    cam = Camera(8, 8, 10.0)
    cam.center = np.array([-1.5, 0.1, 1.4], f32)
    cam._update()
    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy,
                                jnp.asarray(cam.transform))
    t_u, ns_u = guided.collect_t_fast(tree, lm, dirs, cen, opt)
    R = dirs.shape[0]
    perm = jnp.arange(R - 1, -1, -1, dtype=jnp.int32)     # reverse
    order = (perm, perm)                                   # own inverse
    out = guided.collect_t_fast(tree, lm, dirs, cen, opt, order=order,
                                with_overflow=True)
    assert len(out) == 3
    t_o, ns_o, ov = out
    assert np.asarray(ov).shape == ()
    np.testing.assert_array_equal(np.asarray(ns_o), np.asarray(ns_u))
    np.testing.assert_allclose(np.asarray(t_o), np.asarray(t_u),
                               atol=1e-6)


def test_compact_composite_rgba_format():
    """fmt_sh=False (RGBA family): the compact segmented-scan composite
    must take the raw-coefficient branch (weight * res[:, :3], no
    sigmoid — rt_core.cuh:402-407) and match the padded compositor."""
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    R, S, out_dim = 40, 8, 4
    ns = rng.randint(0, S + 1, R).astype(np.int32)
    M = 2048
    assert int(ns.sum()) <= M
    offs = np.cumsum(ns).astype(np.int32)
    ray_of_p = np.clip(np.searchsorted(offs, np.arange(M), "right"),
                       0, R - 1).astype(np.int32)
    res_flat = rng.randn(M, out_dim).astype(np.float32)
    res_flat[:, 3] = np.abs(res_flat[:, 3]) * 3
    z = np.sort(rng.rand(M).astype(np.float32) * 2)
    vd = rng.randn(R, 3).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    opt = RenderOptions()
    got = np.asarray(guided.composite_results_compact(
        jnp.asarray(res_flat), jnp.asarray(z), jnp.asarray(ray_of_p),
        jnp.asarray(offs), jnp.asarray(ns), jnp.asarray(vd),
        opt, 1, False))
    # padded reference: scatter the compact rows into [R, S]
    res_p = np.zeros((R, S, out_dim), np.float32)
    z_p = np.zeros((R, S), np.float32)
    for r in range(R):
        lo = 0 if r == 0 else offs[r - 1]
        res_p[r, :ns[r]] = res_flat[lo:lo + ns[r]]
        z_p[r, :ns[r]] = z[lo:lo + ns[r]]
    want = np.asarray(guided.composite_results(
        jnp.asarray(res_p), jnp.asarray(z_p), jnp.asarray(ns),
        jnp.asarray(vd), opt, 1, False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_guided_fast_matches_exact_option_combos():
    """Randomized option combinations through BOTH guided collectors:
    the compact fast pipeline must reproduce the exact path's sample
    counts and composited pixels when viewdir/appearance/bbox/budget
    knobs stack."""
    from mega_nerf_viewer_tpu.ops import accel
    rng = np.random.RandomState(9)
    for trial in range(3):
        basis_dim = (1, 4)[trial % 2]
        tree = sphere_tree(basis_dim=basis_dim, depth=3)
        need_vd = bool(trial % 2)
        app = -1 if trial == 0 else 2
        data_dim = 3 * basis_dim + 1
        model = MegaNeRFModel.synthetic(
            data_dim=data_dim, n_clusters=4, grid_dim=(2, 2),
            min_position=(-2, -2, -2), max_position=(2, 2, 2),
            need_viewdir=need_vd,
            need_appearance_embedding=app != -1)
        opt = RenderOptions(
            max_guided_samples=int(rng.choice([4, 16])),
            need_viewdir=need_vd,
            appearance_embedding=app,
            sigma_thresh=float(rng.choice([0.0, 1e-2])),
            rot_dirs=tuple(float(r) for r in rng.randn(3) * 0.2),
            background_brightness=float(rng.rand()))
        cam = Camera(10, 8, 12.0)
        cam.center = np.array([-1.5, 0.1, 1.4], f32)
        cam._update()
        lm = accel.build_leaf_map(tree)
        exact, _ = guided.collect_and_query(tree, model, cam, opt)
        fast = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                             chunk_size=0)
        np.testing.assert_array_equal(
            np.asarray(fast["num_samples"]),
            np.asarray(exact["num_samples"]), err_msg=f"trial {trial}")
        img_e = np.asarray(guided.composite_frame(tree, cam, opt, exact))
        img_f = np.asarray(guided.composite_frame(tree, cam, opt, fast))
        np.testing.assert_allclose(img_f, img_e, atol=2e-4,
                                   err_msg=f"trial {trial}")
