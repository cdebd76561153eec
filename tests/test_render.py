"""Renderer correctness: vectorized lax renderer vs scalar numpy oracle,
plus closed-form single-voxel checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import (
    N3Tree, DataFormat, sphere_tree, random_tree)
from mega_nerf_viewer_tpu.ops import oracle
from mega_nerf_viewer_tpu.ops.render import (
    render_rays, render_frame, composite_background)
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues


def _make_rays(camera, opt):
    dirs, cen = screen2worlddir(
        camera.width, camera.height, camera.fx, camera.fy,
        camera.cx, camera.cy, jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    return dirs, vdirs, cen


def _small_camera(w=16, h=16, fx=20.0):
    cam = Camera(w, h, fx)
    cam._update()
    return cam


def _compare(tree, opt, cam, atol=2e-5, frac_ok=0.999):
    dirs, vdirs, cen = _make_rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt)
    got = np.asarray(res.out)
    host = oracle.tree_to_host(tree)
    dirs_np, vdirs_np, cen_np = (np.asarray(dirs), np.asarray(vdirs),
                                 np.asarray(cen))
    want = np.zeros_like(got)
    want_split = np.zeros((len(dirs_np), 3), np.float32)
    want_sample = np.zeros((len(dirs_np), 3), np.float32)
    for i in range(len(dirs_np)):
        out, sv, pv, _ = oracle.trace_ray(host, dirs_np[i], vdirs_np[i],
                                          cen_np, opt)
        want[i] = out
        want_split[i] = sv
        want_sample[i] = pv
    err = np.abs(got - want).max(axis=-1)
    # allow rare boundary-precision diffs; bulk must match tightly
    assert np.mean(err < atol) >= frac_ok, (
        f"err quantiles: {np.quantile(err, [0.5, 0.99, 1.0])}")
    # votes: compare where pixel colors matched (boundary rays may differ)
    ok = err < atol
    np.testing.assert_array_equal(np.asarray(res.split_vote)[ok],
                                  want_split[ok])
    np.testing.assert_array_equal(np.asarray(res.sample_vote)[ok],
                                  want_sample[ok])
    return got, want


def test_single_voxel_closed_form():
    """1-chunk tree, ray straight through the center: analytic composite."""
    sigma = 5.0
    basis_dim = 1
    data = np.zeros((1, 8, 4), np.float16)
    data[..., 3] = sigma
    data[..., 0] = 1.0   # R dc coeff
    child = np.zeros((1, 8), np.int32)
    parent = np.zeros(1, np.int32)
    tree = N3Tree.from_arrays(
        data, child, parent, np.full(3, 0.5, np.float32),
        np.full(3, 0.5, np.float32), DataFormat("SH", 1))
    opt = RenderOptions(stop_thresh=1e-9, step_size=1e-9,
                        background_brightness=0.0)
    # ray along +x through the cube center
    dirs = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    cen = jnp.asarray([-2.0, 0.0, 0.0], jnp.float32)
    res = render_rays(tree, dirs, dirs, cen, opt)
    out = np.asarray(res.out)[0]
    # total optical depth: world path length 2.0 through [-1,1] cube,
    # delta_scale converts tree-steps to world length
    alpha_expect = 1.0 - np.exp(-2.0 * sigma)
    assert abs(out[3] - alpha_expect) < 1e-3
    # color: sigmoid(SH0 * c0) * alpha
    c = 1.0 / (1.0 + np.exp(-0.28209479177387814 * 1.0))
    assert abs(out[0] - c * alpha_expect) < 1e-3
    assert abs(out[1] - 0.5 * alpha_expect) < 1e-3   # zero coeff -> 0.5


def test_matches_oracle_sphere_sh1():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = _small_camera()
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    got, want = _compare(tree, opt, cam)
    assert np.asarray(got)[:, 3].max() > 0.5   # actually hit something


def test_matches_oracle_sphere_sh9():
    tree = sphere_tree(basis_dim=9, depth=3)
    opt = RenderOptions()
    cam = _small_camera(12, 12, 16.0)
    _compare(tree, opt, cam)


def test_matches_oracle_random_tree():
    tree = random_tree(n_chunks=80, basis_dim=4, seed=7, density=1.0)
    opt = RenderOptions()
    cam = _small_camera(12, 12, 14.0)
    _compare(tree, opt, cam)


def test_matches_oracle_depth_mode():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions(render_depth=True)
    cam = _small_camera(10, 10, 14.0)
    _compare(tree, opt, cam)


def test_matches_oracle_rgba_format():
    tree = random_tree(n_chunks=40, basis_dim=4, seed=5)
    tree = N3Tree(
        data=tree.data, child=tree.child, parent=tree.parent,
        sample_counts=tree.sample_counts, scale=tree.scale,
        offset=tree.offset, capacity=tree.capacity,
        N=tree.N, data_dim=tree.data_dim,
        data_format=DataFormat("RGBA", -1))
    opt = RenderOptions()
    cam = _small_camera(8, 8, 10.0)
    _compare(tree, opt, cam)


def test_matches_oracle_render_bbox():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions(render_bbox=(0.25, 0.0, 0.25, 0.9, 0.8, 1.0))
    cam = _small_camera(10, 10, 14.0)
    _compare(tree, opt, cam)


def test_matches_oracle_rot_dirs():
    tree = sphere_tree(basis_dim=4, depth=3)
    opt = RenderOptions(rot_dirs=(0.3, -0.2, 0.1))
    cam = _small_camera(8, 8, 12.0)
    _compare(tree, opt, cam)


def test_matches_oracle_basis_minmax():
    tree = sphere_tree(basis_dim=9, depth=3)
    opt = RenderOptions(basis_minmax=(1, 5))
    cam = _small_camera(8, 8, 12.0)
    _compare(tree, opt, cam)


def test_miss_rays_background():
    tree = sphere_tree(basis_dim=1, depth=2)
    opt = RenderOptions(background_brightness=0.75)
    # camera pointing away from the volume
    cam = _small_camera(4, 4, 8.0)
    cam.center = np.array([5.0, 0.0, 0.0], np.float32)
    cam.v_back = np.array([-1.0, 0.0, 0.0], np.float32)  # looking +x
    cam._update()
    dirs, vdirs, cen = _make_rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt)
    img = np.asarray(composite_background(res.out, opt))
    np.testing.assert_allclose(img[:, :3], 0.75, atol=1e-6)
    np.testing.assert_allclose(img[:, 3], 0.0, atol=1e-6)


def test_visit_tracking():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = _small_camera(8, 8, 12.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _make_rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt, track_visit=True)
    visited = np.asarray(res.visited)
    assert visited[0] == 1
    # oracle's visited set must be a subset of ours (plus root)
    host = oracle.tree_to_host(tree)
    expect = set()
    d_np, v_np, c_np = np.asarray(dirs), np.asarray(vdirs), np.asarray(cen)
    for i in range(len(d_np)):
        _, _, _, vis = oracle.trace_ray(host, d_np[i], v_np[i], c_np, opt)
        expect.update(vis)
    got = set(np.nonzero(visited)[0].tolist())
    missing = expect - got
    assert len(missing) <= max(1, len(expect) // 100), missing


def test_render_frame_full():
    tree = sphere_tree(basis_dim=1, depth=3)
    opt = RenderOptions()
    cam = _small_camera(16, 16, 20.0)
    img, res = render_frame(
        tree, cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy,
        jnp.asarray(cam.transform), opt)
    assert img.shape == (16, 16, 4)
    want = oracle.render_image(tree, cam, opt)
    err = np.abs(np.asarray(img) - want).max(axis=-1)
    assert np.mean(err < 2e-5) >= 0.999
