"""Grid overlay rendering and interactive keymap semantics."""

import numpy as np

from mega_nerf_viewer_tpu import Viewer, RenderOptions, Camera
from mega_nerf_viewer_tpu.n3tree import sphere_tree
from mega_nerf_viewer_tpu.utils.wireframe import rasterize_boxes


def _viewer(w=24, h=24, **opt_kw):
    tree = sphere_tree(basis_dim=1, depth=3)
    cam = Camera(w, h, 30.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    return Viewer(tree, camera=cam, options=RenderOptions(**opt_kw))


def test_rasterize_boxes_depth_and_color():
    cam = Camera(32, 32, 40.0)
    cam.center = np.array([-3.0, 0.0, 0.0], np.float32)
    cam.v_back = np.array([-1.0, 0.0, 0.0], np.float32)
    cam._update()
    boxes = np.array([[-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]], np.float32)
    color, depth = rasterize_boxes(boxes, cam, color=(1.0, 0.0, 0.0))
    hit = depth < 1e9
    assert hit.any()
    # nearest box plane is 2 world units away; depth is Euclidean distance
    assert depth[hit].min() >= 2.0 - 1e-3
    assert depth[hit].max() <= np.sqrt(4 ** 2 + 2 * 2 ** 2) + 1e-2
    np.testing.assert_array_equal(color[hit][:, 0], 1.0)


def test_grid_render_changes_pixels():
    v = _viewer(show_grid=True, grid_max_depth=2,
                background_brightness=1.0)
    img_grid = v.render()
    v.options = v.options.replace(show_grid=False)
    img_plain = v.render()
    # grid lines are black on the white background -> some pixels darker
    assert (img_grid[..., :3] < img_plain[..., :3] - 0.2).any()
    assert img_grid.shape == img_plain.shape


def test_key_movement():
    v = _viewer()
    c0 = v.camera.center.copy()
    v.key_event("w")
    assert not np.allclose(v.camera.center, c0)
    v.key_event("s")
    np.testing.assert_allclose(v.camera.center, c0, atol=1e-6)
    v.key_event("d", shift=True)
    moved = np.linalg.norm(v.camera.center - c0)
    assert abs(moved - 0.01) < 1e-6   # 0.002 * 5


def test_key_toggles():
    v = _viewer()
    assert not v.options.use_splitting
    v.key_event("m")
    assert v.options.use_splitting
    v.key_event("r")
    assert v.options.use_guided_sampling
    g0 = v.options.grid_max_depth
    v.key_event("g")
    assert v.options.grid_max_depth == g0 + 1
    v.key_event("f")
    assert v.options.grid_max_depth == g0


def test_key_focal_and_up():
    v = _viewer()
    fx0 = v.camera.fx
    v.key_event("-")
    assert v.camera.fx < fx0
    v.key_event("0")
    assert v.camera.fx == v.camera.default_fx
    v.key_event("3")
    np.testing.assert_array_equal(v.camera.v_world_up, [0, 1, 0])


def test_mouse_orbit_and_scroll():
    v = _viewer()
    back0 = v.camera.v_back.copy()
    v.mouse_button("left", True, 10.0, 10.0)
    assert v.camera.is_dragging()
    v.cursor(14.0, 10.0)
    v.mouse_button("left", False, 14.0, 10.0)
    assert not v.camera.is_dragging()
    assert not np.allclose(v.camera.v_back, back0)
    c0 = v.camera.center.copy()
    v.scroll(1.0)
    assert not np.allclose(v.camera.center, c0)
