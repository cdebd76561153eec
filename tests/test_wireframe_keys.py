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


def test_near_plane_clipping():
    """A segment with one endpoint behind the camera is CLIPPED at the
    near plane (GL clipper semantics, mesh.cpp draw path) — its visible
    part still rasterizes instead of being dropped."""
    from mega_nerf_viewer_tpu.utils.wireframe import draw_lines_cam
    cam = Camera(64, 64, 40.0)
    cam._update()   # pose irrelevant: inputs are camera-space
    h, w = 64, 64
    color = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), 1e9, np.float32)
    # camera looks along -z: p0 visible ahead, p1 behind the camera
    p0 = np.array([[0.0, 0.0, -2.0]], np.float32)
    p1 = np.array([[0.5, 0.0, +1.0]], np.float32)
    draw_lines_cam(color, depth, p0, p1, cam,
                   np.array([1.0, 0.0, 0.0], np.float32))
    assert (depth < 1e9).any(), "clipped segment drew nothing"
    # the fully-visible endpoint projects to the center and must be hit
    assert depth[32, 32] < 1e9
    # depth at the visible endpoint ~= its camera distance (2.0)
    assert abs(depth[32, 32] - 2.0) < 0.05
    # a segment fully behind still draws nothing
    depth2 = np.full((h, w), 1e9, np.float32)
    draw_lines_cam(np.zeros((h, w, 3), np.float32), depth2,
                   np.array([[0.0, 0.0, 1.0]], np.float32),
                   np.array([[0.5, 0.0, 2.0]], np.float32), cam,
                   np.zeros(3, np.float32))
    assert not (depth2 < 1e9).any()


def test_mesh_triangle_phong_and_depth():
    """Triangle rasterization with the reference shader's lighting
    (mesh.cpp:53-72): lit color == (ambient + diffuse + diffuse2 +
    spec) * vertex color, depth == length(FragPos)."""
    from mega_nerf_viewer_tpu.utils.mesh import Mesh
    cam = Camera(64, 64, 40.0)
    # pose the camera at the origin looking along -z so world == camera
    cam.center = np.zeros(3, np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam._update()
    tri = Mesh(face_size=3)
    n = np.array([0.0, 0.0, 1.0])
    verts = []
    for p in ([-1, -1, -3], [1, -1, -3], [0, 1, -3]):
        verts.append(np.concatenate([np.asarray(p, np.float32),
                                     [1.0, 1.0, 1.0], n]))
    tri.vert = np.stack(verts)
    color, depth = tri.draw(cam)
    assert depth[32, 32] < 1e9
    assert abs(depth[32, 32] - 3.0) < 0.05
    # expected lighting at the face normal (0,0,1), view ~ +z
    l1 = np.array([0.5, 0.2, 1.0]); l1 = l1 / np.linalg.norm(l1)
    l2 = np.array([-0.5, -1.0, -0.5]); l2 = l2 / np.linalg.norm(l2)
    refl = 2 * n.dot(l1) * n - l1
    view = np.array([0.0, 0.0, 1.0])
    want = (0.3 + 0.7 * max(n.dot(l1), 0) + 0.2 * max(n.dot(l2), 0)
            + 0.6 * max(view.dot(refl), 0) ** 32)
    np.testing.assert_allclose(color[32, 32], want, rtol=0.05)
    # unlit bypasses shading
    tri.unlit = True
    color_u, _ = tri.draw(cam)
    np.testing.assert_allclose(color_u[32, 32], 1.0, atol=1e-6)


def test_viewer_mesh_overlay_composites():
    """Viewer.meshes draw into the volume composite like the reference's
    GL mesh pass (tmax_bg + background color)."""
    from mega_nerf_viewer_tpu.utils.mesh import Mesh
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.viewer import Viewer
    v = Viewer(sphere_tree(basis_dim=1, depth=3))
    v.camera = Camera(32, 32, 20.0)
    v.camera.center = np.array([-1.5, 0.1, 1.4], np.float32)
    v.camera._update()
    base = v.render()
    tri = Mesh(face_size=3, unlit=True)
    # a big triangle right in front of the camera, red
    c = v.camera.center
    back = v.camera.v_back
    p = c - back * 0.2
    r = v.camera.v_right * 0.5
    u = v.camera.v_up * 0.5
    n = back
    verts = [np.concatenate([p - r - u, [1, 0, 0], n]),
             np.concatenate([p + r - u, [1, 0, 0], n]),
             np.concatenate([p + u, [1, 0, 0], n])]
    tri.vert = np.stack(verts).astype(np.float32)
    v.meshes.append(tri)
    img = v.render()
    assert not np.allclose(img, base)
    # center pixel is occluded by the near triangle: red background
    assert img[16, 16, 0] > 0.5
