"""Camera drag semantics vs reference camera.cpp behaviors."""

import numpy as np

from mega_nerf_viewer_tpu.camera import Camera


def _cam():
    c = Camera(100, 80, 50.0)
    c._update()
    return c


def test_basis_orthonormal():
    c = _cam()
    r, u, b = c.v_right, c.v_up, c.v_back
    for v in (r, u, b):
        assert abs(np.linalg.norm(v) - 1) < 1e-6
    assert abs(np.dot(r, u)) < 1e-6
    assert abs(np.dot(r, b)) < 1e-6
    np.testing.assert_allclose(np.cross(b, r), u, atol=1e-6)


def test_transform_layout():
    """Rows are (right, up, back, center) — reference camera.cpp:54-82."""
    c = _cam()
    np.testing.assert_allclose(c.transform[0], c.v_right, atol=1e-7)
    np.testing.assert_allclose(c.transform[1], c.v_up, atol=1e-7)
    np.testing.assert_allclose(c.transform[2], c.v_back, atol=1e-7)
    np.testing.assert_allclose(c.transform[3], c.center, atol=1e-7)


def test_w2c_inverts_c2w():
    c = _cam()
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = c.transform[:3].T
    c2w[:3, 3] = c.transform[3]
    np.testing.assert_allclose(c.w2c @ c2w, np.eye(4), atol=1e-5)


def test_has_changed_latches():
    c = _cam()
    c.has_changed()
    assert not c.has_changed()
    c.fx *= 1.1
    c._update()
    assert c.has_changed()
    assert not c.has_changed()


def test_pan_moves_center_not_orientation():
    c = _cam()
    back0 = c.v_back.copy()
    c.begin_drag(0, 0, is_pan=True, about_origin=False)
    c.drag_update(10.0, 5.0)
    c.end_drag()
    c._update()
    np.testing.assert_allclose(c.v_back, back0, atol=1e-7)
    assert np.linalg.norm(c.center - [-3.55, 0, 3.55]) > 1e-4


def test_orbit_about_origin_preserves_distance():
    c = _cam()
    c.origin = np.zeros(3, np.float32)
    d0 = np.linalg.norm(c.center - c.origin)
    c.begin_drag(0, 0, is_pan=False, about_origin=True)
    c.drag_update(15.0, 7.0)
    c.end_drag()
    d1 = np.linalg.norm(c.center - c.origin)
    assert abs(d1 - d0) < 1e-3 * d0


def test_pole_flip_guard():
    """Dragging past the pole is rejected (camera.cpp:164-167)."""
    c = _cam()
    back0 = c.v_back.copy()
    c.begin_drag(0, 0, is_pan=False, about_origin=False)
    # huge vertical drag that would flip over the pole
    c.drag_update(0.0, -1e4)
    c.end_drag()
    # direction must not have flipped through world-up
    dot = np.dot(np.cross(c.v_world_up, c.v_back), c.v_right)
    assert dot >= 0


def test_move_during_drag_updates_anchor():
    c = _cam()
    c.begin_drag(0, 0, is_pan=True, about_origin=False)
    c.move(np.array([1.0, 0, 0], np.float32))
    c.drag_update(0.0, 0.0)    # no-op drag shouldn't undo the move
    c.end_drag()
    assert c.center[0] > -3.0


def test_fy_defaults_to_fx():
    c = Camera(64, 64, 123.0, fy=-1.0)
    assert c.fy == 123.0
    assert c.cx == 32.0 and c.cy == 32.0
