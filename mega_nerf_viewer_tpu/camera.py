"""Orbit/pan/zoom camera.

TPU-native analogue of the reference ``Camera``
(reference: ``src/camera.cpp``, ``include/camera.hpp``).  All state is
host-side float math (numpy); each frame the 4x3 camera-to-world
``transform`` — rows (right, up, back, center) — is handed to the jitted
render function as a device array, the analogue of the reference's
per-frame 12-float ``cudaMemcpyAsync`` upload (``camera.cpp:113-129``).

Includes the same change-detection used to gate refinement bookkeeping
(``camera.cpp:196-200``) and full drag semantics: orbit about camera or
about a pivot origin, pan, pole-flip protection (``camera.cpp:132-187``).
"""

from __future__ import annotations

import numpy as np


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _rotation(angle: float, axis: np.ndarray) -> np.ndarray:
    """3x3 rotation by ``angle`` about unit ``axis`` (Rodrigues)."""
    axis = _normalize(np.asarray(axis, np.float64))
    c, s = np.cos(angle), np.sin(angle)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return c * np.eye(3) + s * K + (1 - c) * np.outer(axis, axis)


class Camera:
    def __init__(self, width: int = 800, height: int = 800,
                 fx: float = 1111.11, fy: float = -1.0,
                 cx: float = -1.0, cy: float = -1.0):
        self.width = int(width)
        self.height = int(height)
        self.fx = float(fx)
        self.fy = float(fy) if fy >= 0.0 else float(fx)
        self.cx = float(cx) if cx >= 0.0 else width / 2.0
        self.cy = float(cy) if cy >= 0.0 else height / 2.0
        self.default_fx = self.fx
        self.default_fy = self.fy
        self.default_cx = float(cx)
        self.default_cy = float(cy)

        # Reference constructor pose (camera.cpp:41-44)
        self.center = np.array([-3.55, 0.0, 3.55], np.float32)
        self.v_back = np.array([-0.7071068, 0.0, 0.7071068], np.float32)
        self.v_world_up = np.array([0.0, 0.0, 1.0], np.float32)
        self.origin = np.array([0.0, 0.0, 0.0], np.float32)
        self.v_right = np.zeros(3, np.float32)
        self.v_up = np.zeros(3, np.float32)
        self.movement_speed = 1.0

        self.transform = np.zeros((4, 3), np.float32)
        self.K = np.zeros((4, 4), np.float32)
        self.w2c = np.eye(4, dtype=np.float32)

        self._drag = None
        self._has_changed = True
        self._transform_changed = False
        self._last = (None,) * 6
        self._update()

    # ------------------------------------------------------------------
    def _update(self, transform_from_vecs: bool = True,
                mark_changed: bool = True) -> None:
        """Recompute basis/transform/K/w2c (reference ``camera.cpp:54-130``)."""
        if transform_from_vecs:
            self.v_back = _normalize(self.v_back).astype(np.float32)
            self.v_right = _normalize(
                np.cross(self.v_world_up, self.v_back)).astype(np.float32)
            self.v_up = np.cross(self.v_back, self.v_right).astype(np.float32)
            new_transform = np.stack(
                [self.v_right, self.v_up, self.v_back,
                 self.center.astype(np.float32)])
            if not np.array_equal(new_transform, self.transform):
                self._transform_changed = True
            self.transform = new_transform

        intr_now = (self.fx, self.fy, self.cx, self.cy,
                    self.width, self.height)
        if self._last != intr_now:
            self._transform_changed = True
            self._last = intr_now

        clip_near = 1e-3
        # GL-style projection, column-major layout as in camera.cpp:106-109
        K = np.zeros((4, 4), np.float32)
        K[:, 0] = (self.fx / (0.5 * self.width), 0, 0, 0)
        K[:, 1] = (0, -self.fy / (0.5 * self.height), 0, 0)
        K[:, 2] = (0, 0, -1.0, -1.0)
        K[:, 3] = (0, 0, -2 * clip_near, 0)
        self.K = K

        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = self.transform[:3].T
        c2w[:3, 3] = self.transform[3]
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = c2w[:3, :3].T
        w2c[:3, 3] = -c2w[:3, :3].T @ c2w[:3, 3]
        self.w2c = w2c

        if mark_changed and self._transform_changed:
            self._has_changed = True
            self._transform_changed = False

    def has_changed(self) -> bool:
        """True once after any transform/intrinsics change
        (reference ``camera.cpp:196-200`` — reading clears the flag)."""
        out = self._has_changed
        self._has_changed = False
        return out

    # ------------------------------------------------------------------
    # Drag controls (reference camera.cpp:132-187)
    # ------------------------------------------------------------------
    def begin_drag(self, x: float, y: float, is_pan: bool,
                   about_origin: bool) -> None:
        self._drag = dict(
            start=np.array([x, y], np.float64),
            back=self.v_back.copy(), right=self.v_right.copy(),
            up=self.v_up.copy(), center=self.center.copy(),
            origin=self.origin.copy(),
            is_pan=is_pan, about_origin=about_origin)

    def drag_update(self, x: float, y: float) -> None:
        d = self._drag
        if d is None:
            return
        delta = (np.array([x, y], np.float64) - d["start"])
        delta *= -2.0 * self.movement_speed / max(self.width, self.height)
        if d["is_pan"]:
            self.center = (d["center"] + delta[0] * d["right"]
                           - delta[1] * d["up"]).astype(np.float32)
            if d["about_origin"]:
                self.origin = (d["origin"] + delta[0] * d["right"]
                               - delta[1] * d["up"]).astype(np.float32)
        else:
            if d["about_origin"]:
                delta = -delta
            m_tmp = _rotation(-delta[1], d["right"])
            v_back_tmp = m_tmp @ d["back"]
            dot = np.dot(np.cross(self.v_world_up, v_back_tmp), d["right"])
            if dot < 0.0:
                return  # prevent flip over the pole
            m = (_rotation(np.fmod(-delta[0], 2.0 * np.pi), self.v_world_up)
                 @ _rotation(-delta[1], d["right"]))
            self.v_back = _normalize(m @ d["back"]).astype(np.float32)
            if d["about_origin"]:
                self.center = ((m @ (d["center"] - self.origin))
                               + self.origin).astype(np.float32)
            self._update(True, mark_changed=False)

    def is_dragging(self) -> bool:
        return self._drag is not None

    def end_drag(self) -> None:
        self._drag = None

    def move(self, xyz) -> None:
        """Translate by xyz * movement_speed (reference ``camera.cpp:189-194``)."""
        step = np.asarray(xyz, np.float32) * self.movement_speed
        self.center = (self.center + step).astype(np.float32)
        if self._drag is not None:
            self._drag["center"] = self._drag["center"] + step
