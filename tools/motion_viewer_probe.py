"""Per-pose stage split of the PRODUCTION 1080p motion loop (TPU).

Unlike tools/motion_phase_timing.py (isolated executables, no skip
table), this wraps the real Viewer's own calls — dilate_packed,
order_from_packed_device, render_frame_fast_segmented — with forcing
timers, so each moved pose reports where its device time actually
goes WITH the production skip table, options, and budget machinery.
Forcing between stages serializes the chain (total > the benchmark's
pipelined per-pose time); the split is what matters.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from mega_nerf_viewer_tpu import Viewer
from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import shell_tree
from mega_nerf_viewer_tpu.ops import accel
from mega_nerf_viewer_tpu import viewer as viewer_mod

W, H = 1920, 1080
tree = shell_tree(depth=8, basis_dim=9, sigma_inside=400.0)
cam = Camera(W, H, 1111.0)
cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
cam._update()
v = Viewer(tree, camera=cam, options=RenderOptions())
v.fast_chunk_size = 2176
v.overflow_policy = "async"


def force(x):
    return float(jnp.asarray(x).ravel()[:4].astype(jnp.float32).sum())


def orbit():
    v.camera.begin_drag(0.0, 0.0, False, True)
    v.camera.drag_update(-np.deg2rad(3.0) * W / 2.0, 0.0)
    v.camera.end_drag()


stage_log = []

orig_dilate = accel.dilate_packed
orig_order = accel.order_from_packed_device
orig_frame = accel.render_frame_fast_segmented


def timed(tag, orig, force_of):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        force(force_of(out))
        stage_log.append((tag, time.perf_counter() - t0))
        return out
    return wrap


accel.dilate_packed = timed("dilate", orig_dilate, lambda o: o)
accel.order_from_packed_device = timed("order", orig_order,
                                       lambda o: o[1])
accel.render_frame_fast_segmented = timed("frame", orig_frame,
                                          lambda o: o[0])

# warmup to the settled motion regime, then rewind (the benchmark's
# own protocol)
pose0 = (cam.center.copy(), cam.v_back.copy())
v.render(fetch=False)
for _ in range(4):
    orbit()
    v.render(fetch=False)
v.camera.center, v.camera.v_back = pose0[0].copy(), pose0[1].copy()
v.camera._update()
v.render(fetch=False)

# experiment: the motion frame at NO-HEADROOM budgets (same dilated
# order; headroom promotion doubles every nonzero class budget — how
# much of the 330 ms does it buy back if the async tolerance absorbs
# the value transitions instead?)
if v._hints_packed is not None and v._ray_order is not None:
    R = W * H
    dp = orig_dilate(v._hints_packed, width=W, height=H,
                     window=(32, 64))
    cdf = np.asarray(accel.hint_class_cdf_packed(dp))
    segs_nh = tuple(accel.segments_from_hint_cdf(cdf, R,
                                                 headroom=False))
    segs_h = tuple(accel.segments_from_hint_cdf(cdf, R,
                                                headroom=True))
    order_x = orig_order(dp)
    force(order_x[1])
    import time as _t
    for tag, segs in (("headroom", segs_h), ("NO-headroom", segs_nh)):
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            out = orig_frame(
                tree, v._leaf_map, v.camera, v.options, order=order_x,
                segments=segs, chunk_size=v.fast_chunk_size,
                need_votes=False, dynamic_knobs=True,
                skip_table=getattr(v, "_skip_table", None),
                device_fallback=False, return_hints="packed",
                sorted_output=False)
            force(out[0])
            ts.append(_t.perf_counter() - t0)
        ov = np.asarray(out[1])
        print(f"[motion frame {tag}] {sorted(ts)[1]*1e3:.0f} ms "
              f"segs={segs} overflow_counts={ov.tolist()}", flush=True)

for p in range(6):
    stage_log.clear()
    orbit()
    t0 = time.perf_counter()
    out = v.render(fetch=False)
    force(out)
    total = time.perf_counter() - t0
    split = {tag: round(dt * 1e3) for tag, dt in stage_log}
    other = total - sum(dt for _, dt in stage_log)
    print(f"[pose {p}] total={total*1e3:.0f}ms split={split} "
          f"other={other*1e3:.0f}ms segs={v._segments}", flush=True)
print("done", flush=True)
