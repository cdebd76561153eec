"""Clean per-phase timing of the 1080p motion loop pieces on TPU.

Times, each in isolation with warm jit cache and explicit forcing:
  A. steady parked segmented frame (return_hints="packed", production)
  B. same frame with return_hints=False (the packed hint unpermute
     gather + bookkeeping cost)
  C. motion-config frame: iso-64 dilated order + headroom segments
  C3. motion frame with DIRECTIONAL (32, 64) dilation (production)
  D. dilate_packed alone (iso-64 and directional)
  E. order_from_hints_device alone (argsort + inverse scatter)
  F. hint_class_cdf fetch
  G. overflow-flags fetch (the per-pose host round trip)
Forces via scalar fetch (block_until_ready does not block through the
tunnel — CLAUDE.md).
"""
import numpy as np, time
import jax, jax.numpy as jnp
from mega_nerf_viewer_tpu import Viewer
from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import shell_tree
from mega_nerf_viewer_tpu.ops import accel

W, H, depth = 1920, 1080, 8
tree = shell_tree(depth=depth, basis_dim=9, sigma_inside=400.0)
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

def t(tag, fn, n=3):
    fn()  # warm (compile)
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    print(f"[{tag}] {sorted(best)[len(best)//2]*1e3:.1f} ms  "
          f"(runs: {[round(x*1e3) for x in best]})", flush=True)

# settle: parked frame + a few motion poses so hints/order/segments
# reach the steady motion regime
v.render(fetch=False)
for _ in range(5):
    orbit(); v.render(fetch=False)
force(v.render(fetch=False))

R = W * H
ph = v._hints_packed
assert ph is not None
segs_steady = tuple(accel.segments_from_hint_cdf(
    np.asarray(accel.hint_class_cdf_packed(ph)), R))
dp = accel.dilate_packed(ph, width=W, height=H, window=64)
segs_motion = tuple(accel.segments_from_hint_cdf(
    np.asarray(accel.hint_class_cdf_packed(dp)), R, headroom=True))
# directional: the production window for the 3-degree orbit pose
dp_dir = accel.dilate_packed(ph, width=W, height=H, window=(32, 64))
segs_motion_dir = tuple(accel.segments_from_hint_cdf(
    np.asarray(accel.hint_class_cdf_packed(dp_dir)), R, headroom=True))
order_m = accel.order_from_packed_device(dp)
order_md = accel.order_from_packed_device(dp_dir)
force(order_m[1]); force(order_md[1])
lm = v._leaf_map
opt = v.options
print(f"segments steady={segs_steady}", flush=True)
print(f"segments motion={segs_motion}", flush=True)
print(f"segments motion dir(32,64)={segs_motion_dir}", flush=True)

def frame(order, segs, want_hints, tag):
    def fn():
        out = accel.render_frame_fast_segmented(
            tree, lm, v.camera, opt, order=order, segments=segs,
            chunk_size=2176, need_votes=False, dynamic_knobs=True,
            skip_table=None, device_fallback=False,
            return_hints=want_hints, sorted_output=False)
        force(out[0])
    t(tag, fn)

frame(v._ray_order, segs_steady, "packed", "A steady frame, packed hints on")
frame(v._ray_order, segs_steady, False, "B steady frame, hints off")
frame(order_m, segs_motion, "packed",
      "C motion frame (iso-64 dilated+headroom), hints on")
frame(order_m, segs_motion, False, "C2 motion frame, hints off")
frame(order_md, segs_motion_dir, "packed",
      "C3 motion frame (DIRECTIONAL (32,64) dilated+headroom), hints on")

t("D dilate packed w=64", lambda: force(
    accel.dilate_packed(ph, width=W, height=H, window=64)))
t("D2 dilate packed (32,64)", lambda: force(
    accel.dilate_packed(ph, width=W, height=H, window=(32, 64))))
t("E order rebuild (packed)", lambda: force(
    accel.order_from_packed_device(dp)[1]))
t("E2 argsort only", lambda: force(
    jnp.argsort(dp, stable=True)))
t("F cdf fetch", lambda: np.asarray(accel.hint_class_cdf_packed(dp)))

# G: flags fetch — render one frame, fetch its seg_ov
out = accel.render_frame_fast_segmented(
    tree, lm, v.camera, opt, order=order_m, segments=segs_motion,
    chunk_size=2176, need_votes=False, dynamic_knobs=True,
    skip_table=None, device_fallback=False, return_hints="packed",
    sorted_output=False)
force(out[0])
t("G flags fetch", lambda: np.asarray(out[1]))
print("done", flush=True)
