"""1080p FOVEATED approximate-mode benchmark through the Viewer.

The march is gather-bound per ray (PERFORMANCE.md), so the foveated
mode — periphery at 1/f resolution through the same segmented fast
path, full-resolution center window (exact pinhole crop), composed on
device — cuts frame cost toward center_frac^2 + (1-center_frac^2)/f^2
of the exact frame.  No reference counterpart (the CUDA viewer renders
every pixel, main.cpp:603-616); this is the TPU-native interactive
lever the measured kernel floors leave open on one chip.

Reports steady-state fps (parked camera, settled orders, frame-cache
bypassed by timing the render path directly) and motion fps (orbit
poses; order rebuilds + budget episodes in-loop) for the exact and
foveated frames.

Usage: python benchmarks/foveated1080p.py [f] [n_frames] [deg]
Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu import Viewer
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import shell_tree

    f = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    deg = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    import _overrides
    width, height, depth, smoke = _overrides.apply(1920, 1080, 8)

    tree = shell_tree(depth=depth, basis_dim=9, sigma_inside=400.0)
    results = {"metric": "foveated_1080p", "f": f}
    if smoke:
        results["smoke"] = True     # env-overridden run: NOT reportable

    def build(fov):
        cam = Camera(width, height, 1111.0)
        cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
        cam._update()
        v = Viewer(tree, camera=cam, options=RenderOptions())
        v.fast_chunk_size = 2176
        v.foveation = fov
        # amortize the async flag fetch (~27 ms/fetch through the dev
        # tunnel, ~1 ms production): staleness escalation is delayed
        # <= 8 frames, inside the async transient contract
        v.overflow_policy = "async"
        v.overflow_check_interval = 8
        return v

    def steady_fps(v, reps=10):
        v.render(fetch=False)
        v.render(fetch=False)         # absorb first-exec slowness
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            # re-render same pose through the full path (no frame cache
            # on the fast path; foveated recomposes each call)
            acc = acc + v.render(fetch=False).sum()
        float(acc)
        return reps / (time.perf_counter() - t0)

    def motion_fps(v, poses=None, d=None):
        poses = poses or n
        d = d or deg
        def orbit():
            v.camera.begin_drag(0.0, 0.0, False, True)
            v.camera.drag_update(-np.deg2rad(d) * width / 2.0, 0.0)
            v.camera.end_drag()
        for _ in range(3):            # warm every program in the loop
            orbit()
            float(v.render(fetch=False).sum())
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(poses):
            orbit()
            acc = acc + v.render(fetch=False).sum()
        float(acc)
        return poses / (time.perf_counter() - t0)

    v_f = build(f)
    results["steady_fps"] = round(steady_fps(v_f), 2)
    results["motion_fps"] = round(motion_fps(v_f), 2)
    v_e = build(1)
    results["exact_steady_fps"] = round(steady_fps(v_e), 2)
    results["exact_motion_fps"] = round(motion_fps(v_e), 2)
    results["value"] = results["steady_fps"]
    results["unit"] = "fps"
    print(json.dumps(results))
    print("# foveated: periphery 1/%d res via the segmented fast path, "
          "center window exact; approximate mode, explicit opt-in "
          "(Viewer.foveation / --foveation)" % f, file=sys.stderr)


if __name__ == "__main__":
    main()
