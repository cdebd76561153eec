"""BASELINE config 5: orbit-trajectory batch render at 4K with rays
sharded over the local device mesh (tiles gathered per frame).

On a single dev chip this exercises the same sharded program with a
1-device mesh; on a v5e-8 slice the rays axis spans all 8 chips.

Usage: python benchmarks/orbit4k.py [n_frames] [depth]
Prints one JSON line per run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import shell_tree
    from mega_nerf_viewer_tpu.ops import accel
    from mega_nerf_viewer_tpu import parallel

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    width, height = 3840, 2160

    tree = shell_tree(depth=depth, basis_dim=9, sigma_inside=400.0)
    leaf_map = accel.build_leaf_map(tree)
    opt = RenderOptions()
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    skip_table = build_skip_table(tree, opt.sigma_thresh)
    mesh = parallel.make_mesh((len(jax.devices()),),
                              (parallel.RAY_AXIS,))

    cam = Camera(width, height, 2222.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()

    def frame():
        img, overflow = parallel.render_frame_fast_sharded(
            tree, leaf_map, cam, opt, mesh, max_dense=8,
            chunk_size=1920, skip_table=skip_table)
        return float(img.sum()), bool(overflow)

    csum, ov = frame()   # compile
    assert not ov

    t0 = time.perf_counter()
    for f in range(n_frames):
        angle = 2.0 * np.pi * f / max(n_frames, 1)
        cam.begin_drag(0.0, 0.0, False, True)
        cam.drag_update(-angle * width / 2.0, 0.0)
        cam.end_drag()
        cam._update()
        csum, _ = frame()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "orbit_4k_frames_per_sec",
        "value": round(n_frames / dt, 4),
        "unit": "fps",
        "devices": len(jax.devices()),
        "rays_per_sec": round(n_frames * width * height / dt, 0),
    }))


if __name__ == "__main__":
    main()
