"""1080p GUIDED-sampling camera-motion benchmark through the Viewer.

The reference's R-mode re-collects samples and re-queries the MLPs on
every camera move (``can_reuse_results`` drops, cuda_renderer.cpp:
103-139) and composites the fresh results; camera-static frames reuse
the cache.  This drives that exact loop: every pose moves the camera,
so each timed frame pays the full invalidation — leaf-map collect
march (CDF budgets + escalation), compact reconstruction, grouped
``ragged_dot`` MLP query, device-side (ns, steps) order rebuild, and
the compact segmented-scan composite.

Timing is compute-only in the bench.py sense (frames stay on device,
one end-of-run checksum) but includes the invalidation's inherent
host syncs (the compact-budget count fetch, segment stats) at their
tunnel-inflated dev price — the number is a lower bound on a
production link.

Usage: python benchmarks/motion_guided1080p.py [n_poses] [deg] [S]
           [foveation]
``foveation`` > 1 (e.g. 4) runs the guided-FOVEATED approximate mode:
1/foveation-resolution periphery + exact center window, each sub-view
with its own guided pipeline.  Prints one JSON line.
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
    from mega_nerf_viewer_tpu.models import MegaNeRFModel

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    deg = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    foveation = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    import _overrides
    width, height, depth, smoke = _overrides.apply(1920, 1080, 8)

    tree = shell_tree(depth=depth, basis_dim=1, sigma_inside=400.0)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=8, hidden=256, n_layers=8,
        grid_dim=(2, 4), min_position=(-1.5, -1.5, -1.5),
        max_position=(1.5, 1.5, 1.5), need_viewdir=True)
    cam = Camera(width, height, 1111.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()
    # headroom matters: with capacity > 3/4 of max, camera moves flip
    # on visit tracking (prune pressure) which routes through the
    # EXACT collect march — a real refinable session has growth room
    v = Viewer(tree, camera=cam,
               max_tree_capacity=int(tree.capacity) * 4,
               options=RenderOptions(use_guided_sampling=True,
                                     need_viewdir=True,
                                     max_guided_samples=S))
    v.model = model
    v.fast_chunk_size = min(1920, width)
    v.foveation = foveation

    def orbit_step():
        v.camera.begin_drag(0.0, 0.0, False, True)
        v.camera.drag_update(-np.deg2rad(deg) * width / 2.0, 0.0)
        v.camera.end_drag()

    # Warmup: first invalidation (unordered), then moved poses until a
    # pose completes with ZERO fresh XLA compiles (bounded).  A fixed
    # 2-pose warmup under-warms the foveated mode: each sub-viewer
    # walks its own budget ladder and novel (segment, budget) tuples
    # keep arriving through ~pose 6 (measured on v5e: pose 0 = 86 s of
    # compiles, pose 6 still caught one; steady poses are ~330 ms).
    # Those compiles are one-time per tuple family — the persistent
    # jit cache serves them across sessions — so the honest
    # interactive-rate figure is the post-quiescence one; the record
    # carries how many adaptation poses it took.
    import logging

    fresh = [0]

    class _CompileCounter(logging.Handler):
        def emit(self, r):
            if r.getMessage().startswith("Finished XLA compilation"):
                fresh[0] += 1

    import jax
    jax.config.update("jax_log_compiles", True)
    h = _CompileCounter()
    logging.getLogger("jax._src.dispatch").addHandler(h)
    v.render(fetch=False)
    warmup_poses = 0
    for _ in range(12):
        fresh[0] = 0
        orbit_step()
        float(v.render(fetch=False).sum())
        warmup_poses += 1
        if fresh[0] == 0:
            break
    logging.getLogger("jax._src.dispatch").removeHandler(h)
    jax.config.update("jax_log_compiles", False)

    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n_poses):
        orbit_step()
        acc = acc + v.render(fetch=False).sum()
    float(acc)
    dt = time.perf_counter() - t0

    fps = n_poses / dt
    record = {
        "metric": "motion_guided_1080p_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "ms_per_move": round(dt / n_poses * 1000.0, 1),
        "poses": n_poses,
        "deg_per_pose": deg,
        "max_guided_samples": S,
        "foveation": foveation,
        "warmup_poses": warmup_poses,
    }
    if smoke:
        record["smoke"] = True      # env-overridden run: NOT reportable
    print(json.dumps(record))
    print("# full guided invalidation per pose: collect march + "
          "compact reconstruct + grouped MLP + device order rebuild + "
          "compact composite; tunnel-priced host syncs included",
          file=sys.stderr)


if __name__ == "__main__":
    main()
