"""Probe: sharded motion-pose body cost at episode-start margin-1
budgets vs the production SETTLED margin-0 budgets
(Viewer.motion_settled_margin; PERFORMANCE.md round-4 fact 9b).

Run from the repo root on the TPU:  python tools/probe_motion_margin.py
[npz_path_or_depth].  Relative comparison only — fresh-process rule
(PERFORMANCE.md round-5 fact 9) applies to figures of record.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "tests/fixtures/.cache/aerial_sh4_d9.npz"
    import jax
    import jax.numpy as jnp
    import bench
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import N3Tree, shell_tree
    from mega_nerf_viewer_tpu.ops import accel
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    from mega_nerf_viewer_tpu.utils.tuning import device_tuning

    t0 = time.time()
    if src.endswith(".npz"):
        tree = N3Tree.open(src)
    else:
        tree = shell_tree(depth=int(src), basis_dim=9, sigma_inside=400.0)
    leaf_map = accel.build_leaf_map(tree)
    opt = RenderOptions()
    skip_table = build_skip_table(tree, opt.sigma_thresh)
    tune = device_tuning()
    cs = tune.chunk_size
    width, height = 1920, 1080
    cam = Camera(width, height, 1111.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()
    max_dense = 8
    while True:
        img, overflow, steps, nrec, skips = accel.render_frame_fast(
            tree, leaf_map, cam, opt, max_dense=max_dense,
            chunk_size=cs, block=tune.block, return_nrec=True,
            skip_table=skip_table, return_skips=True)
        if not bool(overflow):
            break
        max_dense *= 2
    print(f"setup {time.time() - t0:.1f}s  max_dense={max_dense}",
          flush=True)

    for margin in (1, 0):
        t1 = time.time()
        ms, over, tol = bench._time_v5e8_motion(
            jax, jnp, tree, leaf_map, cam, opt, steps, nrec, skips,
            skip_table, width, height, cs=cs, hint_chunk=cs,
            margin=margin)
        print(f"margin={margin}: worst {max(ms):.2f} ms -> "
              f"{1000.0 / max(ms):.1f} fps projected; shards "
              f"{', '.join(f'{m:.2f}' for m in ms)}; overflow {over} "
              f"(tol {tol}); stage wall {time.time() - t1:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
