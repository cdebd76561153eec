"""Benchmark: 1080p octree render throughput on the local accelerator.

Renders a Mill-19-style synthetic shell octree (dense SH surface in an
empty volume) at 1920x1080 with full octree traversal + SH9 evaluation,
mirroring BASELINE config 2.  Prints ONE JSON line:
  {"metric": "frames_per_sec_1080p", "value": N, "unit": "fps",
   "vs_baseline": N/30}
(vs_baseline: BASELINE.md target is >= 30 fps at 1080p.)
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import shell_tree
    from mega_nerf_viewer_tpu.ops import accel

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    width, height = 1920, 1080

    t0 = time.time()
    tree = shell_tree(depth=depth, basis_dim=9, sigma_inside=400.0)
    build_s = time.time() - t0
    leaf_map = accel.build_leaf_map(tree)

    opt = RenderOptions()
    # Pallas entry-skip prepass table (bit-identical pixels; see
    # ops/pallas_march.py) — register-resident level-4 march through
    # entry empty space, ~72% of all march steps on this fixture
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    skip_table = build_skip_table(tree, opt.sigma_thresh)
    cam = Camera(width, height, 1111.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()

    # First frame in spatial-block order yields per-ray march costs and
    # record counts; steady-state frames sort rays by (records, steps)
    # and render in segments whose deferred-shading budget matches what
    # each ray class actually records (pixel-identical, pure perf — see
    # accel.render_frame_fast_segmented).  Overflowing segments escalate.
    max_dense = 8
    while True:
        img, overflow, steps, nrec = accel.render_frame_fast(
            tree, leaf_map, cam, opt, max_dense=max_dense,
            chunk_size=1 << 14, block=64, return_nrec=True,
            skip_table=skip_table)
        if not bool(overflow):
            break
        max_dense *= 2
        assert max_dense <= 128, "pathological dense-sample count"
    alpha = float(np.asarray(img)[..., 3].max())
    order = accel.order_from_hints(steps, nrec)
    segments = list(accel.DEFAULT_SEGMENTS)

    def frame():
        while True:
            img, seg_overflow = accel.render_frame_fast_segmented(
                tree, leaf_map, cam, opt, order=order,
                segments=tuple(segments), chunk_size=1 << 14,
                skip_table=skip_table)
            ov = np.asarray(seg_overflow)
            if not ov.any():
                break
            for i, hit in enumerate(ov):
                if hit:
                    segments[i] = (segments[i][0], segments[i][1] * 2)
                    assert segments[i][1] <= 128
        # fetch a checksum, not the 8 MB image: forces full device
        # computation without timing the host link (the axon tunnel
        # transfers ~35 MB/s and would dominate; production PCIe/DMA
        # readback is ~3 ms for a 1080p frame)
        return float(img.sum())

    frame()  # compile the step-sorted ordering
    n_frames = 10
    t0 = time.perf_counter()
    for _ in range(n_frames):
        csum = frame()
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    rays_per_sec = fps * width * height

    print(json.dumps({
        "metric": "frames_per_sec_1080p",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} "
          f"chunks={int(tree.capacity)} depth={depth} "
          f"build={build_s:.1f}s rays/s={rays_per_sec:.3e} "
          f"alpha_max={alpha:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
