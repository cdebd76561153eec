"""Pixel parity harness (BASELINE config 1 analogue).

Renders the CPU-runnable reference scene (800x800, SH9, no MLP) with
the production fast path and validates a random pixel subset against
the scalar float32 oracle (ops/oracle.py — the transliteration of the
CUDA trace loop).  Reports max |err| and PSNR; the target is per-pixel
agreement within 1e-3.

Usage: python benchmarks/parity.py [n_probe_pixels]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.ops import accel, oracle
    from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues

    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import _overrides
    _, _, _, smoke = _overrides.apply(800, 800)   # platform force only
    tree = sphere_tree(basis_dim=9, depth=5)
    opt = RenderOptions()
    cam = Camera(800, 800, 1111.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()

    lm = accel.build_leaf_map(tree)
    img, overflow, _ = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=1 << 15, block=64)
    assert not bool(overflow)
    img = np.asarray(img)

    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy,
                                jnp.asarray(cam.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    dirs, vdirs, cen = map(np.asarray, (dirs, vdirs, cen))

    rng = np.random.RandomState(0)
    idx = rng.choice(800 * 800, n_probe, replace=False)
    host = oracle.tree_to_host(tree)
    flat = img.reshape(-1, 4)
    errs = []
    for i in idx:
        want, _, _, _ = oracle.trace_ray(host, dirs[i], vdirs[i], cen,
                                         opt)
        want[:3] += np.float32(opt.background_brightness) * (
            np.float32(1.0) - want[3])
        errs.append(np.abs(flat[i] - want).max())
    errs = np.asarray(errs)
    mse = float(np.mean(errs ** 2))
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    record = {
        "metric": "parity_vs_oracle",
        "max_err": float(errs.max()),
        "p999_err": float(np.quantile(errs, 0.999)),
        "frac_within_1e-3": float(np.mean(errs < 1e-3)),
        "psnr_err_db": round(psnr, 1),
        "pixels_probed": n_probe,
    }
    if smoke:
        record["smoke"] = True      # env-overridden run: NOT reportable
    print(json.dumps(record))


if __name__ == "__main__":
    main()
