"""BASELINE config 4 analogue: guided ray sampling at 1080p.

Measures the two phases the reference exposes (cuda_renderer.cpp:107-139):
  * invalidation latency — collect guided samples + batched MLP queries
    (the reference prints "Guided sampling finished in X ms"),
  * steady-state composite rate — per-frame NeRF-results compositing of
    the cached samples (XLA and Pallas kernels).

Uses a synthetic Mega-NeRF-shaped model (256-wide MLP per cluster).
Usage: python benchmarks/guided1080p.py [max_guided_samples] [tree.npz]
(the optional npz runs the guided pipeline on a REAL artifact — e.g.
the Mill-19-shaped aerial fixture — instead of the synthetic shell;
the synthetic model then matches the artifact's data_dim).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.camera import Camera
    from mega_nerf_viewer_tpu.options import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import shell_tree
    from mega_nerf_viewer_tpu.models import MegaNeRFModel
    from mega_nerf_viewer_tpu.ops import accel, guided

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tree_path = sys.argv[2] if len(sys.argv) > 2 else None
    import _overrides
    width, height, depth, smoke = _overrides.apply(1920, 1080, 8)
    cs = min(1920, width)
    if tree_path:
        from mega_nerf_viewer_tpu.n3tree import N3Tree
        tree = N3Tree.open(tree_path)
    else:
        tree = shell_tree(depth=depth, basis_dim=1, sigma_inside=400.0)
    lm = accel.build_leaf_map(tree)
    from mega_nerf_viewer_tpu.ops.pallas_march import build_skip_table
    model = MegaNeRFModel.synthetic(
        data_dim=int(tree.data_dim), n_clusters=8, hidden=256,
        n_layers=8, grid_dim=(2, 4), min_position=(-1.5, -1.5, -1.5),
        max_position=(1.5, 1.5, 1.5), need_viewdir=True)
    opt = RenderOptions(max_guided_samples=S, need_viewdir=True,
                        use_guided_sampling=True)
    cam = Camera(width, height, 1111.0)
    cam.center = np.array([-1.4, 0.1, 1.3], np.float32)
    cam._update()

    skip_table = build_skip_table(tree, opt.sigma_thresh)
    # warm compile; the first invalidation also yields the per-ray
    # sample counts that cost-sort subsequent collect marches (the
    # Viewer carries this order across camera moves)
    cache = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                          chunk_size=cs,
                                          skip_table=skip_table)
    float(cache["results_c"].sum())     # force
    ns_h = np.asarray(cache["num_samples"])
    # (steps, ns) key pair — ns alone mixes short surface hits with
    # long grazing marches in one class (collect 195 vs 77 ms measured)
    order = accel.order_from_hints(np.asarray(cache["collect_steps"]),
                                   ns_h)
    cache = guided.collect_and_query_fast(tree, lm, model, cam, opt,
                                          chunk_size=cs,
                                          skip_table=skip_table,
                                          order=order)
    float(cache["results_c"].sum())     # warm the ordered program

    def time_invalidation(**kw):
        # median of 3: the first post-compile execution on the axon
        # link can read up to ~4x slow (measured; see
        # perf-measurement notes) — a single sample is not reliable
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = guided.collect_and_query_fast(
                tree, lm, model, cam, opt, chunk_size=cs,
                skip_table=skip_table, order=order, **kw)
            float(c["results_c"].sum())   # force device completion
            ts.append((time.perf_counter() - t0) * 1000.0)
        return c, sorted(ts)[1]

    cache, invalidation_ms = time_invalidation()
    n_samples = int(np.asarray(cache["num_samples"]).sum())

    # CDF-budget segmented collect (what the Viewer runs once hints
    # exist): reduced record buffers for hint-cheap ray classes; the
    # stale-hint flags ride the total-count fetch (no extra sync)
    segs = guided.segments_from_ns_hints(ns_h, S)
    cache_s = guided.collect_and_query_fast(
        tree, lm, model, cam, opt, chunk_size=cs,
        skip_table=skip_table, order=order, segments=segs)
    float(cache_s["results_c"].sum())   # warm (escalation settles here)
    cache_s, invalidation_seg_ms = time_invalidation(segments=segs)
    assert int(np.asarray(cache_s["num_samples"]).sum()) == n_samples

    def comp(use_pallas):
        img = guided.composite_frame(tree, cam, opt, cache,
                                     use_pallas=use_pallas)
        return float(img.sum())

    results = {}

    def time_comp(use_pallas, n=10):
        comp(use_pallas)                  # warm
        comp(use_pallas)                  # absorb first-exec slowness
        t0 = time.perf_counter()
        for _ in range(n):
            comp(use_pallas)
        return round((time.perf_counter() - t0) / n * 1000, 1)

    # compact device-resident cache -> XLA segmented-scan compositor
    results["composite_compact_ms"] = time_comp(False)
    # single-pass Pallas segmented-scan kernel (auto route).  The auto
    # gate can silently fall back to XLA (tile-divisibility, missing
    # vdirs, viewdir signature mismatch, _compact_broken) which would
    # mislabel an XLA duplicate as the Pallas number — verify the gate
    # holds and label the metric honestly if it doesn't.
    from mega_nerf_viewer_tpu.ops import pallas_composite as _pc
    M = cache["results_c"].shape[0]
    gate_ok = (cache.get("vdirs_c") is not None
               and M % (_pc._SUB * 128) == 0
               and not getattr(_pc, "_compact_broken", False))
    try:
        ms = time_comp(None)
        if gate_ok and not getattr(_pc, "_compact_broken", False):
            results["composite_pallas_ms"] = ms
        else:
            results["composite_pallas_ms"] = (
                f"fell back to XLA ({ms} ms; gate_ok={gate_ok})")
    except Exception as e:
        results["composite_pallas_ms"] = f"unavailable: {e!r}"

    record = {
        "metric": "guided_sampling_1080p",
        "invalidation_ms": round(invalidation_ms, 1),
        "invalidation_segmented_ms": round(invalidation_seg_ms, 1),
        "mlp_samples": n_samples,
        **results,
        "max_guided_samples": S,
    }
    if tree_path:
        record["tree"] = os.path.basename(tree_path)
        record["chunks"] = int(tree.capacity)
    if smoke:
        record["smoke"] = True      # env-overridden run: NOT reportable
    print(json.dumps(record))


if __name__ == "__main__":
    main()
