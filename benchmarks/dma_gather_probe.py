"""VERDICT r3 ask 5: the bounded Pallas DMA-march experiment.

Question: can a Pallas TPU kernel fetch leaf-map rows at DYNAMIC
per-ray indices via double-buffered async DMA (pltpu.make_async_copy)
UNDER the ~12 ns/row XLA gather floor that bounds the residual march
(PERFORMANCE.md roadmap 1, ~2.84M residual steps -> ~38 ms/frame)?

Why this is the decisive probe: the fused-march north star
(reference include/cuda/rt_core.cuh:162-332 — one kernel walking the
octree per ray) died on Mosaic's lack of per-lane dynamic row
indexing; every march step must therefore materialize its row fetches
as either (a) an XLA gather between Pallas stages (the shipped hybrid,
billed ~12 ns/row flat regardless of width/locality) or (b) per-row
DMA descriptors issued from the kernel's scalar core.  This probe
times (b) honestly at march-like shapes and index entropy:

  table  [M, W] i32   — leaf-map-row-like (M=1M rows; W=8 production
                        width, plus W=128 to separate descriptor-issue
                        cost from transfer cost)
  idx    [N] i32      — N=2M uniform-random rows (the march's
                        measured next-row locality is 8-15%, i.e.
                        effectively random; PERFORMANCE.md dead-lever
                        list), chunked into SMEM blocks
  kernel              — per index: sliced DMA table[idx[k]] -> VMEM
                        slot (K_INFLIGHT descriptors pipelined on a
                        semaphore ring), accumulate row into a VMEM
                        sum (consumes every byte so nothing is DCE'd)
  baseline            — jnp.take(table, idx, 0) + the same chunk-sum
                        on identical arrays

Outputs ns/row for both paths (median of 5 forced runs).  Accept if
DMA < gather; else the north star retires for good with numbers.

Usage: python benchmarks/dma_gather_probe.py [N_log2] [--interpret]
Prints one JSON line per configuration.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


CHUNK = 2048          # indices per grid step (SMEM block: 8 KB i32)
K_INFLIGHT = 8        # DMA descriptors in flight per chunk pipeline


def build_dma_gather(M: int, W: int, N: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = N // CHUNK

    def kernel(idx_ref, table_ref, out_ref):
        # idx_ref: [CHUNK] i32 in SMEM; table_ref: [M, W] i32 in
        # HBM/ANY (never blocked in); out_ref: [grid] i32 in SMEM
        # (whole array, resident across the sequential grid).
        pid = pl.program_id(0)       # outside run_scoped (interpret)

        def body(scratch, sems):
            def get_dma(slot, k):
                return pltpu.make_async_copy(
                    table_ref.at[idx_ref[k]],
                    scratch.at[slot],
                    sems.at[slot])

            for s in range(K_INFLIGHT):      # static pipeline warmup
                get_dma(s, s).start()

            def step(k, acc):
                slot = jax.lax.rem(k, K_INFLIGHT)
                get_dma(slot, k).wait()
                row = scratch[slot]

                @pl.when(k + K_INFLIGHT < CHUNK)
                def _():
                    get_dma(slot, k + K_INFLIGHT).start()
                return acc + row

            acc = jax.lax.fori_loop(
                0, CHUNK, step, jnp.zeros((W,), jnp.int32))
            # ONE scalar per chunk into a WHOLE-ARRAY SMEM output
            # (rank-1 blocks must be full-array or 128-multiples —
            # even in SMEM); the block stays resident across the
            # sequential grid, each step writing its own slot.  The
            # full-row sum still consumes every fetched byte.
            out_ref[pid] = jnp.sum(acc)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((K_INFLIGHT, W), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((K_INFLIGHT,)))

    fn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid,), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(lambda idx, table: fn(idx, table))


def build_xla_gather(M: int, W: int, N: int):
    import jax
    import jax.numpy as jnp

    grid = N // CHUNK

    @jax.jit
    def fn(idx, table):
        # identical work shape: per-chunk row sums (the march consumes
        # every gathered row; summing is the cheapest full consumption)
        rows = jnp.take(table, idx, axis=0)          # [N, W] gather
        return rows.reshape(grid, CHUNK * W).sum(1)
    return fn


def time_ns_per_row(fn, idx, table, N, runs=5):
    import jax.numpy as jnp

    def force(x):
        return int(jnp.asarray(x).ravel()[:4].astype(jnp.float32).sum())

    force(fn(idx, table))                            # compile
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        force(fn(idx, table))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return med * 1e9 / N, [round(t * 1e6) for t in ts]


def main():
    n_log2 = 21
    interpret = "--interpret" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n_log2 = int(args[0])
    if os.environ.get("BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        interpret = True
        n_log2 = min(n_log2, 14)

    import jax
    import jax.numpy as jnp

    N = 1 << n_log2
    M = 1 << 20
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))

    for W in (8, 128):
        table = jnp.asarray(
            rng.integers(0, 1 << 20, (M, W), dtype=np.int32))
        xla = build_xla_gather(M, W, N)
        dma = build_dma_gather(M, W, N, interpret)
        ns_x, runs_x = time_ns_per_row(xla, idx, table, N)
        rec = {
            "metric": "dma_vs_gather_ns_per_row", "width": W,
            "n_rows": N, "xla_ns": round(ns_x, 2),
            "inflight": K_INFLIGHT, "chunk": CHUNK,
        }
        try:
            # equality first: the DMA path must fetch the same rows
            a = np.asarray(dma(idx, table))
            b = np.asarray(xla(idx, table))
            rec["equal"] = bool(np.array_equal(a, b))
            ns_d, runs_d = time_ns_per_row(dma, idx, table, N)
            rec.update(dma_ns=round(ns_d, 2),
                       dma_over_xla=round(ns_d / max(ns_x, 1e-9), 2),
                       runs_us_xla=runs_x, runs_us_dma=runs_d)
        except Exception as e:  # noqa: BLE001 — record the refusal
            # Finding, not failure: Mosaic requires DMA slices to be
            # 128-aligned in the minor dim, so a per-row DMA of the
            # leaf map's natural 8-wide rows is INEXPRESSIBLE — the
            # minimum granule is 128 elements (16x the payload).
            rec.update(dma_ns=None,
                       dma_error=str(e).splitlines()[0][:160])
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
