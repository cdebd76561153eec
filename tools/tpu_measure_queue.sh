#!/bin/bash
# Queued TPU measurements for when the axon tunnel returns.
# (The tunnel died mid-round-3 — `timeout 45 python -c "import jax,
# jax.numpy as jnp; print(float(jnp.arange(8).sum()))"` hangs; run
# that probe first.)  Each benchmark runs SOLO in a fresh process
# (concurrent TPU processes can wedge the backend) from the repo root,
# with generous timeouts for the remote compile service.
#
# Measurement status (2026-08-19, tunnel returned; PERFORMANCE.md has
# the full numbers):
#  1. bench.py          — DONE: 16.43 fps headline (no regression),
#                         sorted_mode 19.43, v5e-8 projection 62.0/86.2
#  2. motion1080p       — DONE: 2.351 fps (statistically unchanged by
#                         the dilation fix)
#  3. motion_guided1080p — DONE: 2.35-2.63 fps over two solo runs
#                         (pre-fix 2.98 — the speed-matched window
#                         collects real silhouette samples; ±10% run
#                         variance).  Guided-foveated config queued.
#  4. guided1080p / foveated1080p / orbit4k / refine_throughput /
#     parity — regression sweep (results land in /tmp/tpu_results_r3)
set -u
cd "$(dirname "$0")/.." || exit 1
# After code changes, run tools/smoke_benchmarks.sh FIRST (CPU, tiny
# sizes): it exercises every script below end-to-end so a latent crash
# can't burn a real measurement slot.
# mandatory tunnel probe: a dead tunnel would otherwise burn ~7.5 h of
# per-benchmark timeouts producing nothing
# 45 s was too tight when the remote compile service queues (measured
# 78 s for this one-op program in a fresh process on 2026-08-18 with
# the tunnel otherwise healthy); a dead tunnel still fails fast at the
# cap.
if ! timeout 300 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.arange(8).sum()))"; then
  echo "TPU tunnel is DEAD (probe hung/failed) — aborting queue" >&2
  exit 2
fi
mkdir -p /tmp/tpu_results
for cmd in \
    "python bench.py" \
    "python benchmarks/motion1080p.py" \
    "python benchmarks/motion_guided1080p.py" \
    "python benchmarks/motion_guided1080p.py 8 3 32 4" \
    "python benchmarks/guided1080p.py" \
    "python benchmarks/foveated1080p.py" \
    "python benchmarks/orbit4k.py" \
    "python benchmarks/refine_throughput.py" \
    "python benchmarks/parity.py" \
    ; do
  name=$(echo "$cmd" | tr ' /' '__')
  echo "=== $cmd" | tee -a /tmp/tpu_results/log.txt
  timeout 3000 $cmd > "/tmp/tpu_results/$name.out" 2>&1
  echo "rc=$? $(tail -2 "/tmp/tpu_results/$name.out")" \
      | tee -a /tmp/tpu_results/log.txt
done
