#!/bin/bash
# Queued TPU measurements. Each benchmark runs SOLO in a fresh process
# (concurrent TPU processes can wedge the backend) from the repo root,
# with generous timeouts for the remote compile service.
#
# TUNNEL FORENSICS (round-3 lesson): the axon tunnel died mid-round-3
# and a single-shot probe turned the whole round's perf evidence into
# one error record.  This queue now (a) probes BEFORE EVERY measurement,
# (b) on a dead probe waits/retries with a bounded budget (4 attempts,
# escalating sleeps, ~18 min worst case) instead of giving up, and
# (c) stamps every measurement line with probe health + timestamps so
# one outage can never silently zero a round's evidence again.
#
# Measurement status (2026-08-19; PERFORMANCE.md has the full numbers):
#  1. bench.py           — DONE r4: 16.53 fps headline, sorted 19.57,
#                          v5e-8 projection 61.7/95.5, rc=0 (r3 was
#                          16.43/19.43 before the tunnel died)
#  2. motion1080p        — DONE r4: 4.552 fps re-hint mode (2.351 r3
#                          dilate; progression in PERFORMANCE.md
#                          round-4 facts 5-7)
#  3. motion_guided1080p — DONE r4: f=1 2.65 fps, f=4 1.792 fps, both
#                          with compile-quiescence warmup (the r3
#                          "0.174 fps known-bad" f=4 figure was the
#                          compile tail inside the timed region, not
#                          steady state) — see PERFORMANCE.md
#                          "Other measured configurations".
#  4. guided1080p / foveated1080p / orbit4k / refine_throughput /
#     parity — regression sweep (results land in /tmp/tpu_results)
set -u
cd "$(dirname "$0")/.." || exit 1
# After code changes, run tools/smoke_benchmarks.sh FIRST (CPU, tiny
# sizes): it exercises every script below end-to-end so a latent crash
# can't burn a real measurement slot.

RESULTS=${RESULTS_DIR:-/tmp/tpu_results}
mkdir -p "$RESULTS"
LOG="$RESULTS/log.txt"

stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

# One probe: a trivial jax op in a fresh process.  45 s was too tight
# when the remote compile service queues (measured 78 s for this
# one-op program on 2026-08-18 with the tunnel otherwise healthy);
# a dead tunnel still fails fast at the 300 s cap.
probe_once() {
  timeout 300 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.arange(8).sum()))" \
    > /dev/null 2>&1
}

# Bounded wait-for-recovery: 4 attempts, sleeps 60/180/300 s between
# (~18 min worst case incl. probe timeouts).  Logs probe health either
# way.  Returns 0 when the tunnel answers, 1 when the budget is spent.
wait_for_tunnel() {
  local sleeps=(60 180 300) attempt t0 dt
  for attempt in 1 2 3 4; do
    t0=$(date +%s)
    if probe_once; then
      dt=$(( $(date +%s) - t0 ))
      echo "[$(stamp)] probe-health: ok (attempt $attempt, ${dt}s)" \
        | tee -a "$LOG"
      return 0
    fi
    dt=$(( $(date +%s) - t0 ))
    echo "[$(stamp)] probe-health: DEAD (attempt $attempt, ${dt}s)" \
      | tee -a "$LOG"
    if [ "$attempt" -lt 4 ]; then
      echo "[$(stamp)] probe-health: sleeping ${sleeps[$((attempt-1))]}s" \
        | tee -a "$LOG"
      sleep "${sleeps[$((attempt-1))]}"
    fi
  done
  return 1
}

for cmd in \
    "python bench.py" \
    "python bench.py tests/fixtures/.cache/aerial_sh4_d9.npz" \
    "python benchmarks/motion1080p.py" \
    "python benchmarks/motion_guided1080p.py" \
    "python benchmarks/motion_guided1080p.py 8 3 32 4" \
    "python benchmarks/guided1080p.py" \
    "python benchmarks/foveated1080p.py" \
    "python benchmarks/orbit4k.py" \
    "python benchmarks/refine_throughput.py" \
    "python benchmarks/parity.py" \
    ; do
  # probe (with bounded recovery wait) BEFORE burning a measurement
  # slot; a persistently dead tunnel aborts with the remaining queue
  # named so a later run can resume where this one stopped.
  if ! wait_for_tunnel; then
    echo "[$(stamp)] TUNNEL DEAD after retry budget — aborting queue" \
      "at: $cmd" | tee -a "$LOG"
    exit 2
  fi
  name=$(echo "$cmd" | tr ' /' '__')
  echo "[$(stamp)] === $cmd" | tee -a "$LOG"
  t0=$(date +%s)
  timeout 3000 $cmd > "$RESULTS/$name.out" 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  # stamp the outcome with probe health AFTER the run too: rc!=0 with
  # a dead post-probe means "tunnel outage", not "benchmark regression"
  if [ "$rc" -ne 0 ] && ! probe_once; then
    health="post-probe DEAD (outage, not regression)"
  else
    health="post-probe ok"
  fi
  echo "[$(stamp)] rc=$rc ${dt}s $health $(tail -2 "$RESULTS/$name.out" \
    | tr '\n' ' ')" | tee -a "$LOG"
done
echo "[$(stamp)] queue complete" | tee -a "$LOG"
