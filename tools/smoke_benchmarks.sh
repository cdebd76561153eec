#!/bin/bash
# CPU smoke of every benchmark script (see benchmarks/_overrides.py):
# catches latent crashes from code changes before a real measurement
# run burns accelerator time.  Numbers are meaningless by design; each
# JSON line carries "smoke": true.
set -u
cd "$(dirname "$0")/.." || exit 1
export BENCH_FORCE_CPU=1
fail=0
run() {
  echo "=== $*"
  if ! timeout 900 "$@"; then
    echo "SMOKE FAILURE: $*" >&2
    fail=1
  fi
}
BENCH_WH=128x72             run python bench.py 5
BENCH_WH=160x90 BENCH_DEPTH=5 run python benchmarks/motion1080p.py 4 3
BENCH_WH=160x90 BENCH_DEPTH=5 run python benchmarks/motion_guided1080p.py 3 3 16
BENCH_WH=160x90 BENCH_DEPTH=5 run python benchmarks/motion_guided1080p.py 3 3 16 4
BENCH_WH=160x96 BENCH_DEPTH=5 run python benchmarks/guided1080p.py 16
BENCH_WH=160x96 BENCH_DEPTH=5 run python benchmarks/foveated1080p.py 4 4 3
BENCH_WH=256x144 BENCH_DEPTH=5 run python benchmarks/orbit4k.py 3
BENCH_DEPTH=5               run python benchmarks/refine_throughput.py 2
run python benchmarks/parity.py 200
run python benchmarks/dma_gather_probe.py 12
exit $fail
