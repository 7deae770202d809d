#!/bin/bash
# Balanced-assignment knob sweep on the official 7-spheres bench.
# The 131072-lane points are where the per-lane miss MAX was measured
# as the launch-count pin (imbalance 1.87, PERF.md) — balance should
# bite hardest there. 65536-lane points retune exit/B with the
# flattened tail.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  env "$@" python bench.py 2>&1 | grep -E '^#|^\{' | grep -v WARNING
}
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_BENCH_LANES=131072 ZRAYTRACE_BENCH_GROUPS=16
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_BENCH_LANES=131072 ZRAYTRACE_BENCH_GROUPS=8
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_BENCH_EXIT_NUM=1 ZRAYTRACE_BENCH_EXIT_DEN=2
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_BENCH_B=224
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_K3_CACHE=8
run ZRAYTRACE_BENCH_BALANCE=1 ZRAYTRACE_BENCH_CALIB_SPP=64
