#!/bin/bash
# Launch-stretch sweep: if within-launch blocking is record-bound
# (M_REC park/commit exhaustion), raising M_REC (+ B cap + lower exit
# threshold) should cut the launch count and with it the gather rows.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  env ZRAYTRACE_BENCH_BALANCE=1 "$@" python bench.py 2>&1 | grep -E '^#|^\{' | grep -v WARNING
}
run ZRAYTRACE_K3_REC=8
run ZRAYTRACE_K3_REC=8 ZRAYTRACE_BENCH_B=320
run ZRAYTRACE_K3_REC=8 ZRAYTRACE_BENCH_B=320 ZRAYTRACE_BENCH_EXIT_NUM=1 ZRAYTRACE_BENCH_EXIT_DEN=2
run ZRAYTRACE_K3_REC=12 ZRAYTRACE_BENCH_B=320 ZRAYTRACE_BENCH_EXIT_NUM=1 ZRAYTRACE_BENCH_EXIT_DEN=2
run ZRAYTRACE_K3_REC=8 ZRAYTRACE_K3_TEX=6 ZRAYTRACE_BENCH_B=320 ZRAYTRACE_BENCH_EXIT_NUM=1 ZRAYTRACE_BENCH_EXIT_DEN=2
run ZRAYTRACE_K3_REC=6
