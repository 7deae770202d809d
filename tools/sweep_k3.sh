#!/bin/bash
# Sequential 7-spheres bench sweep for the round-3 K-slot megakernel
# glue (cross-group cache share + cond-gated slot gathers).
# Usage: tools/sweep_k3.sh <logfile>
LOG=${1:-/tmp/sweep_k3.log}
cd /root/repo
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 3000 python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}
# 1. new defaults (share+condgather) at the committed B=28 e=3/5, diag on
run ZRAYTRACE_K3_DIAG=1 ZRAYTRACE_BENCH_B=28
# 2. longer launches (share should stretch them)
run ZRAYTRACE_K3_DIAG=1 ZRAYTRACE_BENCH_B=96
run ZRAYTRACE_K3_DIAG=1 ZRAYTRACE_BENCH_B=224
echo "SWEEP DONE $(date +%H:%M:%S)" >> "$LOG"
