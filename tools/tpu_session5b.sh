#!/bin/bash
# Round-5 stage-B serialized TPU session: the derivative-fields backward
# (UPSIDE_FUSED_RESID, BENCH_NOTES round-5 target #1) measured 3.801 vs
# 4.398 ms/eval on the isolated fused piece at 64 reps (r5a).  This
# session measures it in context: full force evaluation at 64 reps, and
# the end-to-end bench at the 256/512-replica operating points (with the
# Pallas-vs-XLA agreement gate).
set -u
cd /root/repo
LOG=bench_logs/r5b_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5b_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run full_resid 3600 UPSIDE_FUSED_RESID=1 python tools/perf_loop.py 64 30 --only=full
run full_base  1800 python tools/perf_loop.py 64 30 --only=full
run bench_resid_256 3600 UPSIDE_FUSED_RESID=1 BENCH_REPLICAS=256 python bench.py
run bench_resid_512 3600 UPSIDE_FUSED_RESID=1 python bench.py
echo "=== r5b session complete ($(date)); logs in $LOG"
