#!/bin/bash
# Round-4 stage-R serialized TPU session: A/B the prepared-operand fused
# path (UPSIDE_FUSED_PREP; PairFusionPlan.prepare threads the
# parameter-only staging through the jit boundary once per advance call
# instead of rebuilding it every force evaluation — the optimized HLO
# showed XLA never hoists that ~150-200 MB/eval chain).  Expected win:
# ~0.4-0.5 ms/eval at 64 reps; ~2% at the 256-replica headline (the
# staging is replica-independent).
set -u
cd /root/repo
LOG=bench_logs/r4r_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4r_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run full_prep0 3600 UPSIDE_FUSED_PREP=0 python tools/perf_loop.py 64 30 --only=full
run full_prep1 3600 UPSIDE_FUSED_PREP=1 python tools/perf_loop.py 64 30 --only=full
run bench_prep1 2400 BENCH_REPLICAS=256 BENCH_TUNNEL_WAIT=600 python bench.py
run bench64_prep1 2400 BENCH_REPLICAS=64 BENCH_TUNNEL_WAIT=600 python bench.py
echo "=== r4r session complete ($(date)); logs in $LOG"
