#!/bin/bash
# Round-4 stage-M serialized TPU session:
#   1. down/memb with BP sweep reporting — closes the last attribution
#      gap (is the down-vs-parts delta extrapolation-mispredicted BP
#      sweeps or real inter-kernel exposure?)
#   2. 768/1024-replica scaling points (r4j curve still rising at 512)
set -u
cd /root/repo
LOG=bench_logs/r4m_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4m_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run down 3600 python tools/perf_loop.py 64 30 --only=down --bp-jolt=1e-2
run memb 3600 python tools/perf_loop.py 64 30 --only=memb --bp-jolt=1e-2
run bench768 3000 BENCH_REPLICAS=768 BENCH_TUNNEL_WAIT=600 python bench.py
run bench1024 3000 BENCH_REPLICAS=1024 BENCH_TUNNEL_WAIT=600 python bench.py
echo "=== r4m session complete ($(date)); logs in $LOG"
