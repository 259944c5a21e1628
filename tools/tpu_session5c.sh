#!/bin/bash
# Round-5 stage-C serialized TPU session: re-capture the headline at the
# NEW defaults (UPSIDE_FUSED_RESID=1 flipped on in-tree) at the 512
# operating point plus the 256 and 64-replica comparability points
# (VERDICT r4 directive 4: always publish the 64-rep row).
set -u
cd /root/repo
LOG=bench_logs/r5c_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5c_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench_512 3600 python bench.py
run bench_256 1800 BENCH_REPLICAS=256 python bench.py
run bench_64  1800 BENCH_REPLICAS=64  python bench.py
echo "=== r5c session complete ($(date)); logs in $LOG"
