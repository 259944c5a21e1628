#!/bin/bash
# Round-5 stage-J serialized TPU session: final-state refresh of the
# comparability points (VERDICT r4 #4 policy: the 64-replica row rides
# every artifact) and the all-configs bench_all table, so every number
# the round's docs quote was measured at the shipped defaults.
set -u
cd /root/repo
LOG=bench_logs/r5j_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5j_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench_256 1800 BENCH_REPLICAS=256 python bench.py
run bench_64  1800 BENCH_REPLICAS=64  python bench.py
run bench_all 5400 python tools/bench_all.py
echo "=== r5j session complete ($(date)); logs in $LOG"
