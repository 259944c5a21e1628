#!/bin/bash
# Round-4 stage-J serialized TPU session: confirm the flipped defaults
# (UPSIDE_BP_RB=2 + UPSIDE_BP_LOCKSTEP=1) reproduce the r4h winner on a
# plain `python bench.py` (what the driver runs), then refresh the
# replica-scaling curve at the new per-eval cost.
set -u
cd /root/repo
LOG=bench_logs/r4j_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4j_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench 2400 BENCH_TUNNEL_WAIT=600 python bench.py
run benchall 8400 python tools/bench_all.py
echo "=== r4j session complete ($(date)); logs in $LOG"
