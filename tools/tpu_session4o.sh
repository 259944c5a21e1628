#!/bin/bash
# Round-4 stage-O serialized TPU session: refresh ALL bench_all rows at
# the round-4 FINAL defaults (lockstep BP RB=2/winner-of-r4n + aliased
# donated inputs + RB_BWD=8 + padded-grid handoff + env fusion +
# stacked-2 + extrapolated warm starts), so the round-close artifacts
# (T-rex, H-rex, chi1 split, scaling curve, projection table) are all
# measured under one configuration.
set -u
cd /root/repo
LOG=bench_logs/r4o_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4o_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench_all 7200 python tools/bench_all.py
echo "=== r4o session complete ($(date)); logs in $LOG"
