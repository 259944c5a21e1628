#!/bin/bash
# Round-4 stage-I serialized TPU session: plain-defaults measurement at
# HEAD (padded-grid handoff in, lockstep OFF) to isolate the handoff
# effect from the r4h lockstep A/B, plus the downstream-block piece for
# the before/after of the member-glue cost.
set -u
cd /root/repo
LOG=bench_logs/r4i_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4i_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench 2400 BENCH_TUNNEL_WAIT=600 python bench.py
run down 3600 python tools/perf_loop.py 64 30 --only=down --bp-jolt=1e-2
run full 2400 python tools/perf_loop.py 64 30 --only=full
echo "=== r4i session complete ($(date)); logs in $LOG"
