#!/bin/bash
# Round-4 stage-G serialized TPU session:
#   1. downstream-block piece (fused kernel + member nodes + warm BP,
#      e+g wrt upstream outputs) at an MD-like BP sweep count — closes
#      the ~1.9 ms/eval attribution gap (full - up - down = residual)
#   2. bench.py at the new 256-replica default operating point
# Serialized: never run while another TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r4g_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4g_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run down 3600 python tools/perf_loop.py 64 30 --only=down --bp-jolt=1e-2
run bench256 2400 BENCH_TUNNEL_WAIT=300 python bench.py
echo "=== r4g session complete ($(date)); logs in $LOG"
