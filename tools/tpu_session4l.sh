#!/bin/bash
# Round-4 stage-L serialized TPU session: member-glue isolation.
#   memb (fused stubbed) - bp piece = the XLA glue between the kernels
#   (E1 assembly, cov/env post-processing, gather chains + their
#   scatter-add backwards).  Decides whether one-hot-matmul gather
#   replacement is worth building.
set -u
cd /root/repo
LOG=bench_logs/r4l_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4l_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run memb 3600 python tools/perf_loop.py 64 30 --only=memb --bp-jolt=1e-2
run bp 2400 python tools/perf_loop.py 64 30 --only=bp
# the VERDICT round-3 directive's operating point, for comparability
run bench64 2400 BENCH_REPLICAS=64 BENCH_TUNNEL_WAIT=600 python bench.py
echo "=== r4l session complete ($(date)); logs in $LOG"
