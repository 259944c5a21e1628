#!/bin/bash
# Round-4 stage-D serialized TPU session:
#   1. bench.py at HEAD (first measurement of the VPU multiply-reduce
#      einsum rewrite, commit 492dcd8)
#   2. prefix attribution WITH the new prefix-0 glue baseline (splits
#      affine_alignment from fori_loop/vmap overhead)
#   3. piece timings at HEAD (up/fused/bp/full)
#   4. full bench_all table incl. the new 384/512-replica scaling points
# Serialized: never run while another TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r4d_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4d_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench 2400 BENCH_TUNNEL_WAIT=300 python bench.py
run prefix0 5400 python tools/perf_loop.py 64 30 --prefix
run pieces 3600 python tools/perf_loop.py 64 30 --only=up,fused,bp,full
run benchall 7200 python tools/bench_all.py
echo "=== r4d session complete ($(date)); logs in $LOG"
