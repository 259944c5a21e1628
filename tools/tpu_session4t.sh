#!/bin/bash
# Round-4 stage-T serialized TPU session: bound the round-5 #1 candidate
# (derivative-fields-from-forward) empirically.  UPSIDE_FUSED_BWD_MOCK=1
# replaces the backward kernel's poly-select recompute with cheap
# stand-ins (WRONG numbers, timing only): fwd+bwd(mock) - fwd = the
# floor a field-consuming backward could reach; the gap vs the real
# fwd+bwd = the maximum VPU savings, to be weighed against the ~2x
# 4.7 MB/replica HBM round trip the fields would cost.
set -u
cd /root/repo
LOG=bench_logs/r4t_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4t_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run fused_real 3600 python tools/perf_loop.py 64 30 --only=fused
run fused_mock 3600 UPSIDE_FUSED_BWD_MOCK=1 python tools/perf_loop.py 64 30 --only=fused
echo "=== r4t session complete ($(date)); logs in $LOG"
