#!/bin/bash
# Round-5 stage-I serialized TPU session: final tuning at the reverted
# (best in-context) kernel state — the 41db1d6 slimmed resid layout.
# Probes: replica-block sizes for the resid backward/forward, the
# 768-replica operating point (the resid path shifted the HBM balance
# since the r4o 512-is-max scan), the nofused subtractive datum, and
# the headline bench at in-tree defaults.
set -u
cd /root/repo
LOG=bench_logs/r5i_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5i_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run base256   2400 python tools/perf_loop.py 256 30 --only=full
run base512   2400 python tools/perf_loop.py 512 30 --only=full
run rbb16     2400 UPSIDE_RB_BWD=16 python tools/perf_loop.py 256 30 --only=full
run rbf16     2400 UPSIDE_RB_FWD=16 python tools/perf_loop.py 256 30 --only=full
run base768   2400 python tools/perf_loop.py 768 30 --only=full
run nofused   2400 python tools/perf_loop.py 256 30 --only=nofused
run bench     3600 python bench.py
echo "=== r5i session complete ($(date)); logs in $LOG"
