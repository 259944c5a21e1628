#!/bin/bash
# Round-5 stage-H serialized TPU session: the resid backward with the
# column axis folded into the block (one grid step per (replica-block,
# row-tile); 3x fewer steps).  r5g closed the BP schedule knobs as
# noise-level (chunk4 +0.11, damp005 +0.10 vs base256 20.430), so the
# remaining levers are kernel-structural.
set -u
cd /root/repo
LOG=bench_logs/r5h_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5h_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run base256   2400 python tools/perf_loop.py 256 30 --only=full
run fused256  2400 python tools/perf_loop.py 256 30 --only=fused
run base512   2400 python tools/perf_loop.py 512 30 --only=full
# wider replica blocks: with the fold, rb=16 halves the step count again
run rbb16     2400 UPSIDE_RB_BWD=16 python tools/perf_loop.py 256 30 --only=full
run nofused   2400 python tools/perf_loop.py 256 30 --only=nofused
run bench     3600 python bench.py
echo "=== r5h session complete ($(date)); logs in $LOG"
