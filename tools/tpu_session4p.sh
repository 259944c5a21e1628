#!/bin/bash
# Round-4 stage-P serialized TPU session: subtractive in-context
# attribution.  full − nobp = BP's true in-context marginal;
# full − nofused = the fused block's true in-context marginal (fwd +
# bwd + operand staging).  Decides where the ~1.2 ms/eval gap between
# the isolated-piece sum and the real advance actually lives.
set -u
cd /root/repo
LOG=bench_logs/r4p_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4p_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run full 3600 python tools/perf_loop.py 64 30 --only=full
run nobp 3600 python tools/perf_loop.py 64 30 --only=nobp
run nofused 3600 python tools/perf_loop.py 64 30 --only=nofused
echo "=== r4p session complete ($(date)); logs in $LOG"
