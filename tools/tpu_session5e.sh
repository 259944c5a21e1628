#!/bin/bash
# Round-5 stage-E serialized TPU session: block-size A/B sweep at the
# new defaults (resid backward on).  The RB_FWD/RB_BWD=8 and BP
# RB=2+lockstep defaults were tuned for the OLD recomputing backward;
# the resid backward has a different VPU/HBM balance (lighter compute,
# extra planes traffic), so re-sweep at the 256-replica operating point
# on the full-advance metric (the only number that matters).
set -u
cd /root/repo
LOG=bench_logs/r5e_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5e_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

# pair-kernel replica blocks (full advance; default 8/8 measured in r5d)
run rb_fwd4   2400 UPSIDE_RB_FWD=4  python tools/perf_loop.py 256 30 --only=full
run rb_fwd16  2400 UPSIDE_RB_FWD=16 python tools/perf_loop.py 256 30 --only=full
run rb_bwd4   2400 UPSIDE_RB_BWD=4  python tools/perf_loop.py 256 30 --only=full
run rb_bwd16  2400 UPSIDE_RB_BWD=16 python tools/perf_loop.py 256 30 --only=full
# BP replica block (aliasing landed in r4n; RB=8 OOM'd before it)
run bp_rb4    2400 UPSIDE_BP_RB=4 python tools/perf_loop.py 256 30 --only=full
run bp_rb8    2400 UPSIDE_BP_RB=8 python tools/perf_loop.py 256 30 --only=full
# convergence-check cadence (schedule only, fixed point unchanged)
run bp_chunk1 2400 UPSIDE_BP_CHUNK=1 python tools/perf_loop.py 256 30 --only=full
run bp_chunk4 2400 UPSIDE_BP_CHUNK=4 python tools/perf_loop.py 256 30 --only=full
# re-run the nofused subtractive piece (stub signature fixed)
run nofused_256 2400 python tools/perf_loop.py 256 30 --only=nofused
echo "=== r5e session complete ($(date)); logs in $LOG"
