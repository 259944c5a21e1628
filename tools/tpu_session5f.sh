#!/bin/bash
# Round-5 stage-F serialized TPU session: BP schedule A/Bs at the new
# defaults (resid backward on), finishing what r5e did not reach.
# All knobs here are schedule-only (fixed point unchanged): convergence
# check cadence, warm-start extrapolation mode/strength, damping.
# Metric: full advance @256 replicas (the only number that matters).
set -u
cd /root/repo
LOG=bench_logs/r5f_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5f_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

# baseline at today's defaults for drift control
run base      2400 python tools/perf_loop.py 256 30 --only=full
# convergence-check cadence (r5e ran out before these)
run bp_chunk1 2400 UPSIDE_BP_CHUNK=1 python tools/perf_loop.py 256 30 --only=full
run bp_chunk3 2400 UPSIDE_BP_CHUNK=3 python tools/perf_loop.py 256 30 --only=full
run bp_chunk4 2400 UPSIDE_BP_CHUNK=4 python tools/perf_loop.py 256 30 --only=full
# warm-start extrapolation: full (messages too) vs nb-only default, and
# alpha strength around the default 1.0
run ex_both   2400 UPSIDE_BP_EXTRAP=1.0 python tools/perf_loop.py 256 30 --only=full
run ex_nb15   2400 UPSIDE_BP_EXTRAP=nb:1.5 python tools/perf_loop.py 256 30 --only=full
run ex_nb07   2400 UPSIDE_BP_EXTRAP=nb:0.7 python tools/perf_loop.py 256 30 --only=full
# damping below the current 0.1 (bp_damping_exp showed warm solves like
# LESS damping; 0.1 was the lowest tried in r4c)
run damp005   2400 UPSIDE_BP_DAMPING=0.05 python tools/perf_loop.py 256 30 --only=full
run damp000   2400 UPSIDE_BP_DAMPING=0.0 python tools/perf_loop.py 256 30 --only=full
# unfinished r5e steps
run bp_rb8    2400 UPSIDE_BP_RB=8 python tools/perf_loop.py 256 30 --only=full
run nofused_256 2400 python tools/perf_loop.py 256 30 --only=nofused
echo "=== r5f session complete ($(date)); logs in $LOG"
