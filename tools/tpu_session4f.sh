#!/bin/bash
# Round-4 stage-F serialized TPU session: honest piece attribution at
# HEAD defaults.
#   1. pieces at HEAD (up/fused/bp/full) — the r4d pieces run crashed on
#      a perf_loop bug (since fixed); this is the first clean piece map
#      at the round-4 defaults
#   2. BP sweep-calibrated cost: --bp-jolt sweep to find the amplitude
#      whose mean sweep count matches bench.py's bp_sweeps_mean (~6.9),
#      then read the in-MD BP cost at that jolt (the default 1e-6 jolt
#      underestimates: warm start nearly converged)
#   3. BP assembly-vs-solve split (--bp-zero: max_iter=0)
# Serialized: never run while another TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r4f_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4f_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run pieces 3600 python tools/perf_loop.py 64 30 --only=up,fused,bp,full
run glue 2400 python tools/perf_loop.py 64 30 --only=glue
run bpjolt3e3 2400 python tools/perf_loop.py 64 30 --only=bp --bp-jolt=3e-3
run bpjolt1e2 2400 python tools/perf_loop.py 64 30 --only=bp --bp-jolt=1e-2
run bpzero 2400 python tools/perf_loop.py 64 30 --only=bp --bp-zero
echo "=== r4f session complete ($(date)); logs in $LOG"
