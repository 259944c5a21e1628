#!/bin/bash
# Round-5 stage-G serialized TPU session: re-measure at the slimmed
# resid layout (3 derivative planes + clamped coverage value plane,
# commit 41db1d6) and re-run the BP schedule A/Bs that r5f could not
# finish cleanly (its later steps imported mid-edit kernel code).
set -u
cd /root/repo
LOG=bench_logs/r5g_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5g_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

# the slimmed layout vs r5f base 20.646 ms/eval (same session-pair A/B)
run base256   2400 python tools/perf_loop.py 256 30 --only=full
run base512   2400 python tools/perf_loop.py 512 30 --only=full
# fused piece isolated: new fwd/bwd split
run fused256  2400 python tools/perf_loop.py 256 30 --only=fused
# clean BP schedule A/Bs on the new code
run chunk4    2400 UPSIDE_BP_CHUNK=4 python tools/perf_loop.py 256 30 --only=full
run damp005   2400 UPSIDE_BP_DAMPING=0.05 python tools/perf_loop.py 256 30 --only=full
run damp000   2400 UPSIDE_BP_DAMPING=0.0 python tools/perf_loop.py 256 30 --only=full
run bp_rb8    2400 UPSIDE_BP_RB=8 python tools/perf_loop.py 256 30 --only=full
run nofused   2400 python tools/perf_loop.py 256 30 --only=nofused
# headline artifact at the in-tree defaults
run bench     3600 python bench.py
echo "=== r5g session complete ($(date)); logs in $LOG"
