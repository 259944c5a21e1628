#!/bin/bash
# Serialized round-3 TPU measurement session (BENCH_NOTES pending queue).
# TPU jobs MUST be serialized: two concurrent TPU processes fault on the
# remote tunnel. Each step logs to bench_logs/; inspect and transcribe
# into BENCH_NOTES.md afterwards.
set -u
cd /root/repo
LOG=bench_logs/r3_$(date +%m%d_%H%M)
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

# 1. BP kernel variant A/B (per-plane / stacked / stacked+broadcast)
run bp0 2400 UPSIDE_BP_STACKED=0 python tools/perf_loop.py 64 30 --only=bp
run bp1 2400 UPSIDE_BP_STACKED=1 python tools/perf_loop.py 64 30 --only=bp
run bp2 2400 UPSIDE_BP_STACKED=2 python tools/perf_loop.py 64 30 --only=bp
run bp3 2400 UPSIDE_BP_STACKED=3 python tools/perf_loop.py 64 30 --only=bp
# 1b. assembly-only (zero-sweep) cost of the two leading variants
run bp0z 2400 UPSIDE_BP_STACKED=0 python tools/perf_loop.py 64 30 --only=bp --bp-zero
run bp1z 2400 UPSIDE_BP_STACKED=1 python tools/perf_loop.py 64 30 --only=bp --bp-zero
# 2. full piece timings at the default variant
run pieces 3600 python tools/perf_loop.py 64 30
# 2b. fused pair block replica-block-size sweep
run rbhi 2400 UPSIDE_RB_FWD=16 UPSIDE_RB_BWD=8 python tools/perf_loop.py 64 30 --only=fused
run rblo 2400 UPSIDE_RB_FWD=4 UPSIDE_RB_BWD=2 python tools/perf_loop.py 64 30 --only=fused
# 3. per-node upstream attribution (many small compiles)
run prefix 5400 python tools/perf_loop.py 64 30 --prefix
# 4. headline + all BASELINE configs / scaling curve
# short tunnel-wait: the session only starts once the tunnel answered,
# and the watchdog must emit its error JSON inside this step's timeout
run bench 3600 BENCH_TUNNEL_WAIT=600 python bench.py
run bench_all 7200 python tools/bench_all.py
echo "=== session complete ($(date)); logs in $LOG"
