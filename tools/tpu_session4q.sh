#!/bin/bash
# Round-4 stage-Q serialized TPU session: locate the fused block's
# in-context overhead (r4p: 3.86 ms/eval marginal vs 2.07 isolated).
#   fusedsq   adds data-dependent cotangents -> isolates bwd cotangent
#             staging (unhoistable gg/gcs).
#   fusedtab  additionally jolts the parameter tables -> forces the
#             parameter-only operand staging (_fused_prep slab einsums,
#             hi/lo split, one-hots) to run per iteration, emulating a
#             LICM failure inside the advance's nested scan/cond.
# If fusedtab ~= the r4p in-context marginal, precomputing the static
# staging once per advance call is the fix (expected ~+15-20% headline).
set -u
cd /root/repo
LOG=bench_logs/r4q_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4q_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run fusedvar 3600 python tools/perf_loop.py 64 30 --only=fused --fused-sq --fused-jolt-tab
echo "=== r4q session complete ($(date)); logs in $LOG"
