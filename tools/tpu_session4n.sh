#!/bin/bash
# Round-4 stage-N serialized TPU session:
#   1. lockstep-RB end-to-end A/B at the 256-replica headline operating
#      point: RB=2 (default) vs RB=4 vs RB=8 (un-OOMed this session by
#      aliasing donated inputs onto same-shaped outputs — E_pair->dE,
#      nb0->nb, eb0->eb — freeing ~8 MB of VMEM windows).
#   2. Same-session isolated-fused vs down/memb pieces at TODAY's
#      defaults: the r4f "1.4 ms inter-kernel exposure" compared numbers
#      measured under different RB_BWD defaults across sessions; the
#      jaxpr audit (tools/jaxpr_audit.py) shows the downstream block is
#      structurally clean (3 pallas calls, zero >=1MB/replica XLA
#      intermediates after DCE), so this either pins a real Mosaic-level
#      exposure or retires the claim.
set -u
cd /root/repo
LOG=bench_logs/r4n_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4n_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

# 1. bench A/B at 256 reps (RB=2 is the committed default / control)
run bench_rb2 2400 BENCH_REPLICAS=256 BENCH_TUNNEL_WAIT=600 python bench.py
run bench_rb4 2400 BENCH_REPLICAS=256 UPSIDE_BP_RB=4 BENCH_TUNNEL_WAIT=600 python bench.py
run bench_rb8 2400 BENCH_REPLICAS=256 UPSIDE_BP_RB=8 BENCH_TUNNEL_WAIT=600 python bench.py

# 2. same-session piece calibration at today's defaults, 64 reps
run fused 2400 python tools/perf_loop.py 64 30 --only=fused
run down 3600 python tools/perf_loop.py 64 30 --only=down --bp-jolt=1e-2
run memb 2400 python tools/perf_loop.py 64 30 --only=memb --bp-jolt=1e-2

echo "=== r4n session complete ($(date)); logs in $LOG"
