#!/bin/bash
# Round-4 stage-A serialized TPU session: the measurements round 3 had to
# drop (VERDICT round 3, directive #1), run with the now-default winners
# (UPSIDE_BP_STACKED=2, UPSIDE_FUSE_ENV=1).  TPU jobs MUST be serialized:
# two concurrent TPU processes fault on the remote tunnel.
#
#   1. bench     — headline sanity with the flipped defaults (expect ~8.5k)
#   2. prefix    — per-node attribution of the ~3.35 ms upstream block
#   3. fullbase  — end-to-end at the new defaults (extrap nb:1.0, damping
#                  0.1 via the bench configs)
#   4. fullwarm  — UPSIDE_BP_EXTRAP=off   (extrapolation's end-to-end worth)
#   5. fulldamp04— UPSIDE_BP_DAMPING=0.4  (damping schedule's worth)
set -u
cd /root/repo
LOG=bench_logs/r4a_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4a_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bench 2400 BENCH_TUNNEL_WAIT=300 python bench.py
run prefix 5400 python tools/perf_loop.py 64 30 --prefix
run fullbase 2400 python tools/perf_loop.py 64 30 --only=full
run fullwarm 2400 UPSIDE_BP_EXTRAP=off python tools/perf_loop.py 64 30 --only=full
run fulldamp04 2400 UPSIDE_BP_DAMPING=0.4 python tools/perf_loop.py 64 30 --only=full
echo "=== r4a session complete ($(date)); logs in $LOG"
