#!/bin/bash
# Round-4 stage-H serialized TPU session: lockstep BP solve A/B at an
# MD-like sweep count (--bp-jolt=1e-2 -> ~6 sweeps; the lockstep win
# scales with sweeps, so the 2-sweep default jolt would hide it).
# Baseline from r4f: RB=1 fwd+VJP 2.735 ms at jolt 1e-2.
# Serialized: never run while another TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r4h_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4h_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run base 2400 python tools/perf_loop.py 64 30 --only=bp --bp-jolt=1e-2
for k in 2 4 8; do
  run ls$k 2400 UPSIDE_BP_RB=$k UPSIDE_BP_LOCKSTEP=1 \
      python tools/perf_loop.py 64 30 --only=bp --bp-jolt=1e-2
done

ms() { sed -n 's|.*fwd+VJP *\([0-9.]*\) ms/iter.*|\1|p' "$LOG/$1.log" | head -1; }
BASE=$(ms base)
WINNER=""
BEST=$BASE
for k in 2 4 8; do
  grep -q 'NUMERIC CHECK FAILED' "$LOG/ls$k.log" && continue
  M=$(ms ls$k)
  [ -n "$M" ] && awk "BEGIN{exit !($M < $BEST)}" && { BEST=$M; WINNER=$k; }
done
echo "${WINNER:-none}" > "$LOG/ls_winner"
echo "=== lockstep winner: RB=${WINNER:-none} (base $BASE best $BEST)"

if [ -n "$WINNER" ]; then
  run fullls 2400 UPSIDE_BP_RB=$WINNER UPSIDE_BP_LOCKSTEP=1 \
      python tools/perf_loop.py 64 30 --only=full
  run benchls 2400 UPSIDE_BP_RB=$WINNER UPSIDE_BP_LOCKSTEP=1 \
      BENCH_TUNNEL_WAIT=300 python bench.py
fi
echo "=== r4h session complete ($(date)); logs in $LOG"
