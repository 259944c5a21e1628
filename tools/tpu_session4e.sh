#!/bin/bash
# Round-4 stage-E serialized TPU session: prodlog BP-kernel A/B
# (UPSIDE_BP_PRODLOG pins identity-plane messages to exactly 1.0 and
# replaces the per-sweep (SL,128) log with a lane product — same fixed
# point, see ops/pallas_bp.py:_stacked_solve_bethe), then the end-to-end
# effect of the winner.  Serialized: never run while another TPU client
# is live.
set -u
cd /root/repo
LOG=bench_logs/r4e_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4e_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run bp_log 2400 UPSIDE_BP_PRODLOG=0 python tools/perf_loop.py 64 30 --only=bp
run bp_pl  2400 UPSIDE_BP_PRODLOG=1 python tools/perf_loop.py 64 30 --only=bp

ms() { sed -n 's|.*fwd+VJP *\([0-9.]*\) ms/iter.*|\1|p' "$LOG/$1.log" | head -1; }
LOGMS=$(ms bp_log); PLMS=$(ms bp_pl)
WINNER=0
if [ -n "$PLMS" ] && [ -n "$LOGMS" ] \
   && ! grep -q 'NUMERIC CHECK FAILED' "$LOG/bp_pl.log" \
   && awk "BEGIN{exit !($PLMS < $LOGMS)}"; then
  WINNER=1
fi
echo "$WINNER" > "$LOG/pl_winner"
echo "=== prodlog winner: UPSIDE_BP_PRODLOG=$WINNER (log $LOGMS vs pl $PLMS)"

if [ "$WINNER" = "1" ]; then
  run fullpl  2400 UPSIDE_BP_PRODLOG=1 python tools/perf_loop.py 64 30 --only=full
  run benchpl 2400 UPSIDE_BP_PRODLOG=1 BENCH_TUNNEL_WAIT=300 python bench.py
fi
echo "=== r4e session complete ($(date)); logs in $LOG"
