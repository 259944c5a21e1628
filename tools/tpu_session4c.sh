#!/bin/bash
# Round-4 stage-C serialized TPU session: replica-blocked BP kernel A/B
# (UPSIDE_BP_RB in {1,2,4,8} on the stacked-variant-2 kernel), then the
# end-to-end effect of the winner.  Serialized: never run while another
# TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r4c_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4c_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

for rb in 1 2 4 8; do
  run rb$rb 2400 UPSIDE_BP_RB=$rb python tools/perf_loop.py 64 30 --only=bp
done
WINNER=$(for rb in 1 2 4 8; do
  grep -q 'NUMERIC CHECK FAILED' "$LOG/rb$rb.log" && continue
  ms=$(sed -n 's|.*fwd+VJP *\([0-9.]*\) ms/iter.*|\1|p' "$LOG/rb$rb.log" | head -1)
  [ -n "$ms" ] && echo "$ms $rb"
done | sort -n | head -1 | awk '{print $2}')
WINNER=${WINNER:-1}
echo "$WINNER" > "$LOG/rb_winner"
echo "=== BP replica-block winner: UPSIDE_BP_RB=$WINNER"

if [ "$WINNER" != "1" ]; then
  run fullrb 2400 UPSIDE_BP_RB=$WINNER python tools/perf_loop.py 64 30 --only=full
  run benchrb 2400 UPSIDE_BP_RB=$WINNER BENCH_TUNNEL_WAIT=300 python bench.py
fi
echo "=== r4c session complete ($(date)); logs in $LOG"
