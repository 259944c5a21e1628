#!/bin/bash
# Round-4 stage-K serialized TPU session: fused-kernel replica-block
# sweep AT THE 256-REPLICA OPERATING POINT (RB_FWD=8/RB_BWD=4 were tuned
# at 64 reps in round 3; more replicas may amortize the VMEM coefficient
# planes further), then bench.py at the winner.
set -u
cd /root/repo
LOG=bench_logs/r4k_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r4k_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

for combo in 8_4 16_8 32_8 16_4 8_8; do
  F=${combo%_*}; B=${combo#*_}
  run rb${combo} 3000 UPSIDE_RB_FWD=$F UPSIDE_RB_BWD=$B \
      python tools/perf_loop.py 256 30 --only=full
done

ms() { sed -n 's|.*full advance (context) *\([0-9.]*\) ms/eval.*|\1|p' "$LOG/rb$1.log" | head -1; }
BASE=$(ms 8_4); BEST=$BASE; WINNER=8_4
for combo in 16_8 32_8 16_4 8_8; do
  M=$(ms $combo)
  [ -n "$M" ] && awk "BEGIN{exit !($M < $BEST)}" && { BEST=$M; WINNER=$combo; }
done
echo "$WINNER" > "$LOG/rb_winner"
echo "=== fused RB winner at 256 reps: $WINNER (base $BASE best $BEST)"

if [ "$WINNER" != "8_4" ]; then
  F=${WINNER%_*}; B=${WINNER#*_}
  run benchrb 2400 UPSIDE_RB_FWD=$F UPSIDE_RB_BWD=$B BENCH_TUNNEL_WAIT=600 python bench.py
fi
echo "=== r4k session complete ($(date)); logs in $LOG"
