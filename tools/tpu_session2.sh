#!/bin/bash
# Follow-up round-3 TPU session: re-A/B the stacked BP variants after the
# _stack_cols Mosaic fix (one-hot column reductions instead of lane-offset
# concatenation).  Serialized: never run while another TPU client is live.
set -u
cd /root/repo
LOG=bench_logs/r3b_$(date +%m%d_%H%M)
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

for v in 1 2 3; do
  run bp$v 2400 UPSIDE_BP_STACKED=$v python tools/perf_loop.py 64 30 --only=bp
done

WINNER=$(for v in 1 2 3; do
  grep -q 'NUMERIC CHECK FAILED' "$LOG/bp$v.log" && continue
  ms=$(sed -n 's|.*fwd+VJP *\([0-9.]*\) ms/iter.*|\1|p' "$LOG/bp$v.log" | head -1)
  [ -n "$ms" ] && echo "$ms $v"
done | sort -n | head -1 | awk '{print $2}')
echo "${WINNER:-none}" > "$LOG/bp_winner"
echo "=== stacked winner (vs 2.647 ms baseline for v0): ${WINNER:-none}"

if [ -n "$WINNER" ]; then
  run full$WINNER 2400 UPSIDE_BP_STACKED=$WINNER python tools/perf_loop.py 64 30 --only=full
fi
echo "=== session2 complete ($(date)); logs in $LOG"
