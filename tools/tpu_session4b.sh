#!/bin/bash
# Round-4 stage-B serialized TPU session: the prefix attribution re-run
# (stage A's crashed on the env-fusion default; perf_loop now pins
# UPSIDE_FUSE_ENV=0 in prefix mode), launched only after stage A exits.
set -u
cd /root/repo
# serialize behind stage A: wait for its driver log to end
while ! grep -q "r4a session complete" bench_logs/r4a_driver.log 2>/dev/null; do
  sleep 60
done
LOG=$(cat bench_logs/r4a_latest)
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}
run prefix2 5400 python tools/perf_loop.py 64 30 --prefix
echo "=== r4b session complete ($(date)); logs in $LOG"
