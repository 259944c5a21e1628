#!/bin/bash
# Round-5 stage-D serialized TPU session: fresh cost map at the new
# defaults (resid backward on) at the 256-replica operating point, to
# rank the next optimization (VERDICT r5 directive 2), plus the first
# TPU timing of the differentiable-training path (directive 5).
set -u
cd /root/repo
LOG=bench_logs/r5d_$(date +%m%d_%H%M)
mkdir -p "$LOG"
echo "$LOG" > bench_logs/r5d_latest

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date))"
  timeout "$tmo" env "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date))"
}

run full_256    2400 python tools/perf_loop.py 256 30 --only=full
run pieces_256  3600 python tools/perf_loop.py 256 30 --only=up,fused,bp
run nobp_256    2400 python tools/perf_loop.py 256 30 --only=nobp
run nofused_256 2400 python tools/perf_loop.py 256 30 --only=nofused
run training    2400 python -c "import sys; sys.path.insert(0,'.'); \
import tools.bench_all as ba; t_dev, t_total = ba.training_throughput(); \
print('training: %.2f ms/step device (%.1f steps/s), one-shot %.1f ms' \
% (t_dev*1e3, 1.0/t_dev, t_total*1e3))"
echo "=== r5d session complete ($(date)); logs in $LOG"
