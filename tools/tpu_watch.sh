#!/bin/bash
# Watch for the remote-TPU tunnel to come back, then run the serialized
# measurement session (tools/tpu_session.sh) exactly once.
#
# The axon tunnel serves one claim at a time and can wedge server-side;
# recovery is just waiting.  Probe cheaply with a bounded jax.devices()
# call; on success exec the session so only one TPU client ever runs.
set -u
cd /root/repo
mkdir -p bench_logs
STATUS=bench_logs/tunnel_status
while true; do
  # alive = devices() answered AND did not fall back to CPU (a CPU
  # fallback would burn the one-shot session on the wrong backend)
  if timeout 180 python -c "import jax; print(jax.devices())" > "$STATUS.probe" 2>&1 \
      && ! grep -qi cpudevice "$STATUS.probe"; then
    echo "alive $(date)" >> "$STATUS"
    exec bash tools/tpu_session.sh
  fi
  echo "wedged $(date)" >> "$STATUS"
  sleep 600
done
