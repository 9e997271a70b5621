#!/bin/bash
# Poll until the TPU tunnel answers, then run the sequential validation
# pipeline (scripts/tpu_validate.sh). Logs to /tmp/tpu_wait.log; pipeline
# logs to /tmp/tpu_validate/. Run inside tmux so it survives the session.
set -u
cd "$(dirname "$0")/.."
echo "waiting for TPU tunnel ($(date +%H:%M:%S))" | tee /tmp/tpu_wait.log
while true; do
  if timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
      >/dev/null 2>&1; then
    echo "TPU UP ($(date +%H:%M:%S)) — starting pipeline" | tee -a /tmp/tpu_wait.log
    break
  fi
  echo "still down ($(date +%H:%M:%S))" >>/tmp/tpu_wait.log
  sleep 120
done
bash scripts/tpu_validate.sh
echo "PIPELINE DONE ($(date +%H:%M:%S))" | tee -a /tmp/tpu_wait.log
