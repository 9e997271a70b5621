#!/bin/bash
# Poll until the TPU tunnel answers, then run the sequential validation
# pipeline (scripts/tpu_validate.sh). Logs to /tmp/tpu_wait.log; pipeline
# logs to /tmp/tpu_validate/. Run inside tmux so it survives the session.
set -u
cd "$(dirname "$0")/.."
echo "waiting for TPU tunnel ($(date +%H:%M:%S))" | tee /tmp/tpu_wait.log
# Device enumeration can succeed while execution hangs (seen r3 and r4:
# jax.devices() returns [TPU v5 lite0] but a 256x256 matmul never
# completes), so the readiness probe must EXECUTE something end-to-end.
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((256, 256), jnp.float32)
(x @ x).block_until_ready()
" >/dev/null 2>&1; then
    echo "TPU UP ($(date +%H:%M:%S)) — starting pipeline" | tee -a /tmp/tpu_wait.log
    break
  fi
  echo "still down ($(date +%H:%M:%S))" >>/tmp/tpu_wait.log
  sleep 120
done
bash scripts/tpu_validate.sh
echo "PIPELINE DONE ($(date +%H:%M:%S))" | tee -a /tmp/tpu_wait.log
