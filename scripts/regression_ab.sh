#!/bin/bash
# Wait for a healthy TPU tunnel, then run the fused-kernel A/B matrix via
# scripts/fused_fwd_microbench.py. Appends JSON lines to /tmp/regression_ab.log.
#
# Round-4 history: the 2026-08-19 run of this matrix (with the
# MESH_RENDERER_FUSED_SPLIT / MESH_RENDERER_ATTR_COL experiment knobs that
# existed then) attributed the residual hard stress regression to the
# combined data+attr kernel table — split refs measured 284.5 ms vs
# combined 344.5 ms fused-fwd (r3 anchor 284.9), while ATTR_COL=32 ruled
# out slice lane alignment and the headline config showed no difference.
# Split tables are now the production chunk path; this script keeps the
# remaining config points for re-validation.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/regression_ab.log
echo "== regression A/B $(date +%H:%M:%S) ==" | tee -a "$LOG"

probe() {
  # Healthy = a small matmul round-trips fast. The tunnel can also be
  # merely DEGRADED (the same probe taking minutes) — reject that too:
  # microbench numbers under a degraded tunnel are garbage.
  timeout 60 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((256, 256), jnp.float32)
(x @ x).block_until_ready()
" >/dev/null 2>&1
}

until probe; do
  echo "tunnel down/degraded ($(date +%H:%M:%S))" >>"$LOG"
  sleep 120
done
echo "TPU healthy ($(date +%H:%M:%S)) — running matrix" | tee -a "$LOG"

run() {
  local label="$1"; shift
  # Re-probe before every point: the tunnel degrades on minute timescales.
  until probe; do
    echo "degraded before $label ($(date +%H:%M:%S)); waiting" >>"$LOG"
    sleep 120
  done
  echo "--- $label ($(date +%H:%M:%S))" >>"$LOG"
  timeout 1200 env "$@" python scripts/fused_fwd_microbench.py \
    ${EXTRA:-} 2>>"$LOG" | tail -1 | sed "s/^/$label /" | tee -a "$LOG"
}

# Stress config (batch 64, 512^2, sphere72) — where the gap was largest.
EXTRA="--iters 20"
run stress-fwd         MESH_RENDERER_BINNING=chunk
EXTRA="--iters 20 --bwd"
run stress-bwd         MESH_RENDERER_BINNING=chunk
# Headline config (batch 4, 256^2, teapot).
EXTRA="--iters 50 --teapot --batch 4 --size 256"
run head-fwd           MESH_RENDERER_BINNING=chunk
EXTRA="--iters 50 --teapot --batch 4 --size 256 --bwd"
run head-bwd           MESH_RENDERER_BINNING=chunk
echo "MATRIX DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
