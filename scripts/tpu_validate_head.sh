#!/bin/bash
# Lean re-validation for HEAD after the chunk-path static specialization +
# split data/attr tables (4ae387d, b027304). The full round-4 pipeline
# (tpu_validate.sh) already ran 2026-08-19; this re-runs only what those
# commits touch: the compiled kernel suites (Mosaic gate) and the bench
# configs whose numbers BENCH.md's post-fix table is waiting on.
# Logs to $OUT (default /tmp/tpu_validate_head).
set -u
OUT=${OUT:-/tmp/tpu_validate_head}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

alive() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((256, 256), jnp.float32)
(x @ x).block_until_ready()
" >/dev/null 2>&1
}

step() {
  local name=$1; shift
  until alive; do
    echo "--- backend dead before $name; waiting ($(date +%H:%M:%S)) ---"
    sleep 120
  done
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-1800}" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ==="
  echo "$name rc=$rc" >>"$OUT/summary.txt"
}

: >"$OUT/summary.txt"
# 1. Compiled kernel suites — both modules share _bin_chunks/_prepare_tables,
# so both must pass the Mosaic gate after the split-table change.
STEP_TIMEOUT=5400 step hard_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_rasterize_pallas.py -q
STEP_TIMEOUT=5400 step soft_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_soft_pallas.py -q

# 2. Post-fix bench record at the shipped auto defaults (fills BENCH.md's
# dangling table; bench.py stamps git SHA + binning and refreshes
# BENCH_LAST_GOOD.json).
step bench_headline python bench.py
step bench_stress python bench.py --stress
step bench_soft128 python bench.py --soft --size 128
step bench_soft256 python bench.py --soft --size 256
step bench_sil128 python bench.py --soft --silhouette --size 128
step bench_pose python bench.py --pose
step multipass_hard python scripts/multipass_overhead.py
step multipass_soft python scripts/multipass_overhead.py --soft

echo "=== DONE ($(date +%H:%M:%S)) ==="
cat "$OUT/summary.txt"
