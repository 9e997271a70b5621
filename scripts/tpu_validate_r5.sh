#!/bin/bash
# Round-5 sequential TPU validation pipeline. One TPU job at a time.
# Order: (1) compiled kernel suites, (2) model-level gates compiled on TPU
# (VERDICT r4 #2 — golden renders, full-render Jacobians, convergence on
# the production backend), (3) patch-scatter prototype A/B (VERDICT #1),
# (4) soft/hard multipass breakdown (VERDICT #7), (5) single-session
# re-baseline of every bench config at ONE sha (VERDICT #4, + batch-1
# latency row, VERDICT #8). Logs to $OUT (default /tmp/tpu_validate_r5).
set -u
OUT=${OUT:-/tmp/tpu_validate_r5}
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

# 1. Compiled kernel suites (Mosaic gate; reruns hit the compile cache).
STEP_TIMEOUT=5400 step hard_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_rasterize_pallas.py -q
STEP_TIMEOUT=5400 step soft_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_soft_pallas.py -q

# 2. Model-level gates compiled on TPU (VERDICT r4 #2): golden renders,
# full-render Jacobians, convergence tests, reference-oracle parity — on
# the backend that ships. (The reference runs its full suite on its
# production backend, mesh_renderer_test.py:30-271.)
STEP_TIMEOUT=5400 step model_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_mesh_renderer.py tests/test_rasterize_hard.py \
  tests/test_soft_rasterize.py -q

# 3. Patch-scatter decomposition prototype (VERDICT r4 #1) — measured
# interactively on 2026-08-20 (results + kill verdict in BENCH.md);
# re-run here only if the tree's kernels changed since:
#   python scripts/patch_scatter_microbench.py --config headline \
#     --budget-factor 2
#   python scripts/patch_scatter_microbench.py --config stress --iters 10

# 4. Multipass breakdown at 100k tris (VERDICT r4 #7).
step multipass_hard python scripts/multipass_overhead.py
step multipass_soft python scripts/multipass_overhead.py --soft

# 5. Single-session re-baseline: every bench config at this one sha
# (VERDICT r4 #4). bench.py merges each line into BENCH_LAST_GOOD.json.
step bench_headline python bench.py
step bench_latency1 python bench.py --batch 1
step bench_stress python bench.py --stress
step bench_soft128 python bench.py --soft --size 128
step bench_sil128 python bench.py --soft --silhouette --size 128
step bench_soft256 python bench.py --soft --size 256
step bench_pose python bench.py --pose
step bench_soft_sweep python bench.py --soft-sweep

echo "=== DONE ($(date +%H:%M:%S)) ==="
cat "$OUT/summary.txt"
