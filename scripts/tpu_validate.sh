#!/bin/bash
# Sequential TPU validation pipeline for the gathered-binning + SEG_H-strip
# kernels. One TPU job at a time (the chip is exclusive). Logs to $OUT
# (default /tmp/tpu_validate). Safe to re-run; each step overwrites its own
# log.
set -u
OUT=${OUT:-/tmp/tpu_validate}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# The tunnel can degrade mid-pipeline (device enumeration keeps working
# while execution hangs — seen r3/r4). Re-probe liveness with a real
# compile+execute round-trip before every step so a dead backend costs a
# probe timeout, not each step's full 30-min budget.
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
# 1. Compiled kernel suites — the Mosaic gate interpret mode cannot check.
# This box has one CPU core, so first-run Mosaic compiles dominate; the
# suites get a 90-min budget (later steps reuse the persistent compile
# cache conftest/bench enable).
STEP_TIMEOUT=5400 step hard_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_rasterize_pallas.py -q
STEP_TIMEOUT=5400 step soft_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_soft_pallas.py -q

# 2. Benches under the shipping default (SEG_H=8 strips, gathered binning).
step bench_headline python bench.py
step bench_stress python bench.py --stress
step bench_soft128 python bench.py --soft --size 128
step bench_sil128 python bench.py --soft --silhouette --size 128
step bench_soft256 python bench.py --soft --size 256

# 3. SEG_H A/B: the same benches on the full-tile (16-row) decomposition.
step bench_headline_seg16 env MESH_RENDERER_HARD_SEG_H=16 python bench.py
step bench_stress_seg16 env MESH_RENDERER_HARD_SEG_H=16 \
  python bench.py --stress
step bench_soft128_seg16 env MESH_RENDERER_SOFT_SEG_H=16 \
  python bench.py --soft --size 128
step bench_sil128_seg16 env MESH_RENDERER_SOFT_SEG_H=16 \
  python bench.py --soft --silhouette --size 128

# 4. Chunk sweeps (gathered mode re-tune; strips change the tradeoff).
step tune_hard python scripts/tune_chunks.py --chunks 8 16 32 64
step tune_stress python scripts/tune_chunks.py --stress --chunks 8 16 32 64
step tune_soft python scripts/tune_chunks.py --soft --chunks 8 16 32 64

# 5. Large-mesh multi-pass under the gathered cap, incl. a cap sweep
#    (VERDICT r3 #3: 100k tris = 9 passes at 12288; measure vs 24576/49152).
step multipass_hard python scripts/multipass_overhead.py
step multipass_soft python scripts/multipass_overhead.py --soft
step multipass_hard_cap24k env MESH_RENDERER_MAX_GATHERED=24576 \
  python scripts/multipass_overhead.py
step multipass_soft_cap24k env MESH_RENDERER_MAX_GATHERED=24576 \
  python scripts/multipass_overhead.py --soft

# 6. Remaining bench configs.
step bench_pose python bench.py --pose
step bench_soft_sweep python bench.py --soft-sweep
echo "=== DONE ($(date +%H:%M:%S)) ==="
cat "$OUT/summary.txt"
