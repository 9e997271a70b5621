#!/bin/bash
# Sequential TPU validation pipeline for the round-4 FINAL defaults
# (binning='auto': hard->chunk, soft full->gathered single-pass, sil->chunk;
# SEG_H=16 full-tile blocks; gathered hard backward reuses the forward plan,
# BWD_PLAN=forward). One TPU job at a time (the chip is exclusive). Logs to
# $OUT (default /tmp/tpu_validate). Safe to re-run; each step overwrites its
# own log.
set -u
OUT=${OUT:-/tmp/tpu_validate}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# The tunnel can degrade mid-pipeline (device enumeration keeps working
# while execution hangs — seen r3/r4). Re-probe liveness with a real
# compile+execute round-trip before every step so a dead backend costs a
# probe timeout, not each step's full budget.
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
# The gathered parity tests force binning explicitly, so both modes compile
# regardless of the 'auto' default. One CPU core: first-run Mosaic compiles
# dominate; 90-min budget (reruns hit the persistent compile cache).
STEP_TIMEOUT=5400 step hard_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_rasterize_pallas.py -q
STEP_TIMEOUT=5400 step soft_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_soft_pallas.py -q

# 2. Every bench config under the shipping (auto) defaults — these are the
# round-4 record; bench.py stamps git SHA + resolved binning per line and
# updates BENCH_LAST_GOOD.json.
step bench_headline python bench.py
step bench_stress python bench.py --stress
step bench_soft128 python bench.py --soft --size 128
step bench_sil128 python bench.py --soft --silhouette --size 128
step bench_soft256 python bench.py --soft --size 256
step bench_pose python bench.py --pose
step bench_soft_sweep python bench.py --soft-sweep

# 3. Large-mesh multi-pass under the auto default (hard+soft route to chunk
# at 49,152 tris/pass -> 3 passes for 100k; VERDICT r3 #3 targets:
# hard <= 34 ms, soft <= 78 ms).
step multipass_hard python scripts/multipass_overhead.py
step multipass_soft python scripts/multipass_overhead.py --soft

# 4a. Chunk-path regression hunt: HEAD-at-chunk measured 693 headline vs
# the r3 tree's 767 the same day — the breakdown attributes the gap
# (suspects: two-section table prepass, per-strip count plumbing, bwd
# re-binning).
step profile_headline python scripts/profile_breakdown.py
step profile_stress python scripts/profile_breakdown.py --batch 64 \
  --size 512 --sphere-resolution 72

# 4b. A/B: does the zero-prepass forward-plan backward rescue gathered on
# the hard path? (r4 measured the 'winner' backward losing; this
# quantifies the shipped BWD_PLAN=forward improvement for BENCH.md.)
step bench_headline_gathered env MESH_RENDERER_BINNING=gathered \
  python bench.py
step bench_stress_gathered env MESH_RENDERER_BINNING=gathered \
  python bench.py --stress
# Soft full render ships gathered via auto; chunk comparison line:
step bench_soft128_chunk env MESH_RENDERER_BINNING=chunk \
  python bench.py --soft --size 128
step bench_soft256_chunk env MESH_RENDERER_BINNING=chunk \
  python bench.py --soft --size 256

# 5. Flagship end-to-end workload (VERDICT r3 #6): multi-view cow fit.
STEP_TIMEOUT=3900 step flagship_cow bash scripts/flagship_cow_fit.sh

echo "=== DONE ($(date +%H:%M:%S)) ==="
cat "$OUT/summary.txt"
