#!/bin/bash
# Sequential TPU validation pipeline for the gathered-binning change.
# One TPU job at a time (the chip is exclusive). Logs to $OUT (default
# /tmp/tpu_validate). Safe to re-run; each step overwrites its own log.
set -u
OUT=${OUT:-/tmp/tpu_validate}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 1800 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ==="
  echo "$name rc=$rc" >>"$OUT/summary.txt"
}

: >"$OUT/summary.txt"
step hard_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_rasterize_pallas.py -q
step soft_native env MESH_RENDERER_TEST_PLATFORM=native \
  python -m pytest tests/test_soft_pallas.py -q
step tune_hard python scripts/tune_chunks.py --chunks 8 16 32 64
step tune_stress python scripts/tune_chunks.py --stress --chunks 8 16 32 64
step tune_soft python scripts/tune_chunks.py --soft --chunks 8 16 32 64
step bench_headline python bench.py
step bench_stress python bench.py --stress
step bench_soft128 python bench.py --soft --size 128
step bench_sil128 python bench.py --soft --silhouette --size 128
step bench_soft256 python bench.py --soft --size 256
step bench_pose python bench.py --pose
step bench_soft_sweep python bench.py --soft-sweep
step multipass_hard python scripts/multipass_overhead.py
step multipass_soft python scripts/multipass_overhead.py --soft
echo "=== DONE ($(date +%H:%M:%S)) ==="
cat "$OUT/summary.txt"
