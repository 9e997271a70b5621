#!/bin/bash
# Flagship end-to-end workload on TPU (VERDICT r3 #6): the multi-view cow
# silhouette fit (reference example7b parity) with the vendored targets,
# the silhouette fast path, and the scanned train loop. Collects the loss/
# IoU trajectory, previews, final OBJ, and wall-clock per 1000 epochs into
# $OUT for committing to docs/flagship/.
set -u
OUT=${OUT:-/tmp/flagship_cow}
EPOCHS=${EPOCHS:-2000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

start=$(date +%s)
timeout 3600 python examples/fit_shape_multiview.py \
  --epochs "$EPOCHS" --size 128 --resolution 24 \
  --scan-chunk 100 --preview-every 100 \
  --out-prefix "$OUT/cow" 2>&1 | tee "$OUT/trajectory.log"
rc=$?
end=$(date +%s)
wall=$((end - start))
echo "rc=$rc wall_s=$wall epochs=$EPOCHS" | tee -a "$OUT/trajectory.log"
python - <<EOF | tee -a "$OUT/trajectory.log"
wall = $wall
epochs = $EPOCHS
print(f"wall-clock per 1000 epochs: {wall * 1000.0 / max(epochs, 1):.1f} s")
EOF
ls -la "$OUT"
