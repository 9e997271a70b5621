#!/bin/bash
# Hardware bisect of the hard-chunk-path regression (BENCH.md round 4:
# headline 767.4 -> 687.7 r/s, stress 246.0 -> 195.9 between the
# r3-measured tree and HEAD, measured the same day at identical chunk
# binning). Each candidate commit runs ITS OWN bench.py in a detached
# worktree with binning forced to chunk (sed on trees that predate the
# MESH_RENDERER_BINNING env knob), so a step change between two adjacent
# points attributes the regression to that commit. Afterwards the §4a
# profile_breakdown decomposes HEAD's step. Logs to /tmp/regression_bisect.
#
# Candidate commits (all touch ops/rasterize_pallas.py):
#   72372c5  r3-measured tree (chunk default)        — baseline, 767.4 known
#   860254d  gathered binning lands; chunk path gains the two-section table
#   b19a71d  winner-segment backward
#   8722208  review findings on the gathered change
#   42f7431  r4 snapshot: SEG_H strip decomposition + misc
#   HEAD     today's auto-defaults tree              — 687.7/693.1 known
set -u
OUT=${OUT:-/tmp/regression_bisect}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# Tunnel can degrade mid-run (enumeration works, execution hangs): probe
# with a real compile+execute round-trip before every point.
alive() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((256, 256), jnp.float32)
(x @ x).block_until_ready()
" >/dev/null 2>&1
}

: >"$OUT/summary.txt"

point() {
  name=$1; commit=$2; bench_args=$3; shift 3
  if ! alive; then
    echo "$name SKIPPED (tpu down $(date +%H:%M:%S))" >>"$OUT/summary.txt"
    return
  fi
  wt=/tmp/bisect_wt
  git worktree remove --force "$wt" >/dev/null 2>&1
  rm -rf "$wt"
  git worktree add --detach "$wt" "$commit" >/dev/null 2>&1 || {
    echo "$name worktree FAIL" >>"$OUT/summary.txt"; return; }
  # Trees that predate the env knob: force chunk via the config default.
  if grep -q 'binning: str = "gathered"' \
      "$wt/pytorch_mesh_renderer_tpu/config.py"; then
    sed -i 's/binning: str = "gathered"/binning: str = "chunk"/' \
      "$wt/pytorch_mesh_renderer_tpu/config.py"
  fi
  echo "=== $name ($commit) start $(date +%H:%M:%S)" >>"$OUT/summary.txt"
  (cd "$wt" && timeout 1800 env "$@" python bench.py $bench_args) \
    >"$OUT/$name.log" 2>&1
  rc=$?
  grep -E '^\{' "$OUT/$name.log" | tail -1 >>"$OUT/summary.txt"
  echo "$name rc=$rc end $(date +%H:%M:%S)" >>"$OUT/summary.txt"
  git worktree remove --force "$wt" >/dev/null 2>&1
}

# Headline sweep, oldest -> newest. MESH_RENDERER_BINNING/SEG_H knobs only
# exist on the trees where they're passed.
point r3_headline        72372c5 ""
point gathered0_headline 860254d ""
point winnerbwd_headline b19a71d ""
point review_headline    8722208 ""
point r4snap_headline    42f7431 "" MESH_RENDERER_HARD_SEG_H=16
point head_headline      HEAD    "" MESH_RENDERER_BINNING=chunk

# Stress confirmation at the endpoints + the first suspect.
point r3_stress        72372c5 "--stress"
point gathered0_stress 860254d "--stress"
point r4snap_stress    42f7431 "--stress" MESH_RENDERER_HARD_SEG_H=16
point head_stress      HEAD    "--stress" MESH_RENDERER_BINNING=chunk

# §4a profile decomposition on HEAD (phase attribution).
if alive; then
  timeout 1800 python scripts/profile_breakdown.py \
    >"$OUT/profile_headline.log" 2>&1
  echo "profile_headline rc=$?" >>"$OUT/summary.txt"
fi
if alive; then
  timeout 2400 python scripts/profile_breakdown.py --batch 64 --size 512 \
    --sphere-resolution 72 >"$OUT/profile_stress.log" 2>&1
  echo "profile_stress rc=$?" >>"$OUT/summary.txt"
fi
echo "BISECT DONE $(date +%H:%M:%S)" >>"$OUT/summary.txt"
