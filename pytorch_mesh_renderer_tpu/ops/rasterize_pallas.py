"""Hard barycentric rasterizer — tiled Pallas TPU kernels.

TPU-native replacement for the reference's native C++ kernel
(/root/reference/src/mesh_renderer/kernels/rasterize_triangles.cpp:302-419).
The C++ kernel loops triangles and scans each one's screen bbox, mutating a
z-buffer sequentially — a formulation that cannot parallelize. Here the
image is split into VPU-aligned tiles (grid), and each tile keeps its
z-buffer / winner-id / barycentric accumulators **in VMEM** while streaming
per-triangle coefficient rows through a chunked loop:

  * edge functions use the same Olano-Greer sign-corrected adjugate as the
    reference (cpp:39-87, built host-side in ops/barycentric.py), so
    rasterization stays crack-free;
  * the sequential z-buffer becomes a per-chunk min-reduction merged into
    the VMEM carry (min z wins, depth ties break to the larger triangle id
    — equivalent to the C++ kernel's strict `z > z_buffer` skip under
    later-triangle overwrite, cpp:395-409);
  * the C++ bbox pixel scan (cpp:355-371) becomes **per-tile binning**
    (SURVEY.md §5, the quadtree replacement): an XLA prepass (_bin_chunks)
    intersects chunk-level NDC bboxes with every tile and emits fixed-shape
    per-tile candidate lists + counts; each tile's kernel loop then visits
    only its own candidates (dynamic fori_loop bound, SMEM-resident list).
    The backward kernels additionally refine candidates by the tile's
    winner-id range.

Two kernel pairs share the chunk math (`_rasterize_chunk_core`,
`_bwd_chunk_core`):

  * the *barycentric* kernels (`rasterize_barycentric_pallas*`) reproduce
    the reference kernel contract exactly — (ids, barycentrics, z) with an
    analytic backward to clip vertices (cpp:131-273 semantics: bc-sum
    cutoff 0.9, no gradient to vertex z);
  * the *fused* kernels (`rasterize_interpolate_pallas_batched`)
    additionally interpolate per-vertex attributes inside the tile loop.
    The unfused pipeline (kernel -> XLA gather of corner attributes ->
    barycentric sum; backward = pixel-count-sized scatter into [B, V, A])
    costs more than rasterization itself on TPU because per-pixel
    gathers/scatters do not vectorize. Fused, corner attributes are
    gathered ONCE per triangle at pack time ([B, T, 3*A], a T-sized
    gather), streamed through VMEM next to the triangle table, and
    combined with the per-chunk winner mask as [C, A] x [C, P] MXU matmuls
    (P = pixels per tile). The backward similarly reduces per-pixel
    attribute cotangents to a per-triangle [T, 3*A] table, leaving only a
    T-sized scatter on the host side.

Backward gradient tables are **coordinate-major** ([T_pad, 9] column
cc * 3 + k for coordinate cc of corner k), so each coordinate's three
corner sums come out of one [C, P] x [P, 3] MXU matmul against the
stacked barycentric images.

The kernels run compiled on TPU and in interpreter mode elsewhere (so the
same semantics are testable on the CPU CI mesh).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DOT_PRECISIONS, resolve_dot_precision
from .barycentric import (DEGENERATE_BARYCENTRIC_CUTOFF,
                          unnormalized_matrix_inverse)
# Binning plans/table assembly live in ops/binning.py (shared with the
# soft kernels and unit-tested directly); re-imported here because the
# hard kernels consume every plan family and external measurement scripts
# address them through this module.
from . import binning as binning_lib
from .binning import (ATTR_COL, GATHER_TILE_CAP, _bbox_live_cols,
                      _bin_chunks, _bin_hits, _bin_specs, _build_tables,
                      _gather_budget_rows, _gather_plan,
                      _gathered_id_ranges, _legacy_plan,
                      _segment_sum_gathered, _winner_plan)
from .binning import ID_COL as _BINNING_ID_COL

_resolve_precision = resolve_dot_precision

# Tile dimensions (f32 min tile is 8x128). (16, 128) measured fastest for
# the fused kernels at 256^2 (297 vs 247 renders/s at (16, 256)) AND at the
# 512^2 10k-tri stress (58 vs 49): small tiles tighten the chunk bbox cull,
# which outweighs per-tile loop overhead.
TILE_H = 16
TILE_W = 128
# Gathered-segment strip height: triangles bin to SEG_H-row strips of each
# tile and the kernels process [chunk, SEG_H, TILE_W] lane blocks per
# visit. The CPU lane-occupancy model said SEG_H=8 should win (~19% more
# chunk visits for ~40% less raw lane-work), but measured on v5e it LOSES
# everywhere (BENCH.md round 4: hard headline 389 vs 490 renders/s under
# gathered) — the doubled loop trips and halved block area cost more than
# the dead lanes they cull. Default is therefore 16 = full-tile blocks;
# MESH_RENDERER_HARD_SEG_H=8 (the f32 sublane quantum) recovers the fine
# decomposition for A/B sweeps.
SEG_H = int(os.environ.get("MESH_RENDERER_HARD_SEG_H", "16"))
if TILE_H % SEG_H:
    raise ValueError(f"SEG_H={SEG_H} must divide TILE_H={TILE_H}")
N_SEG = TILE_H // SEG_H
# Hard-backward plan source. 'forward' (default) reuses the forward
# pass's plan + two-section table verbatim (zero backward prepass) — in
# gathered mode rows whose triangle won no pixel in the tile are zeroed by
# the in-kernel winner mask exactly as legacy rows always were; in chunk
# mode the forward and backward tables are bit-identical by construction,
# so the reuse just deletes the backward's _bin_chunks re-run + table
# copy. 'winner' rebuilds winner-only segments from the forward id image
# each step — ~3x fewer backward chunk visits, but the per-step per-tile
# pixel sort + scatter + table re-gather costs far more than the culled
# visits save (measured r4: headline bwd prepass ~1.4 ms vs a ~1.2 ms bwd
# kernel; at the 512^2 batch-64 stress the sort covers 33M pixels/step).
# Env knob kept for A/B.
BWD_PLAN = os.environ.get("MESH_RENDERER_HARD_BWD_PLAN", "forward")
if BWD_PLAN not in ("forward", "winner"):
    raise ValueError(
        f"MESH_RENDERER_HARD_BWD_PLAN={BWD_PLAN!r} "
        "(want 'forward' or 'winner')")
# Triangles processed per inner step ([chunk, SEG_H, TILE_W] temporaries).
# Chunk size is also the BINNING granularity (per-tile candidate lists are
# chunk-aligned), so smaller chunks cull tighter. Measured on v5e with
# binning: fused chunk 16 beats 64 at BOTH the 256^2 teapot headline
# (572 vs 413 renders/s) and the 512^2 10k-tri stress (216 vs 76; chunk 8
# trades +11% stress for -3% headline).
TRI_CHUNK = 16
BWD_TRI_CHUNK = 16
FUSED_TRI_CHUNK = 16
# Large meshes cull tighter with smaller (chunk = binning-granularity)
# candidate lists: at the 512^2 10k-tri stress, chunk 8 measured 240 vs
# 216 renders/s, while the 256^2 teapot headline prefers 16 (567 vs 556).
FUSED_TRI_CHUNK_LARGE = 8
FUSED_LARGE_T_THRESHOLD = 4096


def _fused_chunk_for(n_triangles):
    return (FUSED_TRI_CHUNK_LARGE if n_triangles >= FUSED_LARGE_T_THRESHOLD
            else FUSED_TRI_CHUNK)

# Packed triangle-data columns (see _pack_triangle_data).
_COLS = 21
# GATHERED kernel-table layout: packed data in 0.._COLS-1, original
# triangle id at _ID_COL (f32, exact for ids < 2^24; -1 on dead rows),
# and — fused path only — corner attributes from _ATTR_COL (8-aligned
# lane offset). Chunk mode feeds the kernels the packed data and the
# corner attributes as TWO refs instead (attrs at lane 0 of their own
# table): the combined table measured ~15% slower per stress fwd kernel
# pass on v5e and its concat costs HBM roundtrips (BENCH.md round 4;
# slice lane ALIGNMENT was ruled out by the MESH_RENDERER_ATTR_COL=32
# A/B). Backward output tables: vertex-gradient columns 0..8, attribute
# gradients from _OUT_ATTR_COL.
_ID_COL = _BINNING_ID_COL  # binning.ID_COL — _build_tables owns the layout
_ATTR_COL = ATTR_COL
assert _ID_COL == _COLS, "gathered-table id column must follow packed data"
_OUT_ATTR_COL = 16


def _prepare_bwd_tables(base, ids, bc, chunk, image_width, image_height,
                        row_offset, full_height, binning, live_col=15):
    """Backward-pass tables: winner segments + legacy fallback.

    base is the pre-section table ([B, T_pad, W] with full liveness, iota
    ids, and — fused — attributes). Winner rows gather base BY ORIGINAL ID
    (winners may include forward-legacy triangles, so the backward needs no
    forward plan at all); tiles whose winner segment exceeded the budget
    instead run the legacy chunk-binned loop over the full-liveness
    original section (their a_count is 0 and their candidate count is the
    bbox list's). binning='chunk' routes every tile to the legacy loop —
    the pre-winner behavior.
    """
    batch, t_pad, width = base.shape
    n_rows = pl.cdiv(image_height, TILE_H)
    n_cols = pl.cdiv(image_width, TILE_W)
    n_strips = n_rows * N_SEG
    if binning == "gathered":
        budget = binning_lib._gather_budget_rows(
            t_pad, n_strips * n_cols, chunk)
        # Winner segments at SEG_H-strip granularity. Pad the id/bc images
        # to whole tiles first so the plan has exactly N_SEG strip rows per
        # kernel tile row (padded pixels are inactive: id 0, bc 0).
        pad_h = n_rows * TILE_H - ids.shape[1]
        if pad_h:
            ids = jnp.pad(ids, [(0, 0), (0, pad_h), (0, 0)])
            bc = jnp.pad(bc, [(0, 0), (0, pad_h), (0, 0), (0, 0)])
        gather_idx, start_chunk, n_chunks, tile_fits = _winner_plan(
            ids, bc, chunk, budget, tile_h=SEG_H)
        sentinel = jnp.zeros((batch, 1, width), jnp.float32)
        sentinel = sentinel.at[:, 0, _ID_COL].set(-1.0)
        ext = jnp.concatenate([base, sentinel], axis=1)
        src = jnp.where(gather_idx >= 0, gather_idx, t_pad)
        winner_rows = jnp.take_along_axis(ext, src[..., None], axis=1)
        table = jnp.concatenate([winner_rows, base], axis=1)
        s_rows = gather_idx.shape[1]
    else:
        # Chunk mode: no winner section at all (s_rows = 0) — the kernels
        # statically elide the A loop and run the legacy chunk-binned loop
        # over the untouched base, exactly the pre-winner program.
        src = jnp.zeros((batch, 0), jnp.int32)
        zeros = jnp.zeros((batch, n_strips, n_cols, 1), jnp.int32)
        start_chunk, n_chunks = zeros, zeros
        tile_fits = jnp.zeros((batch, n_strips, n_cols, 1), bool)
        table = base
        s_rows = 0

    candidates, counts = _bin_chunks(base, chunk, image_width,
                                     image_height, row_offset, full_height,
                                     live_col=live_col)
    # Legacy fallback activates PER STRIP: a strip whose winner segment
    # exceeded the budget walks the tile's bbox candidate list at strip
    # height; strips whose segment fit skip it. The candidate list itself
    # stays per tile (shared by the tile's N_SEG strips).
    counts = jnp.where(tile_fits,
                       0, jnp.repeat(counts, N_SEG, axis=1))
    plan = (src, None, start_chunk, n_chunks)
    return table, s_rows, plan, candidates, counts


def _pack_triangle_data(clip_vertices, triangles, chunk):
    """Precomputes per-triangle rasterization data as one [T_pad, 21] array.

    Columns: 0-8 sign-corrected adjugate rows (edge coefficients a,b,c per
    edge), 9-11 vertex clip z, 12-14 vertex clip w, 15 liveness (0 when all
    w < 0, cull, cpp:338-341; or padding), 16-19 conservative NDC bbox
    (min_x, max_x, min_y, max_y) used for chunk culling, 20 1/|det| for the
    backward pass (cpp:151-154).
    """
    tris = jnp.asarray(triangles, jnp.int32)
    tv = clip_vertices[tris]  # [T, 3, 4]
    x, y = tv[..., 0], tv[..., 1]
    vz, vw = tv[..., 2], tv[..., 3]
    m_inv, det = unnormalized_matrix_inverse(x, y, vw)  # [T, 3, 3]
    abs_det = jnp.abs(det)
    inv_abs_det = jnp.where(abs_det > 0.0, 1.0 / jnp.maximum(abs_det, 1e-30),
                            0.0)
    bbox5 = _bbox_live_cols(x, y, vw)

    data = jnp.concatenate([
        m_inv.reshape(-1, 9), vz, vw, bbox5, inv_abs_det[:, None],
    ], axis=-1)  # [T, 21]

    t = data.shape[0]
    # Zero-triangle meshes still pad to one full (all-dead) chunk so the
    # kernels always see a non-empty table; every padded row has live=0.
    pad = chunk if t == 0 else (-t) % chunk
    if pad:
        data = jnp.pad(data, [(0, pad), (0, 0)])
    return data


def _strip_pixel_coords(ti, h, tj, row_off, image_width, full_height):
    """NDC pixel-center coordinates of strip h (of N_SEG) in tile (ti, tj):
    [SEG_H, TILE_W] arrays over rows ti*TILE_H + h*SEG_H + [0, SEG_H)
    (row 0 = NDC bottom, cpp:376-377). row_off shifts rows when the image
    is row-sharded."""
    rows = (jax.lax.broadcasted_iota(
        jnp.int32, (SEG_H, TILE_W), 0).astype(jnp.float32)
        + ti * TILE_H + h * SEG_H + row_off)
    cols = (jax.lax.broadcasted_iota(
        jnp.int32, (SEG_H, TILE_W), 1).astype(jnp.float32)
        + tj * TILE_W)
    py = (rows + 0.5) * (2.0 / full_height) - 1.0
    px = (cols + 0.5) * (2.0 / image_width) - 1.0
    return px, py


def _rasterize_chunk_core(data, px, py, chunk, tri_ids=None):
    """Shared per-chunk rasterization math (cpp:330-410 semantics).

    Args:
      data: [chunk, >= 21] packed triangle rows (cols 0.._COLS-1; gathered
        tables carry the original id at _ID_COL; wider fused blocks pass
        through).
      px, py: [TILE_H, TILE_W] pixel-center NDC coordinates.
      tri_ids: [chunk, 1, 1] i32 triangle ids, or None to read them from
        the table's _ID_COL (gathered tables, where row order is not id
        order). Chunk-mode callers pass positional ids (row_start + iota)
        — no table column, no per-visit load/convert.

    Returns:
      (chunk_z [TH, TW], chunk_id [TH, TW] i32 — -1 where no triangle in
       this chunk covers the pixel, we0/we1/we2 [chunk, TH, TW] — RAW edge
       values masked to the per-pixel winning row, zero elsewhere).
      Callers L1-normalize the winning edge triple AFTER the chunk loop
      (b_i = we_i / sum(we)) — the winner's e-sum equals the in-loop sum
      bit-for-bit, so deferring the normalization out of the hot loop
      changes no output bits while dropping ~7 of ~50 vector ops per
      (chunk, tile) visit (the kernels are vector-issue bound; measured
      +9% end-to-end on the 256^2 headline, v5e).
    """

    def col(k):  # [chunk, 1, 1] broadcastable column
        return data[:, k].reshape(chunk, 1, 1)

    e0 = col(0) * px + col(1) * py + col(2)  # [chunk, TH, TW]
    e1 = col(3) * px + col(4) * py + col(5)
    e2 = col(6) * px + col(7) * py + col(8)
    # min/max formulation of the reference's inside test (boolean-equal to
    # all-nonneg AND any-pos, two ops fewer).
    min_e = jnp.minimum(jnp.minimum(e0, e1), e2)
    max_e = jnp.maximum(jnp.maximum(e0, e1), e2)
    inside = (min_e >= 0.0) & (max_e > 0.0)
    # z from the RAW edge functions: (sum e_i vz_i) / (sum e_i vw_i) — the
    # normalization cancels, saving the in-loop reciprocal. The XLA spec
    # (rasterize_xla._forward) uses the identical formulation/op order so
    # cross-backend z stays bit-comparable.
    num = e0 * col(9) + e1 * col(10) + e2 * col(11)
    den = e0 * col(12) + e1 * col(13) + e2 * col(14)
    z = num / jnp.where(den != 0.0, den, 1.0)
    valid = (inside & (col(15) > 0.0) & (z >= -1.0) & (z <= 1.0))

    # Winner selection is (min z, max id), so visit ORDER never matters —
    # the gathered and legacy loops compose exactly, and ties reproduce the
    # reference's later-triangle-overwrite rule on original ids (dead
    # gathered rows carry id -1).
    if tri_ids is None:
        tri_ids = data[:, _ID_COL].astype(jnp.int32).reshape(chunk, 1, 1)
    z_masked = jnp.where(valid, z, 2.0)
    chunk_z = jnp.min(z_masked, axis=0)  # [TH, TW]
    at_min = valid & (z_masked == chunk_z[None])
    chunk_id = jnp.max(jnp.where(at_min, tri_ids, -1), axis=0)  # [TH, TW]
    winner = at_min & (tri_ids == chunk_id[None])
    wf = winner.astype(jnp.float32)
    return chunk_z, chunk_id, wf * e0, wf * e1, wf * e2


def _normalize_winner_edges(we0, we1, we2):
    """Post-loop barycentrics from the carried winner edge values.

    sum(we) is the winner's e0+e1+e2 in the original addition order, so
    b_i = we_i * (1 / sum) reproduces the in-loop normalization bit-for-bit
    (background pixels: all-zero we -> sum 0 -> b 0, same contract).
    """
    sum_e = we0 + we1 + we2
    inv_sum = 1.0 / jnp.where(sum_e != 0.0, sum_e, 1.0)
    return we0 * inv_sum, we1 * inv_sum, we2 * inv_sum, inv_sum


def _merge_better(chunk_z, chunk_id, best_z, best_id):
    """Carry-merge predicate: smaller z wins, ties to the later triangle."""
    return ((chunk_z < best_z) |
            ((chunk_z == best_z) & (chunk_id > best_id)))


# ---------------------------------------------------------------------------
# Barycentric-only kernels (reference kernel contract: ids, bc, z)
# ---------------------------------------------------------------------------


def _kernel(row_off_ref, *refs, image_width, image_height, full_height,
            s_rows, gathered):
    # Grid: (batch, tile_row, tile_col). Batch is a kernel-level grid axis —
    # the whole mesh batch renders in ONE pallas_call (no vmap).
    # `gathered` is STATIC: chunk mode (gathered=False) takes no segment
    # refs, emits no A loop, and uses positional triangle ids — the
    # compiled program matches the pre-gathered chunk kernel exactly.
    if gathered:
        (a_start_ref, a_count_ref, b_count_ref, b_cand_ref, tri_ref,
         id_ref, b0_ref, b1_ref, b2_ref, z_ref) = refs
    else:
        (b_count_ref, b_cand_ref, tri_ref,
         id_ref, b0_ref, b1_ref, b2_ref, z_ref) = refs
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    def run_strip(h):
        px, py = _strip_pixel_coords(ti, h, tj, row_off_ref[0], image_width,
                                     full_height)

        def visit(row_start, carry):
            data = tri_ref[0, pl.ds(row_start, TRI_CHUNK), :]  # [C, >=21]
            tri_ids = None if gathered else (
                row_start + jax.lax.broadcasted_iota(
                    jnp.int32, (TRI_CHUNK, 1, 1), 0))
            best_z, best_id, best_we0, best_we1, best_we2 = carry
            chunk_z, chunk_id, w0, w1, w2 = _rasterize_chunk_core(
                data, px, py, TRI_CHUNK, tri_ids)
            better = _merge_better(chunk_z, chunk_id, best_z, best_id)
            best_z = jnp.where(better, chunk_z, best_z)
            best_id = jnp.where(better, chunk_id, best_id)
            best_we0 = jnp.where(better, jnp.sum(w0, axis=0), best_we0)
            best_we1 = jnp.where(better, jnp.sum(w1, axis=0), best_we1)
            best_we2 = jnp.where(better, jnp.sum(w2, axis=0), best_we2)
            return best_z, best_id, best_we0, best_we1, best_we2

        # Loop B: legacy chunk-binned candidates over the fallback section.
        def b_body(i, carry):
            c = b_cand_ref[0, 0, tj, i]
            return visit(s_rows + c * TRI_CHUNK, carry)

        zeros = jnp.zeros((SEG_H, TILE_W), jnp.float32)
        init = (jnp.ones((SEG_H, TILE_W), jnp.float32),
                jnp.full((SEG_H, TILE_W), -1, jnp.int32),
                zeros, zeros, zeros)
        if gathered:
            # Loop A: this strip's own gathered segment (contiguous chunks).
            a_start = a_start_ref[0, h, tj, 0]
            init = jax.lax.fori_loop(
                0, a_count_ref[0, h, tj, 0],
                lambda i, carry: visit((a_start + i) * TRI_CHUNK, carry),
                init)
        return jax.lax.fori_loop(0, b_count_ref[0, 0, tj, 0], b_body, init)

    strips = [run_strip(h) for h in range(N_SEG)]
    best_z, best_id, best_we0, best_we1, best_we2 = (
        s[0] if N_SEG == 1 else jnp.concatenate(s, axis=0)
        for s in zip(*strips))

    b0, b1, b2, _ = _normalize_winner_edges(best_we0, best_we1, best_we2)
    id_ref[0] = jnp.maximum(best_id, 0)
    b0_ref[0] = b0
    b1_ref[0] = b1
    b2_ref[0] = b2
    z_ref[0] = best_z


def _pack_batched(clip_vertices, triangles, chunk):
    return jax.vmap(
        lambda cv: _pack_triangle_data(cv, triangles, chunk))(clip_vertices)


# Narrow tables ([T, 21] input, [T, 9] gradient blocks) lane-pad to 128 in
# VMEM; at 10k+ triangles that exceeds the conservative default scoped
# limit, but v5e has far more physical VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# Per-pass cap on the triangle count for the compiled kernels. All
# per-triangle tables are VMEM-resident per batch element: lane-padded to
# 128, the fused backward's worst case holds ~4 tables x 512 B/tri, and the
# 100 MB budget above runs out near 48k. Meshes beyond the cap render in
# MULTIPLE PASSES of <= MAX_PALLAS_TRIANGLES triangles whose z-buffers are
# merged on the XLA side (depth min, ties to the later/global-larger
# triangle id — the same rule the kernel applies between chunks), so the
# triangle dimension scales to HBM capacity instead of VMEM.
MAX_PALLAS_TRIANGLES = 49152
# Gathered binning roughly triples the VMEM-resident row count (the
# duplicated per-tile section budgets 2x T_pad on top of the legacy
# section), so its per-pass cap is lower; the multi-pass merge covers the
# rest (measured FASTER than independent passes for the hard kernels).
# Env-tunable so the large-mesh pass-count/VMEM tradeoff can be swept on
# hardware (scripts/multipass_overhead.py; the 100 MB vmem_limit_bytes
# above is self-described conservative).
MAX_GATHERED_TRIANGLES = int(
    os.environ.get("MESH_RENDERER_MAX_GATHERED", "12288"))


def _max_pass_triangles(binning):
    return (MAX_GATHERED_TRIANGLES if binning == "gathered"
            else MAX_PALLAS_TRIANGLES)


def _resolve_binning(binning):
    """Resolve the 'auto' binning mode for the HARD kernels: chunk.

    Measured on v5e (BENCH.md round 4 A/B, identical tree): gathered
    binning loses at every hard config — headline 256^2 −44%, 512^2
    batch-64 stress −69%, 100k-tri multipass 2.0x slower — because its
    per-step XLA scatter-plan prepass and the gathered table's duplicated
    rows cost more than the ~2x culled kernel visits save, and its lower
    per-pass cap (12,288 vs 49,152 tris) triples large-mesh pass counts.
    'gathered'/'chunk' force a concrete mode (bit-identical outputs).
    """
    if binning == "auto":
        return "chunk"
    return binning


def _triangle_slices(n_triangles, max_triangles=MAX_PALLAS_TRIANGLES):
    """[(start, size)] pass slices of at most max_triangles."""
    out = []
    start = 0
    while start < n_triangles:
        out.append((start, min(max_triangles, n_triangles - start)))
        start += max_triangles
    return out


def _merge_pass(best, ids, bc, z, offset, extra=None, best_extra=None):
    """Depth-merge one pass into the running best (later passes win ties).

    `best` is (gids, bc, z, covered); global ids are local + offset, and
    coverage is detected by the barycentric sum (uncovered pixels have
    bc == 0 under the kernels' background contract).
    """
    b_ids, b_bc, b_z, b_cov = best
    cov = jnp.sum(bc, axis=-1) > 0.5
    gid = ids + offset
    better = cov & ((~b_cov) | (z < b_z) | ((z == b_z) & (gid > b_ids)))
    m = better[..., None]
    merged = (jnp.where(better, gid, b_ids), jnp.where(m, bc, b_bc),
              jnp.where(better, z, b_z), b_cov | cov)
    if extra is None:
        return merged
    return merged, jnp.where(m, extra, best_extra)


def _seg_specs(n_cols):
    """SMEM block spec for per-strip segment lists.

    Arrays are [B, N_SEG * R, C, 1] (strip-major rows); one block carries a
    tile's N_SEG consecutive strip rows so kernels read
    `ref[0, h, tj, 0]`. Last two block dims equal the array dims (Mosaic's
    SMEM layout rule, see _bin_specs)."""
    return pl.BlockSpec((1, N_SEG, n_cols, 1), lambda b, i, j: (b, i, 0, 0),
                        memory_space=pltpu.SMEM)


def _prepare_tables(tri_data, attr_packed, chunk, image_width, image_height,
                    row_offset, full_height, binning):
    """Shared prepass: binning plan + two-section table + legacy candidates.

    binning='gathered' routes triangles to per-tile gathered segments with
    legacy fallback; 'chunk' routes everything to the legacy chunk-binned
    loop (the pre-gather behavior, kept as a debugging/benchmark knob).
    """
    if binning not in ("gathered", "chunk"):
        raise ValueError(
            f"binning must be 'gathered' or 'chunk', got {binning!r}")
    batch, t_pad, _ = tri_data.shape
    n_rows = pl.cdiv(image_height, TILE_H)
    n_cols = pl.cdiv(image_width, TILE_W)
    if binning == "gathered":
        # SEG_H-strip granularity (N_SEG strip rows per kernel tile row);
        # the plan's height pads to whole tiles so strip h of tile i is
        # always plan row N_SEG*i + h. Strips past the image bottom can
        # only add dead visits, never lose real ones (the hit test is an
        # exact superset per strip). The overflow cap scales with N_SEG so
        # the same triangles fall to the legacy loop, to first order.
        n_strips = n_rows * N_SEG
        budget = binning_lib._gather_budget_rows(
            t_pad, n_strips * n_cols, chunk)
        plan = _gather_plan(tri_data[:, :, 15:20], chunk, image_width,
                            n_rows * TILE_H, row_offset, full_height,
                            budget, cap=binning_lib.GATHER_TILE_CAP * N_SEG,
                            tile_h=SEG_H)
    else:
        plan = _legacy_plan(batch, t_pad, chunk, n_rows * N_SEG, n_cols)
    # Chunk mode's kernels use positional triangle ids (section-B rows ARE
    # original rows), so the bare table skips the id column entirely — the
    # table is the untouched packed data, exactly the pre-gathered program.
    # The fused table keeps it: the _ATTR_COL layout offset is shared with
    # gathered mode and the extra column rides the existing attr concat.
    with_id = (binning == "gathered") or attr_packed is not None
    table, base = _build_tables(tri_data, attr_packed, plan, with_id=with_id)
    s_rows = plan[0].shape[1]
    candidates, counts = _bin_chunks(table[:, s_rows:], chunk, image_width,
                                     image_height, row_offset, full_height)
    return table, base, s_rows, plan, candidates, counts


def _forward_from_packed(table, s_rows, plan, candidates, counts,
                         row_offset, image_width, image_height, full_height,
                         interpret):
    """Batched forward: two-section table -> (ids, bc, z) per image."""
    batch, total_rows, _ = table.shape
    n_tri_padded = total_rows - s_rows
    gathered = s_rows > 0
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, s_rows=s_rows, gathered=gathered)

    out_shape = [
        jax.ShapeDtypeStruct((batch, image_height, image_width), jnp.int32),
    ] + [jax.ShapeDtypeStruct((batch, image_height, image_width),
                              jnp.float32)] * 4
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, table.shape[-1]),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))

    if gathered:
        seg_in_specs = [seg_spec, seg_spec]  # segment starts + chunk counts
        seg_args = (plan[2], plan[3])
    else:
        seg_in_specs, seg_args = [], ()
    ids, b0, b1, b2, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row offset scalar
        ] + seg_in_specs + [
            count_spec,   # legacy candidate counts
            cand_spec,    # legacy candidate chunk ids
            tri_spec,
        ],
        out_specs=[tile_spec] * 5,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, *seg_args, counts, candidates, table)
    bc = jnp.stack([b0, b1, b2], axis=-1)
    # Background contract: id 0, bc 0, z 1 (kernels' shared contract).
    return ids, bc, jnp.where(z > 1.0, 1.0, z)


def _bwd_tile_inputs(ti, h, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref,
                     g1_ref, g2_ref, image_width, image_height):
    """Masked per-strip residuals/cotangents + winner-id chunk-cull range.

    Boundary tiles are padded with uninitialized memory; mask it out or
    garbage ids/cotangents would contribute to the sums. Returns the
    degenerate-pixel mask (cpp:162-164: id 0 with barycentric sum below the
    cutoff is background) and the [min, max] winner-id range used to skip
    chunks no pixel in this strip references.
    """
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 1)
    pix_ok = ((row_idx + ti * TILE_H + h * SEG_H < image_height) &
              (col_idx + tj * TILE_W < image_width))

    def sl(ref):
        return ref[0, pl.ds(h * SEG_H, SEG_H), :]

    ids = jnp.where(pix_ok, sl(id_ref), -1)
    b0 = jnp.where(pix_ok, sl(b0_ref), 0.0)
    b1 = jnp.where(pix_ok, sl(b1_ref), 0.0)
    b2 = jnp.where(pix_ok, sl(b2_ref), 0.0)
    g0 = jnp.where(pix_ok, sl(g0_ref), 0.0)
    g1 = jnp.where(pix_ok, sl(g1_ref), 0.0)
    g2 = jnp.where(pix_ok, sl(g2_ref), 0.0)

    active = ~((ids == 0) &
               (b0 + b1 + b2 < DEGENERATE_BARYCENTRIC_CUTOFF))
    masked_ids = jnp.where(active, ids, jnp.iinfo(jnp.int32).max)
    tile_id_min = jnp.min(jnp.min(masked_ids, axis=1), axis=0)
    tile_id_max = jnp.max(jnp.max(jnp.where(active, ids, -1), axis=1),
                          axis=0)
    return (pix_ok, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
            tile_id_max)


def _bwd_chunk_core(data, mask, g0t, g1t, g2t, gb, bmat, chunk, n_pix,
                    dcorner_ref, row_start, precision):
    """Analytic vertex-gradient chain for one chunk (cpp:131-273).

    Pixels whose winning id matches a chunk triangle contribute
    b_k * (s_c * <g, b> - sum_i g_i m_inv[i, c]) / |det| to that triangle's
    corner-k coordinate-c gradient (the closed form of the reference's
    27-term accumulation, see rasterize_xla). Each coordinate's three
    corner sums run as one [C, P] x [P, 3] matmul against `bmat` (the
    stacked barycentric images); the result accumulates into the
    coordinate-major [T_pad, 9] table (column cc * 3 + k).
    """

    def col(k):
        return data[:, k].reshape(chunk, 1, 1)

    inv_det = col(20)
    # Stack the three coordinates' residual images and reduce them against
    # the barycentric basis in ONE [3C, P] x [P, 3] MXU dot (three separate
    # K=P dots cost three dot launches for the same arithmetic).
    ts = []
    for cc in range(3):  # coordinate in {x, y, w}
        s_c = col(cc) + col(3 + cc) + col(6 + cc)
        r_c = (g0t[None] * col(cc) + g1t[None] * col(3 + cc) +
               g2t[None] * col(6 + cc))
        t_c = (s_c * gb[None] - r_c) * inv_det * mask
        ts.append(t_c.reshape(chunk, n_pix))
    red = jax.lax.dot_general(
        jnp.concatenate(ts, axis=0), bmat,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)  # [3C, 3]
    for cc in range(3):
        sl = (0, pl.ds(row_start, chunk), pl.ds(cc * 3, 3))
        dcorner_ref[sl] = (dcorner_ref[sl]
                           + red[cc * chunk:(cc + 1) * chunk])


def _bwd_kernel(row_off_ref, *refs, image_width, image_height, full_height,
                s_rows, gathered, precision):
    """Analytic backward as a per-tile reduction to a row-gradient table.

    The per-(triangle, corner, coord) sums accumulate per batch element
    (revisited across this batch element's consecutive tile steps); the
    host side then segment-sums the gathered section back to original rows
    and scatters [T, 9] -> [V, 4] (T-sized instead of (H * W * 3)-sized).
    Both loops cull chunks by the tile's winner-id range: the gathered
    segment via the prepass id-range arrays, the legacy candidates via
    their position-derived range (section-B ids ARE row positions).
    `gathered` is STATIC: chunk mode takes no segment/id-range refs, emits
    no A loop, and uses positional triangle ids (the pre-gathered program).
    """
    if gathered:
        (a_start_ref, a_count_ref, a_idmin_ref, a_idmax_ref, b_count_ref,
         b_cand_ref, tri_ref, id_ref, b0_ref, b1_ref, b2_ref, g0_ref,
         g1_ref, g2_ref, dcorner_ref) = refs
    else:
        (b_count_ref, b_cand_ref, tri_ref, id_ref, b0_ref, b1_ref, b2_ref,
         g0_ref, g1_ref, g2_ref, dcorner_ref) = refs
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = SEG_H * TILE_W

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        dcorner_ref[:] = jnp.zeros_like(dcorner_ref)

    for h in range(N_SEG):
        (_, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
         tile_id_max) = _bwd_tile_inputs(
             ti, h, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref,
             g2_ref, image_width, image_height)
        gb = g0 * b0 + g1 * b1 + g2 * b2
        bmat = jnp.concatenate([b0.reshape(1, n_pix), b1.reshape(1, n_pix),
                                b2.reshape(1, n_pix)], axis=0)  # [3, P]

        def visit(row_start, ids=ids, active=active, g0=g0, g1=g1, g2=g2,
                  gb=gb, bmat=bmat):
            data = tri_ref[0, pl.ds(row_start, BWD_TRI_CHUNK), :]
            if gathered:
                tid = data[:, _ID_COL].astype(jnp.int32).reshape(
                    BWD_TRI_CHUNK, 1, 1)
            else:
                tid = row_start + jax.lax.broadcasted_iota(
                    jnp.int32, (BWD_TRI_CHUNK, 1, 1), 0)
            mask = ((ids[None] == tid) & active[None]).astype(jnp.float32)
            _bwd_chunk_core(data, mask, g0, g1, g2, gb, bmat, BWD_TRI_CHUNK,
                            n_pix, dcorner_ref, row_start, precision)
            return 0

        def b_body(i, _, visit=visit, tile_id_min=tile_id_min,
                   tile_id_max=tile_id_max):
            c = b_cand_ref[0, 0, tj, i]
            hit = ((c * BWD_TRI_CHUNK <= tile_id_max) &
                   ((c + 1) * BWD_TRI_CHUNK > tile_id_min))
            jax.lax.cond(hit,
                         lambda _: visit(s_rows + c * BWD_TRI_CHUNK),
                         lambda _: 0, 0)
            return 0

        if gathered:
            a_start = a_start_ref[0, h, tj, 0]

            def a_body(i, _, a_start=a_start, visit=visit,
                       tile_id_min=tile_id_min, tile_id_max=tile_id_max):
                c = a_start + i
                hit = ((a_idmin_ref[0, 0, c] <= tile_id_max) &
                       (a_idmax_ref[0, 0, c] >= tile_id_min))
                jax.lax.cond(hit,
                             lambda _: visit(c * BWD_TRI_CHUNK),
                             lambda _: 0, 0)
                return 0

            jax.lax.fori_loop(0, a_count_ref[0, h, tj, 0], a_body, 0)
        jax.lax.fori_loop(0, b_count_ref[0, h, tj, 0], b_body, 0)


def _scatter_corner_grads(dcorner, triangles, batch, vertex_count):
    """Coord-major [B, T_pad, 9] table -> df/d(clip vertices) [B, V, 4]."""
    tris = jnp.asarray(triangles, jnp.int32)
    n_tri = tris.shape[-2]
    df_dvertices = jnp.zeros([batch, vertex_count, 4], jnp.float32)
    for k in range(3):  # corner scatter: T-sized, vertex z stays zero
        grads_xyw = dcorner[:, :n_tri, k::3]
        updates = jnp.concatenate(
            [grads_xyw[..., 0:2],
             jnp.zeros([batch, n_tri, 1], jnp.float32),
             grads_xyw[..., 2:3]], axis=-1)
        df_dvertices = df_dvertices.at[:, tris[:, k]].add(updates)
    return df_dvertices


def _backward_pallas(table, plan, candidates, counts, triangles,
                     vertex_count, ids, bc, df_dbc, row_offset, image_width,
                     image_height, full_height, interpret, dot_precision):
    """Batched backward: [B, ...] residuals -> df/d(clip vertices) [B, V, 4].
    """
    assert BWD_TRI_CHUNK == TRI_CHUNK  # gathered segments are chunk-aligned
    batch, total_rows, width = table.shape
    s_rows = plan[0].shape[1]
    gathered = s_rows > 0
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _bwd_kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, s_rows=s_rows, gathered=gathered,
        precision=_resolve_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, width),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, total_rows, 9),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    _, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // BWD_TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    if gathered:
        idmin, idmax = _gathered_id_ranges(plan[0], n_tri_padded,
                                           BWD_TRI_CHUNK)
        idrange_spec = pl.BlockSpec((1, 1, idmin.shape[-1]),
                                    lambda b, i, j: (b, 0, 0),
                                    memory_space=pltpu.SMEM)
        seg_in_specs = [
            seg_spec,        # winner per-strip segment starts
            seg_spec,        # winner per-strip segment chunk counts
            idrange_spec,    # gathered chunk id minima
            idrange_spec,    # gathered chunk id maxima
        ]
        seg_args = (plan[2], plan[3], idmin, idmax)
    else:
        seg_in_specs, seg_args = [], ()
    dtab = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + seg_in_specs + [
            seg_spec,        # legacy candidate counts (per strip)
            cand_spec,       # legacy candidate chunk ids (per tile)
            tri_spec,
        ] + [tile_spec] * 7,
        out_specs=[acc_spec],
        out_shape=[jax.ShapeDtypeStruct((batch, total_rows, 9),
                                        jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, *seg_args, counts, candidates, table,
      ids, bc[..., 0], bc[..., 1], bc[..., 2], df_dbc[..., 0],
      df_dbc[..., 1], df_dbc[..., 2])[0]
    dcorner = _segment_sum_gathered(dtab, s_rows, plan[0])
    return _scatter_corner_grads(dcorner, triangles, batch, vertex_count)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _pallas_core(clip_vertices, triangles, row_offset, image_width,
                 image_height, full_height, interpret, dot_precision,
                 binning):
    out, _ = _fwd(clip_vertices, triangles, row_offset, image_width,
                  image_height, full_height, interpret, dot_precision,
                  binning)
    return out


def _fwd(clip_vertices, triangles, row_offset, image_width, image_height,
         full_height, interpret, dot_precision, binning):
    tri_data = _pack_batched(clip_vertices, triangles, TRI_CHUNK)
    table, base, s_rows, plan, candidates, counts = _prepare_tables(
        tri_data, None, TRI_CHUNK, image_width, image_height, row_offset,
        full_height, binning)
    out = _forward_from_packed(table, s_rows, plan, candidates, counts,
                               row_offset, image_width, image_height,
                               full_height, interpret)
    ids, bc, _ = out
    if BWD_PLAN == "forward":
        # The backward reuses this pass's plan + table verbatim (both are
        # already computed; no backward prepass at all). In chunk mode the
        # forward and backward tables are bit-identical by construction
        # (one dead sentinel chunk + the full-liveness original section),
        # so the reuse skips an entire _bin_chunks re-run + table copy.
        saved = jax.lax.stop_gradient((table, plan, candidates, counts))
    else:
        # BWD_PLAN='winner': the backward rebuilds winner-segment tables
        # from `base` (gathered mode; chunk mode rebuilds chunk tables).
        saved = jax.lax.stop_gradient(base)
    residuals = (saved, triangles, clip_vertices.shape[1], ids, bc,
                 row_offset)
    return out, residuals


def _bwd(image_width, image_height, full_height, interpret, dot_precision,
         binning, residuals, cotangents):
    saved, triangles, vertex_count, ids, bc, row_offset = residuals
    _, df_dbc, _ = cotangents
    if BWD_PLAN == "forward":
        table, plan, candidates, counts = saved
        # The forward's legacy candidate counts are per tile; the backward
        # kernel consumes them per SEG_H strip.
        counts = jnp.repeat(counts, N_SEG, axis=1)
    else:
        table, s_rows, plan, candidates, counts = _prepare_bwd_tables(
            saved, ids, bc, TRI_CHUNK, image_width, image_height,
            row_offset, full_height, binning)
    df_dvertices = _backward_pallas(
        table, plan, candidates, counts, triangles, vertex_count, ids, bc,
        df_dbc, row_offset, image_width, image_height, full_height,
        interpret, dot_precision)
    tri_cot = np.zeros(np.shape(triangles), dtype=jax.dtypes.float0)
    row_cot = np.zeros((), dtype=jax.dtypes.float0)
    return df_dvertices, tri_cot, row_cot


_pallas_core.defvjp(_fwd, _bwd)


def _default_interpret(interpret):
    if interpret is None:
        try:
            return jax.devices()[0].platform != "tpu"
        except Exception:  # pragma: no cover
            return True
    return bool(interpret)


def rasterize_barycentric_pallas_batched(clip_vertices, triangles,
                                         image_width, image_height,
                                         row_offset=None, full_height=None,
                                         interpret=None,
                                         dot_precision="default",
                                         binning="auto"):
    """Differentiable tiled-Pallas hard rasterization of a mesh batch.

    clip_vertices is [batch, V, 4]; returns (ids [B, H, W] i32,
    barycentrics [B, H, W, 3] f32, z [B, H, W] f32). The whole batch runs in
    one pallas_call with batch as the leading grid dimension (do NOT vmap
    over this function — batching is native). Meshes beyond the per-pass
    cap render in multiple depth-merged passes, so the triangle dimension
    scales to HBM capacity. `binning`: 'auto' (default — chunk on the hard
    path, see _resolve_binning), 'gathered' (triangle-granularity tile
    lists; bit-identical) or 'chunk' (chunk-granularity prepass).
    """
    binning = _resolve_binning(binning)
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    interp = _default_interpret(interpret)
    tris = jnp.asarray(triangles, jnp.int32)
    row_off = jnp.asarray(row_offset, jnp.int32)

    _resolve_precision(dot_precision)  # validate eagerly
    def one_pass(tri_slice):
        return _pallas_core(clip_vertices, tri_slice, row_off,
                            int(image_width), int(image_height),
                            int(full_height), interp, dot_precision,
                            binning)

    slices = _triangle_slices(tris.shape[0], _max_pass_triangles(binning))
    if len(slices) <= 1:  # includes the zero-triangle mesh (empty slices)
        return one_pass(tris)
    ids0, bc0, z0 = one_pass(tris[slices[0][0]:slices[0][0] + slices[0][1]])
    cov0 = jnp.sum(bc0, axis=-1) > 0.5
    best = (jnp.where(cov0, ids0, 0), bc0, z0, cov0)
    for start, size in slices[1:]:
        ids, bc, z = one_pass(tris[start:start + size])
        best = _merge_pass(best, ids, bc, z, start)
    gids, bc, z, cov = best
    return jnp.where(cov, gids, 0), bc, z


def rasterize_barycentric_pallas(clip_vertices, triangles, image_width,
                                 image_height, row_offset=None,
                                 full_height=None, interpret=None,
                                 dot_precision="default",
                                 binning="auto"):
    """Single-mesh wrapper over the batched Pallas rasterizer.

    Same contract as rasterize_xla.rasterize_barycentric_xla (ids /
    barycentrics / z-buffer; gradients through barycentrics only).
    `interpret` defaults to True off-TPU so tests exercise identical
    semantics on the CPU mesh.
    """
    ids, bc, z = rasterize_barycentric_pallas_batched(
        clip_vertices[None], triangles, image_width, image_height,
        row_offset=row_offset, full_height=full_height, interpret=interpret,
        dot_precision=dot_precision, binning=binning)
    return ids[0], bc[0], z[0]


# ---------------------------------------------------------------------------
# Fused rasterization + attribute interpolation
# ---------------------------------------------------------------------------


def _pad_attr_count(attribute_count):
    return max(8, -(-attribute_count // 8) * 8)


def _spatial_order(clip_vertices, triangles, y_bits=6, x_bits=10):
    """Screen-space triangle order for tight binning: [T] permutation.

    Sorts triangles by batch-mean NDC centroid, y-major in 2**y_bits
    horizontal bands with x ascending within a band — so consecutive
    triangles (and hence the chunk-level bbox unions `_bin_chunks` culls
    with) stay compact in both tile axes. Measured on the 256^2 teapot
    headline: 1864 -> 1282 binned (tile, chunk) pairs, -31%. Hard
    rasterization is a pure arg-min selection, so reordering changes NO
    output values — only which triangle wins when two z values tie
    bit-exactly (coplanar overlaps), where the reference's later-id rule
    is itself arbitrary.

    The order is SHARED across the batch (clip_vertices [B, V, 4] ->
    batch-mean centroids): a per-batch order binned ~20% tighter on
    rotated batches but made every downstream triangle gather/scatter a
    per-batch-index op, which measured >2x slower end-to-end at the
    512^2/10k-tri stress config (255 -> 583 ms/step) — shared indices
    keep XLA's cheap operand-batched gather/scatter lowering.
    """
    tv = clip_vertices[..., triangles, :]  # [B, T, 3, 4]
    w = tv[..., 3]
    safe_w = jnp.where(w != 0.0, w, 1.0)
    nd = tv[..., :2] / safe_w[..., None]
    cx = jnp.mean(nd[..., 0], axis=-1)  # [B, T] per-batch centroid x
    cy = jnp.mean(nd[..., 1], axis=-1)
    if cx.ndim == 2:  # batch-mean
        cx = jnp.mean(cx, axis=0)
        cy = jnp.mean(cy, axis=0)
    cx = jnp.clip(cx * 0.5 + 0.5, 0.0, 1.0)
    cy = jnp.clip(cy * 0.5 + 0.5, 0.0, 1.0)
    yq = (cy * ((1 << y_bits) - 1)).astype(jnp.int32)
    xq = (cx * ((1 << x_bits) - 1)).astype(jnp.int32)
    return jnp.argsort((yq << x_bits) | xq)


def _spatial_order_auto(clip_vertices, triangles, chunk, image_width,
                        image_height, row_offset, full_height):
    """[T] permutation: screen-space sorted, or identity if that bins
    tighter.

    Whether `_spatial_order` helps is mesh-dependent: it bins the 2.4k-tri
    teapot 21% tighter (+14% end-to-end) but the UV-sphere stress mesh 35%
    LOOSER — topology-adjacent triangles share edges, so a well-ordered
    mesh's chunk bboxes beat any centroid sort's. Rather than guess, count
    the binned (tile, chunk) pairs both ways with the cheap `_bin_hits`
    overlap test (no candidate argsort) and keep whichever order culls
    tighter — decided per call under jit, no recompiles.
    """
    tris = jnp.asarray(triangles, jnp.int32)
    order_s = _spatial_order(clip_vertices, tris)
    tv = clip_vertices[..., tris, :]  # [B, T, 3, 4]
    bbox5 = _bbox_live_cols(tv[..., 0], tv[..., 1], tv[..., 3])

    t = tris.shape[0]
    pad = (-t) % chunk

    def pairs_of(b5):
        if pad:
            b5 = jnp.pad(b5, [(0, 0), (0, pad), (0, 0)])
        hit = _bin_hits(b5, chunk, image_width, image_height, row_offset,
                        full_height)
        return jnp.sum(hit, dtype=jnp.int32)

    native = pairs_of(bbox5)
    sorted_ = pairs_of(bbox5[:, order_s])
    return jnp.where(sorted_ < native, order_s,
                     jnp.arange(t, dtype=order_s.dtype))


def _pack_corner_attributes(attributes, triangles, a_pad, n_tri_padded):
    """[B, V, A] -> [B, T_pad, 3*a_pad] per-triangle corner attributes."""
    corner = attributes[:, triangles]  # [B, T, 3, A]
    batch, t, _, a = corner.shape
    corner = jnp.pad(
        corner, [(0, 0), (0, n_tri_padded - t), (0, 0), (0, a_pad - a)])
    return corner.reshape(batch, n_tri_padded, 3 * a_pad)


def _kernel_fused(row_off_ref, *refs, image_width, image_height,
                  full_height, s_rows, a_pad, chunk, with_z, gathered,
                  precision):
    if gathered:
        a_start_ref, a_count_ref = refs[:2]
        refs = refs[2:]
        attr_in_ref = None  # corner attrs ride the combined table
        (b_count_ref, b_cand_ref, tri_ref) = refs[:3]
        refs = refs[3:]
    else:
        a_start_ref = a_count_ref = None
        (b_count_ref, b_cand_ref, tri_ref, attr_in_ref) = refs[:4]
        refs = refs[4:]
    (id_ref, b0_ref, b1_ref, b2_ref) = refs[:4]
    rest = refs[4:]
    if with_z:
        z_ref, attr_ref = rest
    else:
        (attr_ref,) = rest
    _kernel_fused_body(row_off_ref, a_start_ref, a_count_ref, b_count_ref,
                       b_cand_ref, tri_ref, attr_in_ref, id_ref, b0_ref,
                       b1_ref, b2_ref, z_ref if with_z else None, attr_ref,
                       image_width=image_width, image_height=image_height,
                       full_height=full_height, s_rows=s_rows,
                       a_pad=a_pad, chunk=chunk, gathered=gathered,
                       precision=precision)


def _kernel_fused_body(row_off_ref, a_start_ref, a_count_ref, b_count_ref,
                       b_cand_ref, tri_ref, attr_in_ref, id_ref, b0_ref,
                       b1_ref, b2_ref, z_ref, attr_ref, *, image_width,
                       image_height, full_height, s_rows, a_pad, chunk,
                       gathered, precision):
    """Forward tile kernel with in-tile attribute interpolation.

    Same two binned loops as _kernel (gathered segment + legacy fallback)
    plus a flat [a_pad, P] attribute carry: each chunk's winning triangles
    contribute sum_k (winner * b_k) @ corner_attrs_k via MXU matmuls, and
    the carry keeps the value from whichever chunk currently wins the
    z-test. The z-buffer lives only in the carry (no HBM output — the
    fused contract has no z consumer). Chunk mode reads corner attributes
    from their own ref (attr_in_ref, lane offsets k * a_pad); gathered
    mode reads them from the combined table at _ATTR_COL (attr_in_ref is
    None) — see the _ATTR_COL layout comment for the measured tradeoff.
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = SEG_H * TILE_W

    def run_strip(h):
        px, py = _strip_pixel_coords(ti, h, tj, row_off_ref[0], image_width,
                                     full_height)

        def visit(row_start, carry):
            blk = tri_ref[0, pl.ds(row_start, chunk), :]
            if attr_in_ref is None:
                ablk, a_off = blk, _ATTR_COL  # gathered: combined table
            else:
                ablk = attr_in_ref[0, pl.ds(row_start, chunk), :]
                a_off = 0
            tri_ids = None if gathered else (
                row_start + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, 1, 1), 0))
            best_z, best_id, best_we0, best_we1, best_we2, best_attr = carry
            chunk_z, chunk_id, w0, w1, w2 = _rasterize_chunk_core(
                blk, px, py, chunk, tri_ids)

            # Three corner dots, not one grouped [A, 3C] x [3C, P] dot:
            # Mosaic cannot concatenate the lane-offset corner slices of
            # the block along the sublane dim ("result/input offset
            # mismatch on non-concat dimension"), and the measured cost of
            # the extra dot launches is inside run-to-run noise.
            chunk_attr = jnp.zeros((a_pad, n_pix), jnp.float32)
            for k, wk in enumerate((w0, w1, w2)):
                ak = ablk[:, a_off + k * a_pad:
                          a_off + (k + 1) * a_pad]  # [C, A]
                chunk_attr = chunk_attr + jax.lax.dot_general(
                    ak, wk.reshape(chunk, n_pix),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)  # [A, P]

            better = _merge_better(chunk_z, chunk_id, best_z, best_id)
            # Mosaic can't shape-cast i1 vectors; flatten as f32.
            betterf = (better.astype(jnp.float32).reshape(1, n_pix) > 0.0)
            best_z = jnp.where(better, chunk_z, best_z)
            best_id = jnp.where(better, chunk_id, best_id)
            best_we0 = jnp.where(better, jnp.sum(w0, axis=0), best_we0)
            best_we1 = jnp.where(better, jnp.sum(w1, axis=0), best_we1)
            best_we2 = jnp.where(better, jnp.sum(w2, axis=0), best_we2)
            best_attr = jnp.where(betterf, chunk_attr, best_attr)
            return (best_z, best_id, best_we0, best_we1, best_we2,
                    best_attr)

        def b_body(i, carry):
            return visit(s_rows + b_cand_ref[0, 0, tj, i] * chunk, carry)

        zeros = jnp.zeros((SEG_H, TILE_W), jnp.float32)
        init = (jnp.ones((SEG_H, TILE_W), jnp.float32),
                jnp.full((SEG_H, TILE_W), -1, jnp.int32),
                zeros, zeros, zeros,
                jnp.zeros((a_pad, n_pix), jnp.float32))
        if gathered:
            a_start = a_start_ref[0, h, tj, 0]
            init = jax.lax.fori_loop(
                0, a_count_ref[0, h, tj, 0],
                lambda i, carry: visit((a_start + i) * chunk, carry), init)
        (best_z, best_id, best_we0, best_we1, best_we2,
         best_attr) = jax.lax.fori_loop(0, b_count_ref[0, 0, tj, 0], b_body,
                                        init)

        # Deferred normalization: bc from the winner edges (bit-identical,
        # see _rasterize_chunk_core), attrs rescaled by the same reciprocal
        # (the interpolation matmuls consumed raw e-weights; rescaling
        # after the dot differs from before-the-dot only in bf16 rounding
        # order, inside the kernels' parity tolerances).
        b0, b1, b2, inv_sum = _normalize_winner_edges(best_we0, best_we1,
                                                      best_we2)
        attr = (best_attr * inv_sum.reshape(1, n_pix)).reshape(
            a_pad, SEG_H, TILE_W)
        return best_z, best_id, b0, b1, b2, attr

    strips = [run_strip(h) for h in range(N_SEG)]
    if N_SEG == 1:
        best_z, best_id, b0, b1, b2, attr = strips[0]
    else:
        parts = list(zip(*strips))
        best_z, best_id, b0, b1, b2 = (
            jnp.concatenate(p, axis=0) for p in parts[:5])
        attr = jnp.concatenate(parts[5], axis=1)  # [a_pad, TILE_H, TILE_W]

    id_ref[0] = jnp.maximum(best_id, 0)
    b0_ref[0] = b0
    b1_ref[0] = b1
    b2_ref[0] = b2
    if z_ref is not None:  # only the multi-pass merge consumes z
        z_ref[0] = jnp.where(best_z > 1.0, 1.0, best_z)
    attr_ref[0] = attr


def _forward_fused(table, s_rows, plan, candidates, counts, a_pad,
                   row_offset, image_width, image_height, full_height,
                   interpret, chunk, dot_precision, with_z=False):
    """Fused forward: -> (ids, bc, z-or-None, attrs [B, a_pad, H, W]).

    `table` is the combined data+id+attr table in gathered mode, or the
    (packed data, packed corner attrs) pair in chunk mode (split refs —
    no concat, and the chunk kernels measured faster on split tables;
    see the _ATTR_COL comment). The z image is materialized to HBM only
    when `with_z` (the multi-pass depth merge is its sole consumer;
    single-pass callers skip the extra B*H*W*4-byte write).
    """
    gathered = s_rows > 0
    if gathered:
        data_table, attr_table = table, None
    else:
        data_table, attr_table = table
    batch, total_rows, width = data_table.shape
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _kernel_fused, image_width=image_width, image_height=image_height,
        full_height=full_height, s_rows=s_rows, a_pad=a_pad,
        chunk=chunk, with_z=with_z, gathered=gathered,
        precision=_resolve_precision(dot_precision))

    n_f32_images = 4 if with_z else 3
    out_shape = [
        jax.ShapeDtypeStruct((batch, image_height, image_width), jnp.int32),
    ] + [jax.ShapeDtypeStruct((batch, image_height, image_width),
                              jnp.float32)] * n_f32_images + [
        jax.ShapeDtypeStruct((batch, a_pad, image_height, image_width),
                             jnp.float32),
    ]
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, width),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    attr_out_spec = pl.BlockSpec((1, a_pad, TILE_H, TILE_W),
                                 lambda b, i, j: (b, 0, i, j),
                                 memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // chunk)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))

    if gathered:
        seg_in_specs = [seg_spec, seg_spec]  # segment starts + chunk counts
        seg_args = (plan[2], plan[3])
        attr_in_specs, attr_args = [], ()
    else:
        seg_in_specs, seg_args = [], ()
        attr_in_specs = [pl.BlockSpec((1, total_rows, attr_table.shape[-1]),
                                      lambda b, i, j: (b, 0, 0),
                                      memory_space=pltpu.VMEM)]
        attr_args = (attr_table,)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + seg_in_specs + [
            count_spec,   # legacy candidate counts
            cand_spec,    # legacy candidate chunk ids
            tri_spec,
        ] + attr_in_specs,
        out_specs=[tile_spec] * (1 + n_f32_images) + [attr_out_spec],
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, *seg_args, counts, candidates, data_table, *attr_args)
    if with_z:
        ids, b0, b1, b2, z, attrs = outs
    else:
        ids, b0, b1, b2, attrs = outs
        z = None
    bc = jnp.stack([b0, b1, b2], axis=-1)
    return ids, bc, z, attrs


def _bwd_kernel_fused(row_off_ref, *refs, image_width, image_height,
                      full_height, s_rows, a_pad, chunk, gathered,
                      precision):
    """Fused backward: combined vertex+attribute row-gradient table.

    Extends _bwd_kernel's analytic chain with the interpolation VJP: the
    per-pixel barycentric cotangent picks up sum_a gattr[a] * attr_k[t, a]
    (computed per chunk as [C, A] @ [A, P] matmuls, selected by the winner
    mask), and the per-triangle attribute gradient accumulates
    (mask * b_k) @ gattr^T. Vertex gradients land in output columns 0..8,
    attribute gradients from _OUT_ATTR_COL — one combined table so the
    VMEM lane padding (everything pads to 128 lanes) is paid once.
    `gathered` is STATIC — see _bwd_kernel.
    """
    if gathered:
        (a_start_ref, a_count_ref, a_idmin_ref, a_idmax_ref, b_count_ref,
         b_cand_ref, tri_ref, id_ref, b0_ref, b1_ref, b2_ref, g0_ref,
         g1_ref, g2_ref, gattr_ref, dtab_ref) = refs
        attr_in_ref = None  # corner attrs ride the combined table
    else:
        (b_count_ref, b_cand_ref, tri_ref, attr_in_ref, id_ref, b0_ref,
         b1_ref, b2_ref, g0_ref, g1_ref, g2_ref, gattr_ref,
         dtab_ref) = refs
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = SEG_H * TILE_W

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        dtab_ref[:] = jnp.zeros_like(dtab_ref)

    for h in range(N_SEG):
        (pix_ok, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
         tile_id_max) = _bwd_tile_inputs(
             ti, h, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref,
             g2_ref, image_width, image_height)
        gattr = jnp.where(
            pix_ok[None],
            gattr_ref[0, :, pl.ds(h * SEG_H, SEG_H), :], 0.0)  # [A, SH, TW]
        gattrf = gattr.reshape(a_pad, n_pix)
        b0f = b0.reshape(1, n_pix)
        b1f = b1.reshape(1, n_pix)
        b2f = b2.reshape(1, n_pix)
        bmat = jnp.concatenate([b0f, b1f, b2f], axis=0)  # [3, P]

        def visit(row_start, ids=ids, active=active, g0=g0, g1=g1, g2=g2,
                  b0=b0, b1=b1, b2=b2, b0f=b0f, b1f=b1f, b2f=b2f,
                  bmat=bmat, gattrf=gattrf):
            blk = tri_ref[0, pl.ds(row_start, chunk), :]
            if attr_in_ref is None:
                ablk, a_off = blk, _ATTR_COL  # gathered: combined table
            else:
                ablk = attr_in_ref[0, pl.ds(row_start, chunk), :]
                a_off = 0
            if gathered:
                tid = blk[:, _ID_COL].astype(jnp.int32).reshape(chunk, 1, 1)
            else:
                tid = row_start + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, 1, 1), 0)
            mask = ((ids[None] == tid) & active[None]).astype(jnp.float32)
            maskf = mask.reshape(chunk, n_pix)

            # Interpolation contribution to the barycentric cotangents:
            # dbc_k(p) = sum_a gattr(a, p) * attr_k[winner(p), a].
            # (Per-corner dots: Mosaic cannot concat the lane-offset
            # corner slices of the block into one [3C, A] operand.)
            dbc = []
            for k in range(3):
                ak = ablk[:, a_off + k * a_pad:
                          a_off + (k + 1) * a_pad]  # [C, A]
                proj = jax.lax.dot_general(
                    ak, gattrf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)  # [C, P]
                proj = proj.reshape(chunk, SEG_H, TILE_W)
                dbc.append(jnp.sum(mask * proj, axis=0))
            g0t = g0 + dbc[0]
            g1t = g1 + dbc[1]
            g2t = g2 + dbc[2]
            gb = g0t * b0 + g1t * b1 + g2t * b2
            _bwd_chunk_core(blk, mask, g0t, g1t, g2t, gb, bmat, chunk,
                            n_pix, dtab_ref, row_start, precision)

            # Attribute gradients: dattr_k[t, a] = sum_p mask*b_k * gattr —
            # one [3C, P] x [P, A] dot for all three corners.
            mb_all = jnp.concatenate(
                [maskf * bkf for bkf in (b0f, b1f, b2f)], axis=0)
            part_all = jax.lax.dot_general(
                mb_all, gattrf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [3C, A]
            for k in range(3):
                sl = (0, pl.ds(row_start, chunk),
                      pl.ds(_OUT_ATTR_COL + k * a_pad, a_pad))
                dtab_ref[sl] = (dtab_ref[sl]
                                + part_all[k * chunk:(k + 1) * chunk])
            return 0

        def b_body(i, _, visit=visit, tile_id_min=tile_id_min,
                   tile_id_max=tile_id_max):
            c = b_cand_ref[0, 0, tj, i]
            hit = ((c * chunk <= tile_id_max) &
                   ((c + 1) * chunk > tile_id_min))
            jax.lax.cond(hit, lambda _: visit(s_rows + c * chunk),
                         lambda _: 0, 0)
            return 0

        if gathered:
            a_start = a_start_ref[0, h, tj, 0]

            def a_body(i, _, a_start=a_start, visit=visit,
                       tile_id_min=tile_id_min, tile_id_max=tile_id_max):
                c = a_start + i
                hit = ((a_idmin_ref[0, 0, c] <= tile_id_max) &
                       (a_idmax_ref[0, 0, c] >= tile_id_min))
                jax.lax.cond(hit, lambda _: visit(c * chunk),
                             lambda _: 0, 0)
                return 0

            jax.lax.fori_loop(0, a_count_ref[0, h, tj, 0], a_body, 0)
        jax.lax.fori_loop(0, b_count_ref[0, h, tj, 0], b_body, 0)


def _backward_fused(table, plan, candidates, counts, triangles,
                    vertex_count, attribute_count, ids, bc, df_dbc,
                    df_dattr, row_offset, image_width, image_height,
                    full_height, interpret, dot_precision):
    """-> (df/d clip_vertices [B, V, 4], df/d attributes [B, V, A]).

    `table` follows the _forward_fused contract: combined data+id+attr
    table (gathered), or a (packed data, packed corner attrs) pair
    (chunk mode — split refs, no concat)."""
    s_rows = plan[0].shape[1]
    gathered = s_rows > 0
    if gathered:
        data_table, attr_table = table, None
        a_pad = (table.shape[-1] - _ATTR_COL) // 3
    else:
        data_table, attr_table = table
        a_pad = attr_table.shape[-1] // 3
    batch, total_rows, width = data_table.shape
    n_tri_padded = total_rows - s_rows
    out_width = _OUT_ATTR_COL + 3 * a_pad
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    chunk = _fused_chunk_for(np.shape(triangles)[-2])
    kernel = functools.partial(
        _bwd_kernel_fused, image_width=image_width,
        image_height=image_height, full_height=full_height,
        s_rows=s_rows, a_pad=a_pad, chunk=chunk, gathered=gathered,
        precision=_resolve_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, width),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    gattr_spec = pl.BlockSpec((1, a_pad, TILE_H, TILE_W),
                              lambda b, i, j: (b, 0, i, j),
                              memory_space=pltpu.VMEM)
    dtab_spec = pl.BlockSpec((1, total_rows, out_width),
                             lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)

    # Attribute cotangents: [B, H, W, A] -> padded [B, a_pad, H, W].
    gattr = jnp.moveaxis(df_dattr, -1, 1)
    gattr = jnp.pad(gattr,
                    [(0, 0), (0, a_pad - gattr.shape[1]), (0, 0), (0, 0)])
    _, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // chunk)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    if gathered:
        idmin, idmax = _gathered_id_ranges(plan[0], n_tri_padded, chunk)
        idrange_spec = pl.BlockSpec((1, 1, idmin.shape[-1]),
                                    lambda b, i, j: (b, 0, 0),
                                    memory_space=pltpu.SMEM)
        seg_in_specs = [
            seg_spec,        # winner per-strip segment starts
            seg_spec,        # winner per-strip segment chunk counts
            idrange_spec,    # gathered chunk id minima
            idrange_spec,    # gathered chunk id maxima
        ]
        seg_args = (plan[2], plan[3], idmin, idmax)
        attr_in_specs, attr_args = [], ()
    else:
        seg_in_specs, seg_args = [], ()
        attr_in_specs = [pl.BlockSpec((1, total_rows, attr_table.shape[-1]),
                                      lambda b, i, j: (b, 0, 0),
                                      memory_space=pltpu.VMEM)]
        attr_args = (attr_table,)

    dtab = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + seg_in_specs + [
            seg_spec,        # legacy candidate counts (per strip)
            cand_spec,       # legacy candidate chunk ids (per tile)
            tri_spec,
        ] + attr_in_specs + [tile_spec] * 7 + [gattr_spec],
        out_specs=[dtab_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, total_rows, out_width),
                                 jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, *seg_args, counts, candidates, data_table, *attr_args,
      ids, bc[..., 0], bc[..., 1], bc[..., 2], df_dbc[..., 0],
      df_dbc[..., 1], df_dbc[..., 2], gattr)[0]

    dtotal = _segment_sum_gathered(dtab, s_rows, plan[0])
    df_dvertices = _scatter_corner_grads(dtotal[..., :9], triangles, batch,
                                         vertex_count)
    tris = jnp.asarray(triangles, jnp.int32)
    n_tri = tris.shape[-2]
    df_dattributes = jnp.zeros([batch, vertex_count, attribute_count],
                               jnp.float32)
    for k in range(3):
        col0 = _OUT_ATTR_COL + k * a_pad
        attr_updates = dtotal[:, :n_tri, col0:col0 + attribute_count]
        df_dattributes = df_dattributes.at[:, tris[:, k]].add(attr_updates)
    return df_dvertices, df_dattributes


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _pallas_interp_core(clip_vertices, attributes, triangles, row_offset,
                        image_width, image_height, full_height, interpret,
                        with_z, dot_precision, binning):
    out, _ = _interp_fwd(clip_vertices, attributes, triangles, row_offset,
                         image_width, image_height, full_height, interpret,
                         with_z, dot_precision, binning)
    return out


def _interp_fwd(clip_vertices, attributes, triangles, row_offset,
                image_width, image_height, full_height, interpret, with_z,
                dot_precision, binning):
    chunk = _fused_chunk_for(np.shape(triangles)[-2])
    tri_data = _pack_batched(clip_vertices, triangles, chunk)
    a = attributes.shape[-1]
    a_pad = _pad_attr_count(a)
    attr_packed = _pack_corner_attributes(attributes, triangles, a_pad,
                                          tri_data.shape[1])
    if binning == "chunk":
        # Split tables (no combined concat, no id column — positional
        # ids); the prepass is just the chunk binning.
        batch, t_pad, _ = tri_data.shape
        plan = _legacy_plan(batch, t_pad, chunk,
                            pl.cdiv(image_height, TILE_H) * N_SEG,
                            pl.cdiv(image_width, TILE_W))
        candidates, counts = _bin_chunks(tri_data, chunk, image_width,
                                         image_height, row_offset,
                                         full_height)
        table, base, s_rows = (tri_data, attr_packed), None, 0
    else:
        table, base, s_rows, plan, candidates, counts = _prepare_tables(
            tri_data, attr_packed, chunk, image_width, image_height,
            row_offset, full_height, binning)
    ids, bc, z, attrs = _forward_fused(
        table, s_rows, plan, candidates, counts, a_pad, row_offset,
        image_width, image_height, full_height, interpret, chunk,
        dot_precision, with_z=with_z)
    attr_images = jnp.moveaxis(attrs, 1, -1)[..., :a]  # [B, H, W, A]
    out = (ids, bc, attr_images) + ((z,) if with_z else ())
    if BWD_PLAN == "forward":
        # The backward reuses this pass's plan + table verbatim (see _fwd;
        # in chunk mode the tables are bit-identical by construction).
        saved = jax.lax.stop_gradient((table, plan, candidates, counts))
    elif binning == "chunk":
        # BWD_PLAN='winner', chunk: rebuild the split chunk tables in
        # _interp_bwd from the packed pair.
        saved = jax.lax.stop_gradient((tri_data, attr_packed))
    else:
        # BWD_PLAN='winner': the backward rebuilds winner-segment tables
        # from `base`.
        saved = jax.lax.stop_gradient(base)
    residuals = (saved, triangles, clip_vertices.shape[1], a, ids, bc,
                 row_offset)
    return out, residuals


def _interp_bwd(image_width, image_height, full_height, interpret, with_z,
                dot_precision, binning, residuals, cotangents):
    (saved, triangles, vertex_count, attribute_count, ids, bc,
     row_offset) = residuals
    # Any z cotangent is discarded: the kernel produces no vertex-z gradient
    # (cpp:232-269 property) and z feeds only stop-gradient-style winner
    # selection in the multi-pass merge.
    _, df_dbc, df_dattr = cotangents[0], cotangents[1], cotangents[2]
    chunk = _fused_chunk_for(np.shape(triangles)[-2])
    if BWD_PLAN == "forward":
        table, plan, candidates, counts = saved
        # Per-tile forward legacy counts -> per-strip backward counts.
        counts = jnp.repeat(counts, N_SEG, axis=1)
    elif binning == "chunk":
        # Rebuild the split chunk tables (no winner section in chunk
        # mode — same program as BWD_PLAN='forward' modulo the rebuild).
        tri_data, attr_packed = saved
        batch, t_pad, _ = tri_data.shape
        plan = _legacy_plan(batch, t_pad, chunk,
                            pl.cdiv(image_height, TILE_H) * N_SEG,
                            pl.cdiv(image_width, TILE_W))
        candidates, counts = _bin_chunks(tri_data, chunk, image_width,
                                         image_height, row_offset,
                                         full_height)
        counts = jnp.repeat(counts, N_SEG, axis=1)
        table = (tri_data, attr_packed)
    else:
        table, s_rows, plan, candidates, counts = _prepare_bwd_tables(
            saved, ids, bc, chunk, image_width, image_height, row_offset,
            full_height, binning)
    df_dvertices, df_dattributes = _backward_fused(
        table, plan, candidates, counts, triangles, vertex_count,
        attribute_count, ids, bc, df_dbc, df_dattr, row_offset,
        image_width, image_height, full_height, interpret, dot_precision)
    tri_cot = np.zeros(np.shape(triangles), dtype=jax.dtypes.float0)
    row_cot = np.zeros((), dtype=jax.dtypes.float0)
    return df_dvertices, df_dattributes, tri_cot, row_cot


_pallas_interp_core.defvjp(_interp_fwd, _interp_bwd)


def rasterize_interpolate_pallas_batched(clip_vertices, attributes,
                                         triangles, image_width,
                                         image_height, row_offset=None,
                                         full_height=None, interpret=None,
                                         dot_precision="default",
                                         spatial_sort=True,
                                         binning="auto"):
    """Fused differentiable rasterization + attribute interpolation.

    Args:
      clip_vertices: [batch, V, 4] f32 clip-space positions.
      attributes: [batch, V, A] f32 per-vertex attributes.
      triangles: [T, 3] i32.
      spatial_sort: chunk-binning mode only — re-bin triangles in a
        batch-shared screen-space order when that culls tighter than the
        caller's order (_spatial_order_auto decides per call, under jit);
        same rendered values, only bit-exact z ties between coplanar
        triangles can resolve to the other triangle. The gathered mode
        bins at triangle granularity (exact per-triangle tile lists), so
        a sort cannot tighten it and the flag is ignored.
      binning: 'auto' (default — resolves to 'chunk' on the hard path,
        see _resolve_binning), 'gathered' (triangle-granularity per-tile
        segments; bit-identical results, reference later-id tie rule on
        ORIGINAL ids) or 'chunk' (chunk-granularity prepass).

    Returns:
      (ids [B, H, W] i32, barycentrics [B, H, W, 3] f32,
       attribute_images [B, H, W, A] f32). Uncovered pixels have zero
      barycentrics and zero attributes; alpha/background compositing
      (rasterize.py:144-151 semantics) composes on top in plain XLA.
      Gradients flow to clip_vertices (via the analytic barycentric chain,
      no vertex-z gradient) and to attributes. ids always index the
      CALLER's triangle array (the spatial sort is translated back; the
      translation is dead-code-eliminated when ids go unused).
    """
    binning = _resolve_binning(binning)
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    interp = _default_interpret(interpret)
    attrs_f = jnp.asarray(attributes, jnp.float32)
    tris = jnp.asarray(triangles, jnp.int32)
    row_off = jnp.asarray(row_offset, jnp.int32)

    slices = _triangle_slices(tris.shape[0], _max_pass_triangles(binning))
    with_z = len(slices) > 1  # only the multi-pass merge consumes z

    _resolve_precision(dot_precision)  # validate eagerly

    def one_pass(tri_slice):
        return _pallas_interp_core(
            clip_vertices, attrs_f, tri_slice, row_off, int(image_width),
            int(image_height), int(full_height), interp, with_z,
            dot_precision, binning)

    if len(slices) <= 1:  # includes the zero-triangle mesh (empty slices)
        if binning == "chunk" and spatial_sort and tris.shape[0] > 1:
            order = jax.lax.stop_gradient(_spatial_order_auto(
                clip_vertices, tris, _fused_chunk_for(tris.shape[0]),
                image_width, image_height, row_off,
                full_height))  # shared [T], identity when native bins tighter
            ids_p, bc, ai = one_pass(tris[order])
            # Translate winner ids back to the caller's triangle indexing;
            # background pixels (id 0 under the kernels' contract, bc 0)
            # must stay 0, not order[0].
            covered = jnp.sum(bc, axis=-1) > 0.5
            ids = jnp.where(covered, order[ids_p], 0)
            return ids, bc, ai
        return one_pass(tris)
    # Multi-pass: render <= MAX_PALLAS_TRIANGLES triangles per pass and
    # depth-merge; gradients flow through each pass's analytic custom_vjp
    # and the winner-select merge automatically.
    ids0, bc0, ai0, z0 = one_pass(tris[slices[0][0]:slices[0][0]
                                       + slices[0][1]])
    cov0 = jnp.sum(bc0, axis=-1) > 0.5
    best = (jnp.where(cov0, ids0, 0), bc0, z0, cov0)
    best_ai = ai0
    for start, size in slices[1:]:
        ids, bc, ai, z = one_pass(tris[start:start + size])
        best, best_ai = _merge_pass(best, ids, bc, z, start, extra=ai,
                                    best_extra=best_ai)
    gids, bc, z, cov = best
    return jnp.where(cov, gids, 0), bc, best_ai
