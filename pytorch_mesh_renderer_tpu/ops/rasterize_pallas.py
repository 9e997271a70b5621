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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .barycentric import (DEGENERATE_BARYCENTRIC_CUTOFF,
                          unnormalized_matrix_inverse)

# Tile dimensions (f32 min tile is 8x128). (16, 128) measured fastest for
# the fused kernels at 256^2 (297 vs 247 renders/s at (16, 256)) AND at the
# 512^2 10k-tri stress (58 vs 49): small tiles tighten the chunk bbox cull,
# which outweighs per-tile loop overhead.
TILE_H = 16
TILE_W = 128
# Triangles processed per inner step ([chunk, TILE_H, TILE_W] temporaries).
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

# In-kernel dot precision, a HardRasterizerConfig knob (`dot_precision`).
# These dots feed rendered images and analytic gradients, so precision was
# checked explicitly on TPU v5e:
#   * forward interpolation dots: DEFAULT (plain bf16 MXU) measures 4.2e-6
#     max abs fwd error vs the XLA spec — identical to HIGHEST (the
#     contractions select one winner row, so low-order mantissa bits of the
#     f32 decomposition don't accumulate);
#   * backward reduction dots ([C, P] x [P, 3] / [C, P] x [P, A]): DEFAULT
#     adds ~0.5% relative noise to the vertex/attribute gradients (measured
#     compiled-vs-XLA on v5e, 64x48 cube) — inside every reference gradient
#     gate (1% relative outlier budget) and immaterial to SGD.
# "highest" (bf16x6 passes) removes the noise but costs ~29% end-to-end
# (567 -> 401 renders/s at the 256^2 headline; Mosaic rejects HIGH, so
# there is no bf16x3 middle ground). DEFAULT is therefore the default;
# select dot_precision="highest" on the config for exact-parity debugging
# (pinned on TPU by tests/test_rasterize_pallas.py).
DOT_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _resolve_precision(name):
    try:
        return DOT_PRECISIONS[name]
    except KeyError:
        raise ValueError(
            f"dot_precision must be one of {sorted(DOT_PRECISIONS)}, got "
            f"{name!r} (Mosaic supports no other dot precisions).") from None

# Packed triangle-data columns (see _pack_triangle_data).
_COLS = 21


def _bbox_live_cols(x, y, vw):
    """Per-triangle cull columns [..., T, 5]: (live, min_x, max_x, min_y,
    max_y).

    live = 0 when all corner w < 0 (cull, cpp:338-341). Conservative NDC
    bbox: vertices with w <= eps make the triangle's screen extent
    unbounded -> full-screen bbox.
    """
    live = (~jnp.all(vw < 0.0, axis=-1)).astype(jnp.float32)
    eps = 1e-6
    safe_w = jnp.where(jnp.abs(vw) > eps, vw, eps)
    ndc_x = x / safe_w
    ndc_y = y / safe_w
    unbounded = jnp.any(vw <= eps, axis=-1)
    big = 4.0
    min_x = jnp.where(unbounded, -big, jnp.min(ndc_x, axis=-1))
    max_x = jnp.where(unbounded, big, jnp.max(ndc_x, axis=-1))
    min_y = jnp.where(unbounded, -big, jnp.min(ndc_y, axis=-1))
    max_y = jnp.where(unbounded, big, jnp.max(ndc_y, axis=-1))
    return jnp.stack([live, min_x, max_x, min_y, max_y], axis=-1)


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


def _tile_pixel_coords(ti, tj, row_off, image_width, full_height):
    """NDC coordinates of this tile's pixel centers (row 0 = NDC bottom,
    cpp:376-377). row_off shifts rows when the image is row-sharded."""
    rows = (jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + ti * TILE_H + row_off)
    cols = (jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + tj * TILE_W)
    py = (rows + 0.5) * (2.0 / full_height) - 1.0
    px = (cols + 0.5) * (2.0 / image_width) - 1.0
    return px, py


def _bin_chunks(tri_data, chunk, image_width, image_height, row_offset,
                full_height, live_col=15, top_down=False, tile_h=None,
                tile_w=None):
    """Per-tile candidate chunk lists (the SURVEY §5 binning prepass).

    The TPU-native replacement for the reference's quadtree
    (src/soft_mesh_renderer/quadtree.py:37-101) with static shapes: for
    every image tile, the indices of the triangle *chunks* whose combined
    live NDC bbox overlaps the tile, hits first in ascending order
    (stable argsort), plus the hit count. Kernels then fori_loop only over
    `count` candidates instead of streaming all T_pad/chunk chunks with a
    per-chunk cond — at the 512^2/10k-tri stress most tiles intersect only
    a few percent of chunks.

    `live_col` points at the liveness column, with the (min_x, max_x,
    min_y, max_y) bbox in the four columns after it (hard table: 15/16-19;
    soft table: 21/22-25). `top_down=True` flips the tile y bounds for the
    soft pixel grid (rows address NDC top-down). The soft Pallas module
    reuses this helper with those arguments.

    Returns:
      candidates [B, R, C, n_chunks] i32, counts [B, R, C, 1] i32 — with
      R = cdiv(H, TILE_H), C = cdiv(W, TILE_W).
    """
    hit = _bin_hits(tri_data[:, :, live_col:live_col + 5], chunk,
                    image_width, image_height, row_offset, full_height,
                    top_down=top_down, tile_h=tile_h, tile_w=tile_w)
    counts = jnp.sum(hit, axis=-1, dtype=jnp.int32)[..., None]
    candidates = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32)
    return candidates, counts


def _bin_hits(bbox5, chunk, image_width, image_height, row_offset,
              full_height, top_down=False, tile_h=None, tile_w=None):
    """Chunk-bbox x tile overlap matrix [B, R, C, n_chunks] (bool).

    bbox5 is [B, T_pad, 5] = (live, min_x, max_x, min_y, max_y) per
    triangle — the shared hit test behind `_bin_chunks` (which adds the
    candidate-compaction argsort) and the spatial-sort auto decision
    (which only needs the pair count).
    """
    tile_h = TILE_H if tile_h is None else tile_h
    tile_w = TILE_W if tile_w is None else tile_w
    batch, t_pad, _ = bbox5.shape
    n_chunks = t_pad // chunk
    n_rows = pl.cdiv(image_height, tile_h)
    n_cols = pl.cdiv(image_width, tile_w)
    per_tri = bbox5.reshape(batch, n_chunks, chunk, 5)
    live = per_tri[..., 0] > 0.0
    inf = jnp.float32(np.inf)
    cmin_x = jnp.min(jnp.where(live, per_tri[..., 1], inf), axis=2)
    cmax_x = jnp.max(jnp.where(live, per_tri[..., 2], -inf), axis=2)
    cmin_y = jnp.min(jnp.where(live, per_tri[..., 3], inf), axis=2)
    cmax_y = jnp.max(jnp.where(live, per_tri[..., 4], -inf), axis=2)

    row_off = jnp.asarray(row_offset, jnp.float32)
    ti = jnp.arange(n_rows, dtype=jnp.float32)
    tj = jnp.arange(n_cols, dtype=jnp.float32)
    if top_down:
        tmax_y = -(ti * tile_h + row_off) * (2.0 / full_height) + 1.0
        tmin_y = -((ti + 1) * tile_h + row_off) * (2.0 / full_height) + 1.0
    else:
        tmin_y = (ti * tile_h + row_off) * (2.0 / full_height) - 1.0
        tmax_y = ((ti + 1) * tile_h + row_off) * (2.0 / full_height) - 1.0
    tmin_x = tj * tile_w * (2.0 / image_width) - 1.0
    tmax_x = (tj + 1) * tile_w * (2.0 / image_width) - 1.0

    return ((cmin_x[:, None, None, :] <= tmax_x[None, None, :, None]) &
            (cmax_x[:, None, None, :] >= tmin_x[None, None, :, None]) &
            (cmin_y[:, None, None, :] <= tmax_y[None, :, None, None]) &
            (cmax_y[:, None, None, :] >= tmin_y[None, :, None, None]))


def _rasterize_chunk_core(data, px, py, chunk, chunk_start):
    """Shared per-chunk rasterization math (cpp:330-410 semantics).

    Args:
      data: [chunk, 21] packed triangle rows.
      px, py: [TILE_H, TILE_W] pixel-center NDC coordinates.
      chunk_start: triangle index of data row 0.

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

    tri_ids = (chunk_start
               + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0))
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


def _kernel(row_off_ref, count_ref, cand_ref, tri_ref, id_ref, b0_ref,
            b1_ref, b2_ref, z_ref, *, image_width, image_height,
            full_height, n_tri_padded):
    # Grid: (batch, tile_row, tile_col). Batch is a kernel-level grid axis —
    # the whole mesh batch renders in ONE pallas_call (no vmap).
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    px, py = _tile_pixel_coords(ti, tj, row_off_ref[0], image_width,
                                full_height)

    # Binned loop: only this tile's candidate chunks (prepass _bin_chunks).
    count = count_ref[0, 0, tj, 0]

    def chunk_body(i, carry):
        c = cand_ref[0, 0, tj, i]
        start = c * TRI_CHUNK
        data = tri_ref[0, pl.ds(start, TRI_CHUNK), :]  # [C, 21]
        best_z, best_id, best_we0, best_we1, best_we2 = carry
        chunk_z, chunk_id, w0, w1, w2 = _rasterize_chunk_core(
            data, px, py, TRI_CHUNK, start)
        better = _merge_better(chunk_z, chunk_id, best_z, best_id)
        best_z = jnp.where(better, chunk_z, best_z)
        best_id = jnp.where(better, chunk_id, best_id)
        best_we0 = jnp.where(better, jnp.sum(w0, axis=0), best_we0)
        best_we1 = jnp.where(better, jnp.sum(w1, axis=0), best_we1)
        best_we2 = jnp.where(better, jnp.sum(w2, axis=0), best_we2)
        return best_z, best_id, best_we0, best_we1, best_we2

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    init = (jnp.ones((TILE_H, TILE_W), jnp.float32),
            jnp.full((TILE_H, TILE_W), -1, jnp.int32),
            zeros, zeros, zeros)
    best_z, best_id, best_we0, best_we1, best_we2 = jax.lax.fori_loop(
        0, count, chunk_body, init)

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


def _triangle_slices(n_triangles):
    """[(start, size)] pass slices of at most MAX_PALLAS_TRIANGLES."""
    out = []
    start = 0
    while start < n_triangles:
        out.append((start, min(MAX_PALLAS_TRIANGLES, n_triangles - start)))
        start += MAX_PALLAS_TRIANGLES
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


def _bin_specs(n_cols, n_chunks):
    """(count, candidates) SMEM block specs shared by all tile kernels.

    One tile-ROW of lists per block (last two block dims must equal the
    array dims on TPU — per-tile (1,1,1,n) blocks fail Mosaic's layout
    check whenever the image spans more than one tile column); kernels
    index the tile's own list with program_id(2).
    """
    count_spec = pl.BlockSpec((1, 1, n_cols, 1), lambda b, i, j: (b, i, 0, 0),
                              memory_space=pltpu.SMEM)
    cand_spec = pl.BlockSpec((1, 1, n_cols, n_chunks),
                             lambda b, i, j: (b, i, 0, 0),
                             memory_space=pltpu.SMEM)
    return count_spec, cand_spec


def _forward_from_packed(tri_data, row_offset, image_width, image_height,
                         full_height, interpret):
    """Batched forward: tri_data [B, T_pad, 21] -> (ids, bc, z) per image."""
    batch, n_tri_padded, _ = tri_data.shape
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, n_tri_padded=n_tri_padded)

    out_shape = [
        jax.ShapeDtypeStruct((batch, image_height, image_width), jnp.int32),
    ] + [jax.ShapeDtypeStruct((batch, image_height, image_width),
                              jnp.float32)] * 4
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, n_tri_padded, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    candidates, counts = _bin_chunks(tri_data, TRI_CHUNK, image_width,
                                     image_height, row_offset, full_height)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)

    ids, b0, b1, b2, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row offset scalar
            count_spec,
            cand_spec,
            tri_spec,
        ],
        out_specs=[tile_spec] * 5,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, counts, candidates, tri_data)
    bc = jnp.stack([b0, b1, b2], axis=-1)
    # Background contract: id 0, bc 0, z 1 (kernels' shared contract).
    return ids, bc, jnp.where(z > 1.0, 1.0, z)


def _bwd_tile_inputs(ti, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref,
                     g2_ref, image_width, image_height):
    """Masked per-tile residuals/cotangents + winner-id chunk-cull range.

    Boundary tiles are padded with uninitialized memory; mask it out or
    garbage ids/cotangents would contribute to the sums. Returns the
    degenerate-pixel mask (cpp:162-164: id 0 with barycentric sum below the
    cutoff is background) and the [min, max] winner-id range used to skip
    chunks no pixel in this tile references.
    """
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    pix_ok = ((row_idx + ti * TILE_H < image_height) &
              (col_idx + tj * TILE_W < image_width))

    ids = jnp.where(pix_ok, id_ref[0], -1)
    b0 = jnp.where(pix_ok, b0_ref[0], 0.0)
    b1 = jnp.where(pix_ok, b1_ref[0], 0.0)
    b2 = jnp.where(pix_ok, b2_ref[0], 0.0)
    g0 = jnp.where(pix_ok, g0_ref[0], 0.0)
    g1 = jnp.where(pix_ok, g1_ref[0], 0.0)
    g2 = jnp.where(pix_ok, g2_ref[0], 0.0)

    active = ~((ids == 0) &
               (b0 + b1 + b2 < DEGENERATE_BARYCENTRIC_CUTOFF))
    masked_ids = jnp.where(active, ids, jnp.iinfo(jnp.int32).max)
    tile_id_min = jnp.min(jnp.min(masked_ids, axis=1), axis=0)
    tile_id_max = jnp.max(jnp.max(jnp.where(active, ids, -1), axis=1),
                          axis=0)
    return (pix_ok, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
            tile_id_max)


def _bwd_chunk_core(data, mask, g0t, g1t, g2t, gb, bmat, chunk, n_pix,
                    dcorner_ref, c, precision):
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
        sl = (0, pl.ds(c * chunk, chunk), pl.ds(cc * 3, 3))
        dcorner_ref[sl] = (dcorner_ref[sl]
                           + red[cc * chunk:(cc + 1) * chunk])


def _bwd_kernel(row_off_ref, count_ref, cand_ref, tri_ref, id_ref, b0_ref,
                b1_ref, b2_ref, g0_ref, g1_ref, g2_ref, dcorner_ref, *,
                image_width, image_height, full_height, n_tri_padded,
                precision):
    """Analytic backward as a per-tile reduction to a [T_pad, 9] table.

    The per-(triangle, corner, coord) sums accumulate per batch element
    (revisited across this batch element's consecutive tile steps); the
    host-side scatter into [V, 4] is then T-sized instead of
    (H * W * 3)-sized. The loop visits only the tile's binned candidate
    chunks, refined by the tile's winner-id range (chunks no pixel in the
    tile references are skipped even when their bbox overlaps).
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = TILE_H * TILE_W

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        dcorner_ref[:] = jnp.zeros_like(dcorner_ref)

    (_, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
     tile_id_max) = _bwd_tile_inputs(
         ti, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref, g2_ref,
         image_width, image_height)
    gb = g0 * b0 + g1 * b1 + g2 * b2
    bmat = jnp.concatenate([b0.reshape(1, n_pix), b1.reshape(1, n_pix),
                            b2.reshape(1, n_pix)], axis=0)  # [3, P]

    count = count_ref[0, 0, tj, 0]

    def chunk_body(i, _):
        c = cand_ref[0, 0, tj, i]
        hit = ((c * BWD_TRI_CHUNK <= tile_id_max) &
               ((c + 1) * BWD_TRI_CHUNK > tile_id_min))

        def process(_):
            data = tri_ref[0, pl.ds(c * BWD_TRI_CHUNK, BWD_TRI_CHUNK), :]
            tid = (c * BWD_TRI_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (BWD_TRI_CHUNK, 1, 1), 0))
            mask = ((ids[None] == tid) & active[None]).astype(jnp.float32)
            _bwd_chunk_core(data, mask, g0, g1, g2, gb, bmat,
                            BWD_TRI_CHUNK, n_pix, dcorner_ref, c, precision)
            return 0

        jax.lax.cond(hit, process, lambda _: 0, 0)
        return 0

    jax.lax.fori_loop(0, count, chunk_body, 0)


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


def _backward_pallas(tri_data, triangles, vertex_count, ids, bc, df_dbc,
                     row_offset, image_width, image_height, full_height,
                     interpret, dot_precision):
    """Batched backward: [B, ...] residuals -> df/d(clip vertices) [B, V, 4].
    """
    batch, n_tri_padded, _ = tri_data.shape
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _bwd_kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, n_tri_padded=n_tri_padded,
        precision=_resolve_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, n_tri_padded, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, n_tri_padded, 9),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    candidates, counts = _bin_chunks(tri_data, BWD_TRI_CHUNK, image_width,
                                     image_height, row_offset, full_height)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // BWD_TRI_CHUNK)
    dcorner = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            count_spec,
            cand_spec,
            tri_spec,
        ] + [tile_spec] * 7,
        out_specs=[acc_spec],
        out_shape=[jax.ShapeDtypeStruct((batch, n_tri_padded, 9),
                                        jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, counts, candidates, tri_data, ids, bc[..., 0], bc[..., 1],
      bc[..., 2], df_dbc[..., 0], df_dbc[..., 1], df_dbc[..., 2])[0]
    return _scatter_corner_grads(dcorner, triangles, batch, vertex_count)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pallas_core(clip_vertices, triangles, row_offset, image_width,
                 image_height, full_height, interpret, dot_precision):
    tri_data = _pack_batched(clip_vertices, triangles, TRI_CHUNK)
    return _forward_from_packed(tri_data, row_offset, image_width,
                                image_height, full_height, interpret)


def _fwd(clip_vertices, triangles, row_offset, image_width, image_height,
         full_height, interpret, dot_precision):
    tri_data = _pack_batched(clip_vertices, triangles, TRI_CHUNK)
    out = _forward_from_packed(tri_data, row_offset, image_width,
                               image_height, full_height, interpret)
    ids, bc, _ = out
    return out, (jax.lax.stop_gradient(tri_data), triangles,
                 clip_vertices.shape[1], ids, bc, row_offset)


def _bwd(image_width, image_height, full_height, interpret, dot_precision,
         residuals, cotangents):
    tri_data, triangles, vertex_count, ids, bc, row_offset = residuals
    _, df_dbc, _ = cotangents
    df_dvertices = _backward_pallas(
        tri_data, triangles, vertex_count, ids, bc, df_dbc, row_offset,
        image_width, image_height, full_height, interpret, dot_precision)
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
                                         dot_precision="default"):
    """Differentiable tiled-Pallas hard rasterization of a mesh batch.

    clip_vertices is [batch, V, 4]; returns (ids [B, H, W] i32,
    barycentrics [B, H, W, 3] f32, z [B, H, W] f32). The whole batch runs in
    one pallas_call with batch as the leading grid dimension (do NOT vmap
    over this function — batching is native). Meshes beyond
    MAX_PALLAS_TRIANGLES render in multiple depth-merged passes, so the
    triangle dimension scales to HBM capacity.
    """
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
                            int(full_height), interp, dot_precision)

    slices = _triangle_slices(tris.shape[0])
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
                                 dot_precision="default"):
    """Single-mesh wrapper over the batched Pallas rasterizer.

    Same contract as rasterize_xla.rasterize_barycentric_xla (ids /
    barycentrics / z-buffer; gradients through barycentrics only).
    `interpret` defaults to True off-TPU so tests exercise identical
    semantics on the CPU mesh.
    """
    ids, bc, z = rasterize_barycentric_pallas_batched(
        clip_vertices[None], triangles, image_width, image_height,
        row_offset=row_offset, full_height=full_height, interpret=interpret,
        dot_precision=dot_precision)
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


def _kernel_fused(row_off_ref, count_ref, cand_ref, tri_ref, attr_in_ref,
                  id_ref, b0_ref, b1_ref, b2_ref, *rest, image_width,
                  image_height, full_height, n_tri_padded, a_pad, chunk,
                  with_z, precision):
    if with_z:
        z_ref, attr_ref = rest
    else:
        (attr_ref,) = rest
    _kernel_fused_body(row_off_ref, count_ref, cand_ref, tri_ref,
                       attr_in_ref, id_ref, b0_ref, b1_ref, b2_ref,
                       z_ref if with_z else None, attr_ref,
                       image_width=image_width, image_height=image_height,
                       full_height=full_height, n_tri_padded=n_tri_padded,
                       a_pad=a_pad, chunk=chunk, precision=precision)


def _kernel_fused_body(row_off_ref, count_ref, cand_ref, tri_ref,
                       attr_in_ref, id_ref, b0_ref, b1_ref, b2_ref, z_ref,
                       attr_ref, *, image_width, image_height, full_height,
                       n_tri_padded, a_pad, chunk, precision):
    """Forward tile kernel with in-tile attribute interpolation.

    Same binned rasterization loop as _kernel plus a flat [a_pad, P]
    attribute carry: each chunk's winning triangles contribute
    sum_k (winner * b_k) @ corner_attrs_k via MXU matmuls, and the carry
    keeps the value from whichever chunk currently wins the z-test. The
    z-buffer lives only in the carry (no HBM output — the fused contract
    has no z consumer).
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = TILE_H * TILE_W
    px, py = _tile_pixel_coords(ti, tj, row_off_ref[0], image_width,
                                full_height)
    count = count_ref[0, 0, tj, 0]

    def chunk_body(i, carry):
        c = cand_ref[0, 0, tj, i]
        start = c * chunk
        data = tri_ref[0, pl.ds(start, chunk), :]  # [C, 21]
        best_z, best_id, best_we0, best_we1, best_we2, best_attr = carry
        chunk_z, chunk_id, w0, w1, w2 = _rasterize_chunk_core(
            data, px, py, chunk, start)

        ablk = attr_in_ref[0, pl.ds(start, chunk), :]
        # Three corner dots, not one grouped [A, 3C] x [3C, P] dot: Mosaic
        # cannot concatenate the lane-offset corner slices of ablk along
        # the sublane dim ("result/input offset mismatch on non-concat
        # dimension"), and the measured cost of the extra dot launches is
        # inside run-to-run noise.
        chunk_attr = jnp.zeros((a_pad, n_pix), jnp.float32)
        for k, wk in enumerate((w0, w1, w2)):
            ak = ablk[:, k * a_pad:(k + 1) * a_pad]  # [C, A]
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
        return (best_z, best_id, best_we0, best_we1, best_we2, best_attr)

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    init = (jnp.ones((TILE_H, TILE_W), jnp.float32),
            jnp.full((TILE_H, TILE_W), -1, jnp.int32),
            zeros, zeros, zeros,
            jnp.zeros((a_pad, n_pix), jnp.float32))
    (best_z, best_id, best_we0, best_we1, best_we2,
     best_attr) = jax.lax.fori_loop(0, count, chunk_body, init)

    # Deferred normalization: bc from the winner edges (bit-identical, see
    # _rasterize_chunk_core), attrs rescaled by the same reciprocal (the
    # interpolation matmuls consumed raw e-weights; rescaling after the dot
    # differs from before-the-dot only in bf16 rounding order, inside the
    # kernels' parity tolerances).
    b0, b1, b2, inv_sum = _normalize_winner_edges(best_we0, best_we1,
                                                  best_we2)
    id_ref[0] = jnp.maximum(best_id, 0)
    b0_ref[0] = b0
    b1_ref[0] = b1
    b2_ref[0] = b2
    if z_ref is not None:  # only the multi-pass merge consumes z
        z_ref[0] = jnp.where(best_z > 1.0, 1.0, best_z)
    attr_ref[0] = (best_attr * inv_sum.reshape(1, n_pix)).reshape(
        a_pad, TILE_H, TILE_W)


def _forward_fused(tri_data, attr_packed, row_offset, image_width,
                   image_height, full_height, interpret, chunk,
                   dot_precision, with_z=False):
    """Fused forward: -> (ids, bc, z-or-None, attrs [B, a_pad, H, W]).

    The z image is materialized to HBM only when `with_z` (the multi-pass
    depth merge is its sole consumer; single-pass callers skip the extra
    B*H*W*4-byte write).
    """
    batch, n_tri_padded, _ = tri_data.shape
    a3 = attr_packed.shape[-1]
    a_pad = a3 // 3
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _kernel_fused, image_width=image_width, image_height=image_height,
        full_height=full_height, n_tri_padded=n_tri_padded, a_pad=a_pad,
        chunk=chunk, with_z=with_z,
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
    tri_spec = pl.BlockSpec((1, n_tri_padded, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    attr_in_spec = pl.BlockSpec((1, n_tri_padded, a3),
                                lambda b, i, j: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    attr_out_spec = pl.BlockSpec((1, a_pad, TILE_H, TILE_W),
                                 lambda b, i, j: (b, 0, i, j),
                                 memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)
    candidates, counts = _bin_chunks(tri_data, chunk, image_width,
                                     image_height, row_offset, full_height)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // chunk)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            count_spec,
            cand_spec,
            tri_spec,
            attr_in_spec,
        ],
        out_specs=[tile_spec] * (1 + n_f32_images) + [attr_out_spec],
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, counts, candidates, tri_data, attr_packed)
    if with_z:
        ids, b0, b1, b2, z, attrs = outs
    else:
        ids, b0, b1, b2, attrs = outs
        z = None
    bc = jnp.stack([b0, b1, b2], axis=-1)
    return ids, bc, z, attrs


def _bwd_kernel_fused(row_off_ref, count_ref, cand_ref, tri_ref, attr_in_ref,
                      id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref, g2_ref,
                      gattr_ref, dcorner_ref, dattr_ref, *, image_width,
                      image_height, full_height, n_tri_padded, a_pad,
                      chunk, precision):
    """Fused backward: vertex-gradient table + attribute-gradient table.

    Extends _bwd_kernel's analytic chain with the interpolation VJP: the
    per-pixel barycentric cotangent picks up sum_a gattr[a] * attr_k[t, a]
    (computed per chunk as [C, A] @ [A, P] matmuls, selected by the winner
    mask), and the per-triangle attribute gradient accumulates
    (mask * b_k) @ gattr^T into a [T_pad, 3*a_pad] table.
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_pix = TILE_H * TILE_W

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        dcorner_ref[:] = jnp.zeros_like(dcorner_ref)
        dattr_ref[:] = jnp.zeros_like(dattr_ref)

    (pix_ok, ids, b0, b1, b2, g0, g1, g2, active, tile_id_min,
     tile_id_max) = _bwd_tile_inputs(
         ti, tj, id_ref, b0_ref, b1_ref, b2_ref, g0_ref, g1_ref, g2_ref,
         image_width, image_height)
    gattr = jnp.where(pix_ok[None], gattr_ref[0], 0.0)  # [A, TH, TW]
    gattrf = gattr.reshape(a_pad, n_pix)
    b0f = b0.reshape(1, n_pix)
    b1f = b1.reshape(1, n_pix)
    b2f = b2.reshape(1, n_pix)
    bmat = jnp.concatenate([b0f, b1f, b2f], axis=0)  # [3, P]

    count = count_ref[0, 0, tj, 0]

    def chunk_body(i, _):
        c = cand_ref[0, 0, tj, i]
        hit = ((c * chunk <= tile_id_max) & ((c + 1) * chunk > tile_id_min))

        def process(_):
            data = tri_ref[0, pl.ds(c * chunk, chunk), :]
            ablk = attr_in_ref[0, pl.ds(c * chunk, chunk), :]
            tid = (c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0))
            mask = ((ids[None] == tid) & active[None]).astype(jnp.float32)
            maskf = mask.reshape(chunk, n_pix)

            # Interpolation contribution to the barycentric cotangents:
            # dbc_k(p) = sum_a gattr(a, p) * attr_k[winner(p), a].
            # (Per-corner dots: Mosaic cannot concat the lane-offset
            # corner slices of ablk into one [3C, A] operand.)
            dbc = []
            for k in range(3):
                ak = ablk[:, k * a_pad:(k + 1) * a_pad]  # [C, A]
                proj = jax.lax.dot_general(
                    ak, gattrf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)  # [C, P]
                proj = proj.reshape(chunk, TILE_H, TILE_W)
                dbc.append(jnp.sum(mask * proj, axis=0))
            g0t = g0 + dbc[0]
            g1t = g1 + dbc[1]
            g2t = g2 + dbc[2]
            gb = g0t * b0 + g1t * b1 + g2t * b2
            _bwd_chunk_core(data, mask, g0t, g1t, g2t, gb, bmat, chunk,
                            n_pix, dcorner_ref, c, precision)

            # Attribute gradients: dattr_k[t, a] = sum_p mask*b_k * gattr —
            # one [3C, P] x [P, A] dot for all three corners.
            mb_all = jnp.concatenate(
                [maskf * bkf for bkf in (b0f, b1f, b2f)], axis=0)
            part_all = jax.lax.dot_general(
                mb_all, gattrf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [3C, A]
            for k in range(3):
                sl = (0, pl.ds(c * chunk, chunk), pl.ds(k * a_pad, a_pad))
                dattr_ref[sl] = (dattr_ref[sl]
                                 + part_all[k * chunk:(k + 1) * chunk])
            return 0

        jax.lax.cond(hit, process, lambda _: 0, 0)
        return 0

    jax.lax.fori_loop(0, count, chunk_body, 0)


def _backward_fused(tri_data, attr_packed, triangles, vertex_count,
                    attribute_count, ids, bc, df_dbc, df_dattr, row_offset,
                    image_width, image_height, full_height, interpret,
                    dot_precision):
    """-> (df/d clip_vertices [B, V, 4], df/d attributes [B, V, A])."""
    batch, n_tri_padded, _ = tri_data.shape
    a3 = attr_packed.shape[-1]
    a_pad = a3 // 3
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    chunk = _fused_chunk_for(np.shape(triangles)[-2])
    kernel = functools.partial(
        _bwd_kernel_fused, image_width=image_width,
        image_height=image_height, full_height=full_height,
        n_tri_padded=n_tri_padded, a_pad=a_pad, chunk=chunk,
        precision=_resolve_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, n_tri_padded, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    attr_in_spec = pl.BlockSpec((1, n_tri_padded, a3),
                                lambda b, i, j: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    gattr_spec = pl.BlockSpec((1, a_pad, TILE_H, TILE_W),
                              lambda b, i, j: (b, 0, i, j),
                              memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, n_tri_padded, 9),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    dattr_spec = pl.BlockSpec((1, n_tri_padded, a3),
                              lambda b, i, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    row_off = jnp.asarray(row_offset, jnp.float32).reshape(1)

    # Attribute cotangents: [B, H, W, A] -> padded [B, a_pad, H, W].
    gattr = jnp.moveaxis(df_dattr, -1, 1)
    gattr = jnp.pad(gattr,
                    [(0, 0), (0, a_pad - gattr.shape[1]), (0, 0), (0, 0)])
    candidates, counts = _bin_chunks(
        tri_data, chunk, image_width, image_height, row_offset, full_height)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // chunk)

    dcorner, dattr_tab = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            count_spec,
            cand_spec,
            tri_spec,
            attr_in_spec,
        ] + [tile_spec] * 7 + [gattr_spec],
        out_specs=[acc_spec, dattr_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, n_tri_padded, 9), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_tri_padded, a3), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(row_off, counts, candidates, tri_data, attr_packed, ids, bc[..., 0],
      bc[..., 1], bc[..., 2], df_dbc[..., 0], df_dbc[..., 1],
      df_dbc[..., 2], gattr)

    df_dvertices = _scatter_corner_grads(dcorner, triangles, batch,
                                         vertex_count)
    tris = jnp.asarray(triangles, jnp.int32)
    n_tri = tris.shape[-2]
    df_dattributes = jnp.zeros([batch, vertex_count, attribute_count],
                               jnp.float32)
    for k in range(3):
        attr_updates = dattr_tab[:, :n_tri,
                                 k * a_pad:k * a_pad + attribute_count]
        df_dattributes = df_dattributes.at[:, tris[:, k]].add(attr_updates)
    return df_dvertices, df_dattributes


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _pallas_interp_core(clip_vertices, attributes, triangles, row_offset,
                        image_width, image_height, full_height, interpret,
                        with_z, dot_precision):
    out, _ = _interp_fwd(clip_vertices, attributes, triangles, row_offset,
                         image_width, image_height, full_height, interpret,
                         with_z, dot_precision)
    return out


def _interp_fwd(clip_vertices, attributes, triangles, row_offset,
                image_width, image_height, full_height, interpret, with_z,
                dot_precision):
    chunk = _fused_chunk_for(np.shape(triangles)[-2])
    tri_data = _pack_batched(clip_vertices, triangles, chunk)
    a = attributes.shape[-1]
    a_pad = _pad_attr_count(a)
    attr_packed = _pack_corner_attributes(attributes, triangles, a_pad,
                                          tri_data.shape[1])
    ids, bc, z, attrs = _forward_fused(
        tri_data, attr_packed, row_offset, image_width, image_height,
        full_height, interpret, chunk, dot_precision, with_z=with_z)
    attr_images = jnp.moveaxis(attrs, 1, -1)[..., :a]  # [B, H, W, A]
    out = (ids, bc, attr_images) + ((z,) if with_z else ())
    residuals = (jax.lax.stop_gradient(tri_data),
                 jax.lax.stop_gradient(attr_packed), triangles,
                 clip_vertices.shape[1], a, ids, bc, row_offset)
    return out, residuals


def _interp_bwd(image_width, image_height, full_height, interpret, with_z,
                dot_precision, residuals, cotangents):
    (tri_data, attr_packed, triangles, vertex_count, attribute_count, ids,
     bc, row_offset) = residuals
    # Any z cotangent is discarded: the kernel produces no vertex-z gradient
    # (cpp:232-269 property) and z feeds only stop-gradient-style winner
    # selection in the multi-pass merge.
    _, df_dbc, df_dattr = cotangents[0], cotangents[1], cotangents[2]
    df_dvertices, df_dattributes = _backward_fused(
        tri_data, attr_packed, triangles, vertex_count, attribute_count,
        ids, bc, df_dbc, df_dattr, row_offset, image_width, image_height,
        full_height, interpret, dot_precision)
    tri_cot = np.zeros(np.shape(triangles), dtype=jax.dtypes.float0)
    row_cot = np.zeros((), dtype=jax.dtypes.float0)
    return df_dvertices, df_dattributes, tri_cot, row_cot


_pallas_interp_core.defvjp(_interp_fwd, _interp_bwd)


def rasterize_interpolate_pallas_batched(clip_vertices, attributes,
                                         triangles, image_width,
                                         image_height, row_offset=None,
                                         full_height=None, interpret=None,
                                         dot_precision="default",
                                         spatial_sort=True):
    """Fused differentiable rasterization + attribute interpolation.

    Args:
      clip_vertices: [batch, V, 4] f32 clip-space positions.
      attributes: [batch, V, A] f32 per-vertex attributes.
      triangles: [T, 3] i32.
      spatial_sort: re-bin triangles in a batch-shared screen-space order
        when that culls tighter than the caller's order
        (_spatial_order_auto decides per call, under jit) — same rendered
        values (hard rasterization is a pure selection; only bit-exact z
        ties between coplanar triangles can resolve to the other
        triangle). Applied to single-pass meshes only; disable via
        HardRasterizerConfig(spatial_sort=False) for strict later-id tie
        reproduction.

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
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    interp = _default_interpret(interpret)
    attrs_f = jnp.asarray(attributes, jnp.float32)
    tris = jnp.asarray(triangles, jnp.int32)
    row_off = jnp.asarray(row_offset, jnp.int32)

    slices = _triangle_slices(tris.shape[0])
    with_z = len(slices) > 1  # only the multi-pass merge consumes z

    _resolve_precision(dot_precision)  # validate eagerly

    def one_pass(tri_slice):
        return _pallas_interp_core(
            clip_vertices, attrs_f, tri_slice, row_off, int(image_width),
            int(image_height), int(full_height), interp, with_z,
            dot_precision)

    if len(slices) <= 1:  # includes the zero-triangle mesh (empty slices)
        if spatial_sort and tris.shape[0] > 1:
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
