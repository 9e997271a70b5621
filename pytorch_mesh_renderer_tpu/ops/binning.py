"""Spatial binning plans shared by the hard and soft Pallas kernels.

The TPU-native replacement for the reference's quadtree spatial index
(/root/reference/src/soft_mesh_renderer/quadtree.py:37-101): instead of a
pointer-chasing tree walked per pixel, static-shape XLA prepasses build
per-image-tile candidate lists that the Pallas tile kernels loop over with
dynamic fori_loop bounds. Three plan families:

  * chunk binning (`_bin_chunks` / `_bin_hits`) — coarse: for every image
    tile, the triangle *chunks* whose combined live NDC bbox overlaps the
    tile (chunk size == the kernels' inner-loop granularity);
  * gathered binning (`_gather_plan` + `_build_tables`) — exact: each
    triangle's packed row is duplicated into per-tile, chunk-aligned
    segments of a gathered table section, so kernels visit only true
    (triangle, tile) bbox overlaps. Triangles spanning more than `cap`
    tiles, or overflowing the static row budget, fall back to a
    liveness-masked legacy section walked with chunk binning — the two
    sections partition the mesh EXACTLY, which additive (soft)
    aggregation requires;
  * winner binning (`_winner_plan`) — backward-only: per-tile segments
    rebuilt from a forward id image, visiting only triangles that won at
    least one pixel.

Both kernel families (ops/rasterize_pallas.py, ops/soft_rasterize_pallas.py)
consume these plans; which plan runs is a pure performance policy
(`_resolve_binning` in each kernel module) because outputs are
bit-identical across modes. Plan invariants are unit-tested directly in
tests/test_binning.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .barycentric import DEGENERATE_BARYCENTRIC_CUTOFF

# Default image-tile dimensions. Both kernel families use (16, 128): f32
# min tile is (8, 128), and (16, 128) measured fastest on v5e for hard
# fused (vs (16, 256) and (8, 128)) AND soft (see the kernel modules'
# TILE_H/TILE_W comments). Plan functions take explicit tile_h/tile_w for
# sub-tile (SEG_H-strip) granularities; None selects these defaults.
DEFAULT_TILE_H = 16
DEFAULT_TILE_W = 128

# Gathered-table layout constants (hard kernels' combined table): original
# triangle id column and the 8-aligned lane offset where fused corner
# attributes start. `_build_tables` owns this layout; the hard kernel
# module re-exports them as _ID_COL/_ATTR_COL.
ID_COL = 21
ATTR_COL = 24

# Cap on tiles-per-triangle in the gathered plan; beyond it a triangle is
# legacy-handled. Measured (CPU pair counts, 2026-08-18): the bench teapot
# configs have ZERO overflow at cap 8; the 512^2 stress config overflows
# ~1.8 tris/mesh costing 4.3% of pairs, and raising the cap to 32 reclaims
# only 3.6% of pairs while 4x-ing the plan's per-triangle scatter
# enumeration ([T, cap]) — not worth it.
GATHER_TILE_CAP = 8


def _bbox_live_cols(x, y, vw):
    """Per-triangle cull columns [..., T, 5]: (live, min_x, max_x, min_y,
    max_y).

    live = 0 when all corner w < 0 (cull, rasterize_triangles.cpp:338-341).
    Conservative NDC bbox: vertices with w <= eps make the triangle's
    screen extent unbounded -> full-screen bbox.
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


def _tile_ndc_bounds(n_rows, n_cols, tile_h, tile_w, row_offset,
                     image_width, full_height, top_down):
    """Per-tile NDC interval bounds (tmin_y, tmax_y, tmin_x, tmax_x).

    The ONE definition of tile extents shared by `_bin_hits` and
    `_gather_plan`, so the chunk and gathered classifications of a
    (triangle, tile) pair can never diverge (an earlier pixel-space
    floor() formulation could disagree by an ulp at tile boundaries,
    dropping a boundary pixel's soft coverage; ADVICE r3). Closed-interval
    overlap against these bounds is exactly sufficient: every pixel CENTER
    of tile j lies strictly inside the tile's NDC box, so a bbox
    containing any coverable center overlaps it. `top_down=True` flips the
    y bounds for the soft pixel grid (rows address NDC top-down).
    """
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
    return tmin_y, tmax_y, tmin_x, tmax_x


def _gather_budget_rows(t_pad, n_tiles, chunk):
    """Static row budget of the gathered table section.

    2x the triangle count covers the measured mean overlap (~1.3-1.5
    tiles/triangle) with slack; + chunk per tile bounds the alignment
    padding. Scenes that exceed the budget stay correct — whole tiles drop
    to the legacy loop via the keep mask.
    """
    return 2 * t_pad + chunk * n_tiles


def _gather_plan(bbox5, chunk, image_width, image_height, row_offset,
                 full_height, budget_rows, cap=None,
                 top_down=False, tile_h=None, tile_w=None):
    """Triangle-granularity binning plan (batched).

    Args:
      bbox5: [B, T_pad, 5] (live, min_x, max_x, min_y, max_y) per triangle
        (same columns `_bin_hits` consumes).
      budget_rows: static row count S of the gathered table section.

    Returns:
      gather_idx [B, S] i32 — source triangle row per gathered-table slot
        (t_pad = dead slot; slots are grouped in per-tile, chunk-aligned,
        id-ascending segments);
      keep [B, T_pad] bool — True where the triangle is fully handled by
        the gathered segments (False = legacy-loop fallback: bbox spans
        > cap tiles, or a target tile overflowed the row budget);
      start_chunk / n_chunks [B, R, C, 1] i32 — each tile's segment as
        chunk indices into the gathered section.
    """
    tile_h = DEFAULT_TILE_H if tile_h is None else tile_h
    tile_w = DEFAULT_TILE_W if tile_w is None else tile_w
    cap = GATHER_TILE_CAP if cap is None else cap  # call-time (testable)
    batch, t_pad, _ = bbox5.shape
    n_rows = pl.cdiv(image_height, tile_h)
    n_cols = pl.cdiv(image_width, tile_w)
    n_tiles = n_rows * n_cols

    tmin_y, tmax_y, tmin_x, tmax_x = _tile_ndc_bounds(
        n_rows, n_cols, tile_h, tile_w, row_offset, image_width,
        full_height, top_down)

    def plan_one(b5):
        live = b5[:, 0] > 0.0
        # Per-triangle tile-overlap masks; hits form contiguous [first,
        # last] ranges along each axis (the tile boxes are a monotone
        # partition of NDC), which the scatter enumeration below exploits.
        col_hit = ((b5[:, 1:2] <= tmax_x[None]) &
                   (b5[:, 2:3] >= tmin_x[None]))        # [T, C]
        row_hit = ((b5[:, 3:4] <= tmax_y[None]) &
                   (b5[:, 4:5] >= tmin_y[None]))        # [T, R]
        wspan = jnp.sum(col_hit, axis=1).astype(jnp.int32)
        hspan = jnp.sum(row_hit, axis=1).astype(jnp.int32)
        ci0 = jnp.argmax(col_hit, axis=1).astype(jnp.int32)
        ri0 = jnp.argmax(row_hit, axis=1).astype(jnp.int32)
        nspan = wspan * hspan
        eligible = live & (nspan > 0) & (nspan <= cap)

        # Exact (triangle, tile) hit matrix -> per-tile counts and the rank
        # (segment position) of each triangle within each tile it hits.
        hit = (eligible[:, None, None] & row_hit[:, :, None] &
               col_hit[:, None, :]).reshape(t_pad, n_tiles)
        hit_i = hit.astype(jnp.int32)

        counts = jnp.sum(hit_i, axis=0)                        # [n_tiles]
        rank = jnp.cumsum(hit_i, axis=0) - hit_i               # exclusive
        pc = -(-counts // chunk) * chunk                       # chunk-padded
        ps = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pc)[:-1]])
        tile_fits = ps + pc <= budget_rows
        # A triangle touching any non-fitting tile must be handled entirely
        # by the legacy loop (its already-placed slots become dead gaps).
        drop = jnp.any(hit & ~tile_fits[None], axis=1)
        keep = eligible & ~drop

        # Row-major enumeration of each kept triangle's tile-span rect.
        # (wspan can be 0 for offscreen triangles; their slots are already
        # invalid below, but the div/mod operands must stay defined.)
        k = jnp.arange(cap, dtype=jnp.int32)
        wspan_safe = jnp.maximum(wspan, 1)
        r_k = ri0[:, None] + k[None] // wspan_safe[:, None]
        c_k = ci0[:, None] + k[None] % wspan_safe[:, None]
        tile_k = jnp.clip(r_k * n_cols + c_k, 0, n_tiles - 1)
        valid_k = keep[:, None] & (k[None] < nspan[:, None])
        rank_k = jnp.take_along_axis(rank, tile_k, axis=1)
        # Valid destinations are unique by construction (per-tile ranks are
        # distinct, per-tile slot ranges are disjoint); giving every
        # INVALID entry its own distinct out-of-bounds slot (dropped by
        # mode="drop") makes the whole index set unique, so
        # unique_indices=True lets XLA lower the scatter as a fully
        # parallel store instead of the duplicate-safe serializing path —
        # the difference between a ~5 ms and a sub-ms prepass at the 256^2
        # headline (BENCH.md round 4).
        oob = budget_rows + jnp.arange(
            t_pad * cap, dtype=jnp.int32).reshape(t_pad, cap)
        dst = jnp.where(valid_k, ps[tile_k] + rank_k, oob)
        src = jnp.broadcast_to(
            jnp.arange(t_pad, dtype=jnp.int32)[:, None], dst.shape)
        gather_idx = jnp.full((budget_rows,), t_pad, jnp.int32).at[
            dst.reshape(-1)].set(src.reshape(-1), mode="drop",
                                 unique_indices=True)

        start_chunk = jnp.where(tile_fits, ps, 0) // chunk
        n_chunks = jnp.where(tile_fits, pc, 0) // chunk
        return (gather_idx, keep,
                start_chunk.reshape(n_rows, n_cols, 1),
                n_chunks.reshape(n_rows, n_cols, 1))

    return jax.vmap(plan_one)(bbox5)


def _legacy_plan(batch, t_pad, chunk, n_rows, n_cols):
    """A trivial plan routing every triangle to the legacy loop.

    keep is None (no triangle is gathered) and the gathered section is
    EMPTY (S = 0): _build_tables returns the untouched base, and the
    kernels statically elide the whole gathered datapath (no A loop, no
    segment refs, positional triangle ids) — chunk mode compiles to the
    same program it had before gathered binning existed."""
    return (jnp.zeros((batch, 0), jnp.int32),
            None,
            jnp.zeros((batch, n_rows, n_cols, 1), jnp.int32),
            jnp.zeros((batch, n_rows, n_cols, 1), jnp.int32))


def _gathered_id_ranges(gather_idx, t_pad, chunk):
    """Per-gathered-chunk [min, max] original-id ranges (bwd winner cull).

    Dead slots contribute (INT32_MAX, -1) so fully-dead chunks never hit.
    Shaped [B, 1, S // chunk] for the SMEM block layout.
    """
    batch, s = gather_idx.shape
    g = gather_idx.reshape(batch, s // chunk, chunk)
    valid = g < t_pad
    idmin = jnp.min(jnp.where(valid, g, jnp.iinfo(jnp.int32).max), axis=-1)
    idmax = jnp.max(jnp.where(valid, g, -1), axis=-1)
    return idmin[:, None, :], idmax[:, None, :]


def _build_tables(tri_data, attr_packed, plan, live_col=15, with_id=True):
    """Assemble the two-section kernel table from a binning plan.

    Section A ([:S] with S = plan's budget): gathered per-tile segments
    (ONE take_along_axis carries data + id + attributes together). Section
    B ([S:]): the original rows with liveness masked to the plan's
    fallback triangles (~keep), walked by the legacy chunk-binned loop.

    with_id appends the original-triangle-id column at ID_COL (the hard
    kernels' winner identity); the soft kernels aggregate additively with
    no per-triangle identity, so they skip it.

    Returns (table [B, S + T_pad, W], base [B, T_pad, W]) with
    W = ID_COL + 1 (hard bare), ATTR_COL + attr width (hard fused), or
    the input width (soft). `base` is the pre-section table (full
    liveness, iota ids) — the hard backward's winner-segment prepass
    gathers rows from it by original id.
    """
    gather_idx, keep, _, _ = plan
    batch, t_pad, cols = tri_data.shape
    parts = [tri_data]
    if with_id:
        iota = jnp.arange(t_pad, dtype=jnp.float32)
        parts.append(jnp.broadcast_to(iota[None, :, None],
                                      (batch, t_pad, 1)))
    if attr_packed is not None:
        parts.append(jnp.zeros((batch, t_pad, ATTR_COL - cols - 1),
                               jnp.float32))
        parts.append(attr_packed)
    base = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    width = base.shape[-1]
    if keep is None:
        # Chunk mode (_legacy_plan): the gathered section is empty, so the
        # table IS the untouched base — no gather, no liveness/id masking,
        # no concat beyond the id/attr column assembly above.
        return base, base
    # Sentinel row (index t_pad): dead (live 0), id -1.
    sentinel = jnp.zeros((batch, 1, width), jnp.float32)
    if with_id:
        sentinel = sentinel.at[:, 0, ID_COL].set(-1.0)
    ext = jnp.concatenate([base, sentinel], axis=1)
    dup = jnp.take_along_axis(ext, gather_idx[..., None], axis=1)
    # Kept triangles' legacy rows are dead (live 0). Their id column must
    # ALSO be neutralized (-1): the forward never reads dead rows' ids
    # (valid requires live > 0), but the BWD_PLAN='forward' backward reuses
    # this table and its winner mask is a pure `ids == tid` match — a kept
    # triangle's id surviving in a legacy chunk that gets visited for a
    # neighboring overflow triangle would double-count its gradient
    # (caught by test_gathered_cap_and_budget_fallback at cap=1).
    legacy = base.at[..., live_col].multiply(
        1.0 - keep.astype(jnp.float32))
    if with_id:
        legacy = legacy.at[..., ID_COL].set(
            jnp.where(keep, -1.0, legacy[..., ID_COL]))
    return jnp.concatenate([dup, legacy], axis=1), base


def _winner_plan(ids, bc, chunk, budget_rows, tile_h=None, tile_w=None):
    """Per-tile WINNER segments for the hard backward (batched).

    The reference backward iterates covered pixels and accumulates into
    each pixel's winning triangle (rasterize_triangles.cpp:156-269); the
    TPU analogue of that "winners only" property is segment construction
    from the id image. The backward only touches triangles that won >= 1
    pixel in the tile (the winner masks zero every other row), so its
    segments can be built from the forward's id image: per tile, sort
    the active winner ids, compact first occurrences into a chunk-aligned
    id-ascending segment. Measured on the bench scenes this visits ~3x
    fewer chunks than the bbox-gathered segments (losers and occluded
    triangles drop out). Unlike the forward plan there is no per-triangle
    cap: every winner is in its tile's segment by construction, so tiles
    that fit need NO legacy loop at all; tiles beyond the row budget flip
    to the legacy chunk-binned loop instead (tile_fits mask).

    Returns (gather_idx [B, S] original-triangle ids per slot (-1 dead),
    start_chunk / n_chunks [B, R, C, 1], tile_fits [B, R, C, 1] bool).
    """
    tile_h = DEFAULT_TILE_H if tile_h is None else tile_h
    tile_w = DEFAULT_TILE_W if tile_w is None else tile_w
    batch, height, width = ids.shape
    n_rows = pl.cdiv(height, tile_h)
    n_cols = pl.cdiv(width, tile_w)
    n_tiles = n_rows * n_cols
    n_pix = tile_h * tile_w
    big = jnp.iinfo(jnp.int32).max

    active = ~((ids == 0) &
               (jnp.sum(bc, axis=-1) < DEGENERATE_BARYCENTRIC_CUTOFF))
    masked = jnp.where(active, ids, big)
    # [B, R, C, TH*TW] per-tile pixel lists; boundary tiles pad inactive.
    masked = jnp.pad(masked,
                     [(0, 0), (0, n_rows * tile_h - height),
                      (0, n_cols * tile_w - width)], constant_values=big)
    tiles = masked.reshape(batch, n_rows, tile_h, n_cols, tile_w)
    tiles = jnp.moveaxis(tiles, 2, 3).reshape(batch, n_tiles, n_pix)
    s = jnp.sort(tiles, axis=-1)
    first = (s != big) & jnp.concatenate(
        [jnp.ones((batch, n_tiles, 1), bool), s[..., 1:] != s[..., :-1]],
        axis=-1)
    first_i = first.astype(jnp.int32)
    counts = jnp.sum(first_i, axis=-1)                     # [B, n_tiles]
    rank = jnp.cumsum(first_i, axis=-1) - first_i
    pc = -(-counts // chunk) * chunk
    ps = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.int32), jnp.cumsum(pc, axis=-1)[:, :-1]],
        axis=-1)
    tile_fits = ps + pc <= budget_rows

    # Unique out-of-bounds slots for the dropped entries so the scatter
    # qualifies for unique_indices=True (see _gather_plan).
    oob = budget_rows + jnp.arange(
        n_tiles * n_pix, dtype=jnp.int32).reshape(n_tiles, n_pix)
    dst = jnp.where(first & tile_fits[..., None],
                    ps[..., None] + rank, oob[None])

    def scatter_one(d, v):
        return jnp.full((budget_rows,), -1, jnp.int32).at[
            d.reshape(-1)].set(v.reshape(-1), mode="drop",
                               unique_indices=True)

    gather_idx = jax.vmap(scatter_one)(dst, s)
    start_chunk = (jnp.where(tile_fits, ps, 0) // chunk).reshape(
        batch, n_rows, n_cols, 1)
    n_chunks = (jnp.where(tile_fits, pc, 0) // chunk).reshape(
        batch, n_rows, n_cols, 1)
    return (gather_idx, start_chunk, n_chunks,
            tile_fits.reshape(batch, n_rows, n_cols, 1))


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
    soft pixel grid (rows address NDC top-down).

    Returns:
      candidates [B, R, C, n_chunks] i32, counts [B, R, C, 1] i32 — with
      R = cdiv(H, tile_h), C = cdiv(W, tile_w).
    """
    hit = _bin_hits(tri_data[:, :, live_col:live_col + 5], chunk,
                    image_width, image_height, row_offset, full_height,
                    top_down=top_down, tile_h=tile_h, tile_w=tile_w)
    counts = jnp.sum(hit, axis=-1, dtype=jnp.int32)[..., None]
    # Candidate compaction stays an argsort: the "obvious" cheaper
    # cumsum-position + parallel scatter compaction measured 70.8 ms vs
    # the argsort's 12.4 ms on the 512^2 stress hit matrix ([8192, 1296],
    # v5e, scripts/prepass_microbench.py, 2026-08-19) — XLA lowers the
    # row-batched scatter far worse than its bitonic sort here.
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
    tile_h = DEFAULT_TILE_H if tile_h is None else tile_h
    tile_w = DEFAULT_TILE_W if tile_w is None else tile_w
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

    tmin_y, tmax_y, tmin_x, tmax_x = _tile_ndc_bounds(
        n_rows, n_cols, tile_h, tile_w, row_offset, image_width,
        full_height, top_down)

    return ((cmin_x[:, None, None, :] <= tmax_x[None, None, :, None]) &
            (cmax_x[:, None, None, :] >= tmin_x[None, None, :, None]) &
            (cmin_y[:, None, None, :] <= tmax_y[None, :, None, None]) &
            (cmax_y[:, None, None, :] >= tmin_y[None, :, None, None]))


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


def _segment_sum_gathered(dtab, s_rows, gather_idx):
    """Fold a two-section row-gradient table back onto original rows.

    dtab [B, S + T_pad, W]: gathered-section rows are summed per source
    triangle (dead slots carry exact zeros and route to the dropped
    t_pad segment) and added to the legacy section's direct rows.
    Chunk mode (S = 0) is the identity — no fold, no copy.
    """
    if s_rows == 0:
        return dtab
    t_pad = dtab.shape[1] - s_rows
    d_a, d_b = dtab[:, :s_rows], dtab[:, s_rows:]
    seg = jax.vmap(
        lambda d, g: jax.ops.segment_sum(d, g, num_segments=t_pad + 1)
    )(d_a, gather_idx)[:, :t_pad]
    return seg + d_b
