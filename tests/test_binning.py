"""Direct unit tests for ops/binning.py — the plan invariants.

The kernel parity suites pin these transitively (any violated invariant
breaks bit-exactness somewhere); these tests pin them DIRECTLY on small
synthetic inputs so a planner regression fails with a planner-shaped
error, not a downstream image diff. Invariants covered:

  * exact keep/overflow partition (`_gather_plan` keep vs `_bin_hits`);
  * per-tile segments: chunk-aligned, id-ascending, dead-slot padded;
  * row-budget overflow drops WHOLE triangles (never half-places);
  * `_build_tables` neutralizes kept triangles' legacy rows (liveness
    AND id) and carries a dead sentinel for dropped gather slots;
  * `_segment_sum_gathered` folds the two-section cotangent table back
    to per-original-row sums exactly;
  * `_bin_chunks` candidate lists are the hitting chunks, ascending.

Reference analogue: the quadtree these plans replace is
/root/reference/src/soft_mesh_renderer/quadtree.py:37-101 (tested there
only through renders; here the spatial index is a first-class component).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops import binning

TILE_H = binning.DEFAULT_TILE_H
TILE_W = binning.DEFAULT_TILE_W


def _bbox5(rng, t, live_frac=0.9):
    """Random [1, T, 5] (live, min_x, max_x, min_y, max_y) columns."""
    lo = rng.uniform(-1.3, 1.1, size=(t, 2)).astype(np.float32)
    ext = rng.uniform(0.01, 0.6, size=(t, 2)).astype(np.float32)
    live = (rng.uniform(size=t) < live_frac).astype(np.float32)
    b5 = np.stack([live, lo[:, 0], lo[:, 0] + ext[:, 0],
                   lo[:, 1], lo[:, 1] + ext[:, 1]], axis=-1)
    return b5[None]


def _tile_hits_per_triangle(b5, width, height, top_down=False):
    """Boolean [T, R, C] per-triangle tile overlap via chunk=1 binning."""
    hit = np.asarray(binning._bin_hits(
        jnp.asarray(b5), 1, width, height, 0, height, top_down=top_down))
    return np.moveaxis(hit[0], -1, 0)  # [T, R, C]


def test_gather_plan_partition_and_segments():
    rng = np.random.default_rng(0)
    width, height = 4 * TILE_W, 5 * TILE_H
    chunk = 4
    t_pad = 32
    b5 = _bbox5(rng, t_pad)
    n_rows, n_cols = height // TILE_H, width // TILE_W
    budget = binning._gather_budget_rows(t_pad, n_rows * n_cols, chunk)
    g, keep, start_c, n_c = [np.asarray(x) for x in binning._gather_plan(
        jnp.asarray(b5), chunk, width, height, 0, height, budget)]
    hits = _tile_hits_per_triangle(b5, width, height)  # [T, R, C]
    spans = hits.reshape(t_pad, -1).sum(-1)

    # keep == live, on-screen, and within the tile cap
    want_keep = ((b5[0, :, 0] > 0) & (spans > 0) &
                 (spans <= binning.GATHER_TILE_CAP))
    np.testing.assert_array_equal(keep[0], want_keep)

    for r in range(n_rows):
        for c in range(n_cols):
            s = start_c[0, r, c, 0] * chunk
            n = n_c[0, r, c, 0] * chunk
            assert n % chunk == 0 and s % chunk == 0
            seg = g[0, s:s + n]
            ids = seg[seg < t_pad]
            assert np.all(np.diff(ids) > 0)  # ascending, no duplicates
            np.testing.assert_array_equal(
                ids, np.nonzero(hits[:, r, c] & keep[0])[0])
            # alignment padding is dead slots only
            assert np.all(seg[len(ids):] == t_pad)


def test_gather_plan_budget_overflow_drops_whole_triangles():
    """A triangle with ANY slot in an over-budget tile must go fully
    legacy (keep=False) — additive aggregation would otherwise drop its
    contribution on the overflowed tile but keep it elsewhere."""
    rng = np.random.default_rng(1)
    width, height = 4 * TILE_W, 5 * TILE_H
    chunk = 4
    t_pad = 32
    b5 = _bbox5(rng, t_pad)
    n_rows, n_cols = height // TILE_H, width // TILE_W
    for budget in (0, chunk, 3 * chunk):
        g, keep, start_c, n_c = [np.asarray(x) for x in binning._gather_plan(
            jnp.asarray(b5), chunk, width, height, 0, height, budget)]
        hits = _tile_hits_per_triangle(b5, width, height)
        tiles_flat = hits.reshape(t_pad, -1)
        # Segments stay within budget and consistent with keep
        for r in range(n_rows):
            for c in range(n_cols):
                s = start_c[0, r, c, 0] * chunk
                n = n_c[0, r, c, 0] * chunk
                assert s + n <= budget
                seg = g[0, s:s + n]
                ids = seg[seg < t_pad]
                np.testing.assert_array_equal(
                    ids, np.nonzero(hits[:, r, c] & keep[0])[0])
        # Every kept triangle is present on EVERY tile it overlaps — count
        # its gathered slots against its tile span (exact partition).
        slot_counts = np.bincount(g[0][g[0] < t_pad], minlength=t_pad)
        np.testing.assert_array_equal(
            slot_counts, np.where(keep[0], tiles_flat.sum(-1), 0))


def test_gather_plan_top_down_matches_flipped():
    """top_down=True is the same plan under a vertical flip of the bboxes
    (the soft pixel grid addresses NDC top-down)."""
    rng = np.random.default_rng(2)
    width, height = 2 * TILE_W, 3 * TILE_H
    chunk = 2
    b5 = _bbox5(rng, 16)
    flipped = b5.copy()
    flipped[..., 3], flipped[..., 4] = -b5[..., 4], -b5[..., 3]
    budget = binning._gather_budget_rows(16, 6, chunk)
    g_td, keep_td, _, _ = binning._gather_plan(
        jnp.asarray(b5), chunk, width, height, 0, height, budget,
        top_down=True)
    hits_td = _tile_hits_per_triangle(b5, width, height, top_down=True)
    hits_fl = _tile_hits_per_triangle(flipped, width, height)
    np.testing.assert_array_equal(hits_td, hits_fl)
    g_fl, keep_fl, _, _ = binning._gather_plan(
        jnp.asarray(flipped), chunk, width, height, 0, height, budget)
    np.testing.assert_array_equal(np.asarray(keep_td), np.asarray(keep_fl))
    np.testing.assert_array_equal(np.asarray(g_td), np.asarray(g_fl))


def test_build_tables_neutralizes_kept_legacy_rows():
    rng = np.random.default_rng(3)
    width, height = 2 * TILE_W, 2 * TILE_H
    chunk = 4
    t_pad = 12
    # Hard-layout table: 21 data cols, live col 15 with bbox 16-19.
    data = rng.normal(size=(1, t_pad, 21)).astype(np.float32)
    b5 = _bbox5(rng, t_pad)
    data[:, :, 15:20] = b5
    budget = binning._gather_budget_rows(t_pad, 4, chunk)
    plan = binning._gather_plan(jnp.asarray(b5), chunk, width, height, 0,
                                height, budget)
    table, base = binning._build_tables(jnp.asarray(data), None, plan,
                                        live_col=15, with_id=True)
    table, base = np.asarray(table), np.asarray(base)
    g, keep = np.asarray(plan[0]), np.asarray(plan[1])
    s_rows = g.shape[1]
    assert table.shape == (1, s_rows + t_pad, binning.ID_COL + 1)

    # base: untouched data + iota id column
    np.testing.assert_array_equal(base[..., :21], data)
    np.testing.assert_array_equal(base[0, :, binning.ID_COL],
                                  np.arange(t_pad, dtype=np.float32))
    # gathered section: dead slots are all-zero with id -1 (sentinel)
    dead = g[0] == t_pad
    assert np.all(table[0, :s_rows][dead, binning.ID_COL] == -1.0)
    assert np.all(table[0, :s_rows][dead, :21] == 0.0)
    # live gathered slots duplicate their source row exactly
    np.testing.assert_array_equal(table[0, :s_rows][~dead, :21],
                                  data[0, g[0][~dead]])
    # legacy section: kept rows dead (live 0) AND id-neutralized (-1);
    # fallback rows untouched with their original id
    legacy = table[0, s_rows:]
    assert np.all(legacy[keep[0], 15] == 0.0)
    assert np.all(legacy[keep[0], binning.ID_COL] == -1.0)
    np.testing.assert_array_equal(legacy[~keep[0], :21], data[0, ~keep[0]])
    np.testing.assert_array_equal(
        legacy[~keep[0], binning.ID_COL],
        np.arange(t_pad, dtype=np.float32)[~keep[0]])


def test_segment_sum_gathered_folds_exactly():
    rng = np.random.default_rng(4)
    t_pad, s_rows, w = 8, 12, 5
    gather_idx = rng.integers(0, t_pad + 1, size=(2, s_rows)).astype(np.int32)
    dtab = rng.normal(size=(2, s_rows + t_pad, w)).astype(np.float32)
    out = np.asarray(binning._segment_sum_gathered(
        jnp.asarray(dtab), s_rows, jnp.asarray(gather_idx)))
    want = dtab[:, s_rows:].copy()
    for b in range(2):
        for s in range(s_rows):
            if gather_idx[b, s] < t_pad:  # t_pad slots are dropped
                want[b, gather_idx[b, s]] += dtab[b, s]
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)
    # chunk mode (s_rows=0) is the identity
    np.testing.assert_array_equal(
        np.asarray(binning._segment_sum_gathered(
            jnp.asarray(dtab), 0, jnp.asarray(gather_idx))), dtab)


def test_bin_chunks_candidates_are_hitting_chunks():
    rng = np.random.default_rng(5)
    width, height = 3 * TILE_W, 4 * TILE_H
    chunk = 4
    t_pad = 24
    data = np.zeros((1, t_pad, 21), np.float32)
    b5 = _bbox5(rng, t_pad)
    data[:, :, 15:20] = b5
    cand, counts = [np.asarray(x) for x in binning._bin_chunks(
        jnp.asarray(data), chunk, width, height, 0, height)]
    # Exact expectation: the chunk's live-member union box vs the tile's
    # NDC interval (the same closed-interval test binning uses).
    live = b5[0, :, 0] > 0
    per = b5[0].reshape(-1, chunk, 5)
    lv = live.reshape(-1, chunk)
    inf = np.float32(np.inf)
    umin_x = np.where(lv, per[..., 1], inf).min(1)
    umax_x = np.where(lv, per[..., 2], -inf).max(1)
    umin_y = np.where(lv, per[..., 3], inf).min(1)
    umax_y = np.where(lv, per[..., 4], -inf).max(1)
    n_rows, n_cols = height // TILE_H, width // TILE_W
    for r in range(n_rows):
        tmin_y = r * TILE_H * (2.0 / height) - 1.0
        tmax_y = (r + 1) * TILE_H * (2.0 / height) - 1.0
        for c in range(n_cols):
            tmin_x = c * TILE_W * (2.0 / width) - 1.0
            tmax_x = (c + 1) * TILE_W * (2.0 / width) - 1.0
            want = np.nonzero((umin_x <= tmax_x) & (umax_x >= tmin_x) &
                              (umin_y <= tmax_y) & (umax_y >= tmin_y))[0]
            n = counts[0, r, c, 0]
            got = cand[0, r, c, :n]
            assert np.all(np.diff(got) > 0)  # ascending chunk ids
            np.testing.assert_array_equal(got, want)


def test_gather_budget_rows_is_sufficient_for_cap_spans():
    """The default budget admits every plan the cap allows: worst case is
    every triangle kept on GATHER_TILE_CAP tiles... which can exceed 2x
    t_pad, so the budget is NOT a correctness bound — overflow must fall
    back, never corrupt. Pin that property: with pathological bboxes
    (every triangle spanning many tiles) the plan still satisfies the
    partition invariant."""
    width, height = 4 * TILE_W, 2 * TILE_H
    chunk = 2
    t_pad = 16
    b5 = np.zeros((1, t_pad, 5), np.float32)
    b5[..., 0] = 1.0
    b5[..., 1], b5[..., 2] = -1.0, 1.0   # full-width
    b5[..., 3], b5[..., 4] = -1.0, 1.0   # full-height -> 8 tiles each
    budget = binning._gather_budget_rows(t_pad, 8, chunk)
    g, keep, start_c, n_c = [np.asarray(x) for x in binning._gather_plan(
        jnp.asarray(b5), chunk, width, height, 0, height, budget)]
    hits = _tile_hits_per_triangle(b5, width, height)
    assert hits.all()
    slot_counts = np.bincount(g[0][g[0] < t_pad], minlength=t_pad)
    np.testing.assert_array_equal(slot_counts, np.where(keep[0], 8, 0))


@pytest.mark.parametrize("chunk", [2, 4])
def test_winner_plan_direct(chunk):
    """Winner segments from a synthetic id image: per tile the unique
    active ids, ascending, chunk-aligned; budget overflow flags the tile
    for legacy fallback with an empty segment."""
    rng = np.random.default_rng(6)
    height, width = 2 * TILE_H, 2 * TILE_W
    ids = rng.integers(0, 9, size=(1, height, width)).astype(np.int32)
    bc = np.full((1, height, width, 3), 0.5, np.float32)
    # id 0 pixels with tiny bc sum are background (inactive)
    bg = ids == 0
    bc[bg] = 0.0
    for budget, expect_fit in ((64, True), (chunk, False)):
        g, start_c, n_c, fits = [np.asarray(x) for x in binning._winner_plan(
            jnp.asarray(ids), jnp.asarray(bc), chunk, budget)]
        for r in range(2):
            for c in range(2):
                t = ids[0, r*TILE_H:(r+1)*TILE_H, c*TILE_W:(c+1)*TILE_W]
                a = ~bg[0, r*TILE_H:(r+1)*TILE_H, c*TILE_W:(c+1)*TILE_W]
                want = np.unique(t[a])
                assert bool(fits[0, r, c, 0]) == expect_fit
                s = start_c[0, r, c, 0] * chunk
                n = n_c[0, r, c, 0] * chunk
                if expect_fit:
                    seg = g[0, s:s + n]
                    np.testing.assert_array_equal(seg[seg >= 0], want)
                    assert np.all(seg[len(want):] == -1)
                else:
                    assert n == 0
