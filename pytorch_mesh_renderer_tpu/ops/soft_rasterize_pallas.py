"""Soft (SoftRas) rasterizer — tiled Pallas TPU forward AND backward kernels.

TPU-native equivalent of the original SoftRas CUDA forward/backward pair
(the reference keeps an unoptimized Python stand-in,
/root/reference/src/soft_mesh_renderer/README.md:7, per-pixel loop at
src/soft_mesh_renderer/rasterize.py:309-418, backward via torch autograd).
Same layout as the hard Pallas kernel (rasterize_pallas.py): image tiles on
the grid, per-tile accumulators in VMEM, and **per-tile binning** replacing
the quadtree (SURVEY.md §5): an XLA prepass (_bin_chunks) intersects
chunk-level unions of the blur-inflated bboxes with every tile and emits
fixed-shape candidate lists + counts; each tile loops only over its own
candidates (dynamic fori_loop bound from an SMEM-resident list).

Forward fuses the whole SoftRas chain per (pixel, triangle): screen
barycentrics, nearest-edge fallback (rasterize.py:144-176),
perspective-corrected L1-normalized sample barycentrics, depth remap, Phong
diffuse shading (rasterize.py:183-208), sigmoid-distance coverage and
softmax-depth aggregation with the EPS=1e-10 background floor
(rasterize.py:388-414), silhouette product. It additionally emits the
per-pixel softmax state (running max, weight sum) as residuals.

Backward is a hand-derived recompute kernel (the TPU analogue of SoftRas'
soft_rasterize_cuda backward): it re-evaluates the forward quantities per
(pixel, triangle) chunk and accumulates analytic gradients w.r.t. the
packed per-triangle table (barycentric matrix rows, NDC vertices, clip w,
depths, world/normal/color attributes) plus light positions/intensities;
per-pixel reductions stay in VMEM and the [T, 59] gradient table is the
only HBM traffic. Gradients to clip-space vertices/attributes then follow
by transposing the (cheap, [T]-sized) packing function with jax.vjp.

Derivative notes (checked against jax AD of the XLA spec in
tests/test_soft_pallas.py):
  * the softmax max `m` cancels analytically (multiplying numerator and
    denominator by e^m), so it is treated as a constant;
  * the silhouette term folds as dA * sil * cov * sgn/sigma — the
    (1 - cov) factors cancel, which also removes the 0/0 at cov == 1;
  * the nearest-point distance uses the envelope theorem: at the interior
    optimum d(d^2)/dt = 0, so d(d^2)/d(endpoint) = 2 r (1-t | t) exactly;
  * the clip gates (ndl in (0,1), t in (0,1)) zero the respective paths.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import resolve_dot_precision
from . import binning as binning_lib
from . import soft_rasterize as soft_xla
from .binning import _bin_specs  # noqa: F401  (shared SMEM layout specs)

TILE_H = 16
TILE_W = 128
# (16, 128) tiles. Chunk size doubles as the binning granularity
# (candidate lists are chunk-aligned). Measured on the 128^2 teapot
# fwd+bwd on v5e (r3, after the one-dot deferred-reduction backward):
# chunk 8 beats 16 (11.2 vs 11.9 ms/step — tighter chunk-bbox unions cut
# binned pairs faster than the per-chunk flush overhead grows) and
# (8, 128) tiles measured neutral-to-worse (11.2 ms with a slower
# forward). Mean valid-lane occupancy per (tile, chunk) pair is ~0.2%
# at this config — the dense tile x chunk structure, not VPU throughput,
# is the soft kernel's efficiency ceiling (see BENCH.md).
TRI_CHUNK = 8
# Gathered-segment strip height: triangles bin to SEG_H-row strips of each
# (TILE_H, TILE_W) tile, and the kernels process [TRI_CHUNK, SEG_H, TILE_W]
# lane blocks per visit instead of full-tile blocks. The CPU occupancy
# model favored SEG_H=8 (~17% more chunk visits for ~41%/36% less raw
# lane-work at the 128^2/256^2 teapot), but measured on v5e it LOSES
# (BENCH.md round 4: soft 128^2 309 vs 365 renders/s under gathered) —
# doubled loop trips and halved block area outweigh the culled lanes.
# Default 16 = full-tile blocks; MESH_RENDERER_SOFT_SEG_H=8 (the f32
# sublane quantum) recovers the fine decomposition for A/B sweeps.
SEG_H = int(os.environ.get("MESH_RENDERER_SOFT_SEG_H", "16"))
if TILE_H % SEG_H:
    raise ValueError(f"SEG_H={SEG_H} must divide TILE_H={TILE_H}")
N_SEG = TILE_H // SEG_H
_COLS = 59
EPS = soft_xla.EPS
_NEG_BIG = -1e30

# Narrow tables ([T, 59] input, gradient blocks) lane-pad to 128 in VMEM; at
# 10k+ triangles that exceeds the conservative default scoped limit, but
# v5e has far more physical VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# Per-pass cap on the triangle count for the compiled soft kernels — the
# [T, 59] table and its [T, 59] gradient accumulator are VMEM-resident per
# batch element (lane-padded to 128: ~512 B/tri each). Meshes beyond the cap
# render in MULTIPLE PASSES whose raw (rgba, m, sumw) outputs are merged
# with the exact online-softmax state merge (see
# soft_rasterize_pallas_batched), so the triangle dimension scales to HBM
# capacity instead of VMEM — same scheme as the hard module.
MAX_PALLAS_TRIANGLES = 49152
# Gathered binning roughly triples the VMEM-resident rows (see the hard
# module); its per-pass cap is lower and the exact online-softmax merge
# covers larger meshes. Env-tunable for hardware sweeps (see the hard
# module's MAX_GATHERED_TRIANGLES).
MAX_GATHERED_TRIANGLES = int(
    os.environ.get("MESH_RENDERER_MAX_GATHERED", "12288"))


def _max_pass_triangles(binning):
    return (MAX_GATHERED_TRIANGLES if binning == "gathered"
            else MAX_PALLAS_TRIANGLES)


def _resolve_binning(binning, tri_count, silhouette=False):
    """Resolve the 'auto' binning mode for the SOFT kernels.

    Per-path defaults from the round-4 v5e A/B (BENCH.md): the full soft
    render is the one path where gathered binning wins (+4.6% at 128^2,
    +12% at 256^2 — its additive bbox segments need no winner prepass and
    the high per-pair soft cost makes the ~2x visit cut pay for the plan),
    but only while the mesh fits ONE gathered pass: the lower gathered cap
    (12,288 vs 49,152 tris/pass) makes multi-pass meshes +32% slower, so
    those route to chunk. The silhouette kernels' per-pair cost is ~half
    the full render's, which flips the tradeoff (−18% under gathered) —
    they always resolve to chunk.
    """
    if binning != "auto":
        return binning
    if silhouette or tri_count > MAX_GATHERED_TRIANGLES:
        return "chunk"
    return "gathered"


def _pack_triangle_data(clip_space_vertices, triangles, world_space_vertices,
                        normals, diffuse_colors, blur_radius):
    """Per-triangle data table [T_pad, 59].

    Columns: 0-8 normalized 2D-inverse rows (screen barycentric coeffs),
    9-14 NDC corner xy (x0,y0,x1,y1,x2,y2), 15-17 NDC corner z, 18-20 clip
    w, 21 keep (back-face/degenerate cull, rasterize.py:331-336), 22-25
    blur-inflated NDC bbox, 26-34 world corner xyz, 35-43 corner normals,
    44-52 corner diffuse rgb, 53-55 reciprocal clip w (guarded), 56-58
    reciprocal squared edge lengths (edges 01, 12, 20).

    The reciprocal columns cache per-triangle divides the kernels would
    otherwise redo per (triangle, pixel): 53-55 carry real cotangents
    (the kernels differentiate w only through 1/w — the pack VJP supplies
    the -1/w^2 chain); 56-58 are pure forward caches whose endpoint chain
    is already folded into the kernels' analytic edge gradients, so their
    cotangent stays zero (double-counting guard).
    """
    tris = jnp.asarray(triangles, jnp.int32)
    tv = clip_space_vertices[tris]  # [T, 3, 4]
    w = tv[..., 3]
    safe_w = jnp.where(w != 0.0, w, 1.0)
    ndc = tv[..., :3] / safe_w[..., None]
    vx, vy, vz = ndc[..., 0], ndc[..., 1], ndc[..., 2]

    area = ((vx[:, 0] - vx[:, 1]) * (vy[:, 2] - vy[:, 1]) -
            (vy[:, 0] - vy[:, 1]) * (vx[:, 2] - vx[:, 1]))
    det = (vx[:, 0] * (vy[:, 1] - vy[:, 2]) -
           vx[:, 1] * (vy[:, 0] - vy[:, 2]) +
           vx[:, 2] * (vy[:, 0] - vy[:, 1]))
    keep = ((area < 0.0) & (det != 0.0)).astype(jnp.float32)

    safe_det = jnp.where(det != 0.0, det, 1.0)
    inv_det = jnp.where(det != 0.0, 1.0 / safe_det, 0.0)
    adj = jnp.stack([
        jnp.stack([vy[:, 1] - vy[:, 2], vx[:, 2] - vx[:, 1],
                   vx[:, 1] * vy[:, 2] - vx[:, 2] * vy[:, 1]], axis=-1),
        jnp.stack([vy[:, 2] - vy[:, 0], vx[:, 0] - vx[:, 2],
                   vx[:, 2] * vy[:, 0] - vx[:, 0] * vy[:, 2]], axis=-1),
        jnp.stack([vy[:, 0] - vy[:, 1], vx[:, 1] - vx[:, 0],
                   vx[:, 0] * vy[:, 1] - vx[:, 1] * vy[:, 0]], axis=-1),
    ], axis=-2)
    m2_inv = adj * inv_det[:, None, None]

    bbox = jnp.stack([
        jnp.min(vx, axis=1) - blur_radius, jnp.max(vx, axis=1) + blur_radius,
        jnp.min(vy, axis=1) - blur_radius, jnp.max(vy, axis=1) + blur_radius,
    ], axis=-1)

    vxy = jnp.stack([vx[:, 0], vy[:, 0], vx[:, 1], vy[:, 1], vx[:, 2],
                     vy[:, 2]], axis=-1)

    inv_w = 1.0 / jnp.where(w != 0.0, w, 1.0)
    edge_len2 = jnp.stack([
        (vx[:, 1] - vx[:, 0]) ** 2 + (vy[:, 1] - vy[:, 0]) ** 2,
        (vx[:, 2] - vx[:, 1]) ** 2 + (vy[:, 2] - vy[:, 1]) ** 2,
        (vx[:, 0] - vx[:, 2]) ** 2 + (vy[:, 0] - vy[:, 2]) ** 2,
    ], axis=-1)
    inv_len2 = 1.0 / jnp.maximum(edge_len2, 1e-24)

    data = jnp.concatenate([
        m2_inv.reshape(-1, 9),                      # 0-8
        vxy,                                        # 9-14
        vz,                                         # 15-17
        w,                                          # 18-20
        keep[:, None],                              # 21
        bbox,                                       # 22-25
        world_space_vertices[tris].reshape(-1, 9),  # 26-34
        normals[tris].reshape(-1, 9),               # 35-43
        diffuse_colors[tris].reshape(-1, 9),        # 44-52
        inv_w,                                      # 53-55
        inv_len2,                                   # 56-58
    ], axis=-1)

    t = data.shape[0]
    # Zero-triangle meshes still pad to one full (all-dead) chunk so the
    # kernels always see a non-empty table; every padded row has keep=0.
    pad = TRI_CHUNK if t == 0 else (-t) % TRI_CHUNK
    if pad:
        data = jnp.pad(data, [(0, pad), (0, 0)])
    return data


def _segment_sq_dist(pxv, pyv, ax, ay, bx, by, inv_len2):
    """Squared distance from tile pixels to segment [a, b], plus offset t.

    Vector form of point_to_segment_nearest (rasterize.py:159-176).
    inv_len2 is the packed per-triangle 1/max(|b-a|^2, 1e-24) cache
    (table cols 56-58) — max(sqrt(l2), 1e-12)^2 == max(l2, 1e-24) exactly
    (sqrt is monotone), so this matches the spec's guarded length while
    saving a sqrt AND a divide per (edge, pixel).
    """
    abx = bx - ax
    aby = by - ay
    t = ((pxv - ax) * abx + (pyv - ay) * aby) * inv_len2
    t = jnp.clip(t, 0.0, 1.0)
    nx = ax + t * abx - pxv
    ny = ay + t * aby - pyv
    return nx * nx + ny * ny, t


def _strip_coords(ti, h, tj, row_off, image_width, full_height):
    """NDC pixel-center coords of strip h (of N_SEG) in tile (ti, tj):
    [SEG_H, TILE_W] arrays covering rows ti*TILE_H + h*SEG_H + [0, SEG_H)."""
    rows = (jax.lax.broadcasted_iota(
        jnp.int32, (SEG_H, TILE_W), 0).astype(jnp.float32)
        + ti * TILE_H + h * SEG_H + row_off)
    cols = (jax.lax.broadcasted_iota(
        jnp.int32, (SEG_H, TILE_W), 1).astype(jnp.float32)
        + tj * TILE_W)
    py = -2.0 * (rows + 0.5) / full_height + 1.0
    px = 2.0 * (cols + 0.5) / image_width - 1.0
    return px, py


def _bin_chunks(tri_data, image_width, image_height, row_offset,
                full_height):
    """Per-tile candidate chunk lists (per-tile binning, SURVEY.md §5).

    Delegates to binning_lib._bin_chunks with this table's layout:
    keep gate at col 21 with the blur-inflated bbox in cols 22-25, a
    top-down pixel grid, and THIS module's tile dimensions.
    """
    return binning_lib._bin_chunks(
        tri_data, TRI_CHUNK, image_width, image_height, row_offset,
        full_height, live_col=21, top_down=True, tile_h=TILE_H,
        tile_w=TILE_W)


def _seg_specs(n_cols):
    """SMEM block spec for the per-strip gathered segment lists.

    Arrays are [B, N_SEG * R, C, 1] (strip-major rows); one block carries a
    TILE's N_SEG consecutive strip rows so kernels read
    `ref[0, h, tj, 0]`. The last two block dims equal the array dims
    (Mosaic's SMEM layout rule; see binning._bin_specs)."""
    return pl.BlockSpec((1, N_SEG, n_cols, 1), lambda b, i, j: (b, i, 0, 0),
                        memory_space=pltpu.SMEM)


def _prepare_tables(tri_data, binning, image_width, image_height,
                    row_offset, full_height):
    """Soft-table variant of the hard module's _prepare_tables.

    Same two-section scheme (gathered per-tile segments + overflow-masked
    legacy section) over THIS table's layout: keep gate at col 21,
    blur-inflated bbox at 22-25, top-down pixel grid, no id column — soft
    aggregation is additive, so correctness needs only the exact
    keep/overflow partition, not per-row identity.
    """
    if binning not in ("gathered", "chunk"):
        raise ValueError(
            f"binning must be 'gathered' or 'chunk', got {binning!r}")
    batch, t_pad, _ = tri_data.shape
    n_rows = pl.cdiv(image_height, TILE_H)
    n_cols = pl.cdiv(image_width, TILE_W)
    if binning == "gathered":
        # Segments bin at SEG_H-strip granularity: N_SEG strip rows per
        # kernel tile row. The plan's height is padded to whole tiles so
        # strip row h of tile i is always row N_SEG*i + h (a partially
        # covered bottom tile still owns N_SEG strip entries; strips past
        # the image bottom can only add dead visits, never lose real ones —
        # the hit test is an exact superset per strip).
        n_strips = n_rows * N_SEG
        budget = binning_lib._gather_budget_rows(t_pad, n_strips * n_cols,
                                                 TRI_CHUNK)
        # A triangle's vertical strip span is N_SEG x its tile span, so the
        # overflow cap scales with it (same triangles overflow to the
        # legacy loop as at full-tile granularity, to first order).
        plan = binning_lib._gather_plan(
            tri_data[:, :, 21:26], TRI_CHUNK, image_width,
            n_rows * TILE_H, row_offset, full_height, budget,
            cap=binning_lib.GATHER_TILE_CAP * N_SEG,
            top_down=True, tile_h=SEG_H, tile_w=TILE_W)
    else:
        plan = binning_lib._legacy_plan(batch, t_pad, TRI_CHUNK,
                                        n_rows * N_SEG, n_cols)
    table, _ = binning_lib._build_tables(tri_data, None, plan, live_col=21,
                                         with_id=False)
    s_rows = plan[0].shape[1]
    candidates, counts = _bin_chunks(table[:, s_rows:], image_width,
                                     image_height, row_offset, full_height)
    return table, s_rows, plan, candidates, counts


def _chunk_forward(data, px, py, light, sigma, gamma, sq_blur,
                   n_lights, shade=True):
    """Recomputes all per-(pixel, chunk-triangle) forward quantities.

    Shared by the forward and backward kernels so they agree bit-for-bit.
    Returns a dict of [C, TH, TW] arrays (plus per-light lists).

    shade=False (the silhouette-only kernels) stops after coverage: the
    attribute interpolation, normal/lighting, shading, and softmax-depth
    logit are skipped entirely — alpha = 1 - prod(1 - coverage) depends on
    none of them (depth enters only through the non-differentiable z_ok
    validity gate, which IS still computed).
    """
    def col(k):
        return data[:, k].reshape(TRI_CHUNK, 1, 1)

    q = {}
    bc0 = col(0) * px + col(1) * py + col(2)
    bc1 = col(3) * px + col(4) * py + col(5)
    bc2 = col(6) * px + col(7) * py + col(8)
    inside = (bc0 >= 0.0) & (bc1 >= 0.0) & (bc2 >= 0.0)

    x0, y0 = col(9), col(10)
    x1, y1 = col(11), col(12)
    x2, y2 = col(13), col(14)
    d01, t01 = _segment_sq_dist(px, py, x0, y0, x1, y1, col(56))
    d12, t12 = _segment_sq_dist(px, py, x1, y1, x2, y2, col(57))
    d20, t20 = _segment_sq_dist(px, py, x2, y2, x0, y0, col(58))
    sq_dist = jnp.minimum(d01, jnp.minimum(d12, d20))
    pick01 = (d01 <= d12) & (d01 <= d20)
    pick12 = (~pick01) & (d12 <= d20)
    pick20 = (~pick01) & (~pick12)
    eb0 = jnp.where(pick01, 1.0 - t01, jnp.where(pick12, 0.0, t20))
    eb1 = jnp.where(pick01, t01, jnp.where(pick12, 1.0 - t12, 0.0))
    eb2 = jnp.where(pick01, 0.0, jnp.where(pick12, t12, 1.0 - t20))

    cb0 = jnp.where(inside, bc0, eb0)
    cb1 = jnp.where(inside, bc1, eb1)
    cb2 = jnp.where(inside, bc2, eb2)

    iw0, iw1, iw2 = col(53), col(54), col(55)
    ow0 = cb0 * iw0
    ow1 = cb1 * iw1
    ow2 = cb2 * iw2
    denom = jnp.abs(ow0) + jnp.abs(ow1) + jnp.abs(ow2)
    inv_denom = 1.0 / jnp.maximum(denom, 1e-12)
    sb0 = ow0 * inv_denom
    sb1 = ow1 * inv_denom
    sb2 = ow2 * inv_denom

    z_ndc = sb0 * col(15) + sb1 * col(16) + sb2 * col(17)
    z = 0.5 - z_ndc * 0.5
    z_ok = (z >= 0.0) & (z <= 1.0)

    in_bbox = ((px >= col(22)) & (px <= col(23)) &
               (py >= col(24)) & (py <= col(25)))
    keep = col(21) > 0.0
    valid = keep & in_bbox & (inside | (sq_dist <= sq_blur)) & z_ok

    if shade:
        p3x = sb0 * col(26) + sb1 * col(29) + sb2 * col(32)
        p3y = sb0 * col(27) + sb1 * col(30) + sb2 * col(33)
        p3z = sb0 * col(28) + sb1 * col(31) + sb2 * col(34)
        ux = sb0 * col(35) + sb1 * col(38) + sb2 * col(41)
        uy = sb0 * col(36) + sb1 * col(39) + sb2 * col(42)
        uz = sb0 * col(37) + sb1 * col(40) + sb2 * col(43)
        u_norm = jnp.sqrt(ux * ux + uy * uy + uz * uz)
        n_inv = 1.0 / jnp.maximum(u_norm, 1e-12)
        nx, ny, nz = ux * n_inv, uy * n_inv, uz * n_inv
        cr = sb0 * col(44) + sb1 * col(47) + sb2 * col(50)
        cg = sb0 * col(45) + sb1 * col(48) + sb2 * col(51)
        cbl = sb0 * col(46) + sb1 * col(49) + sb2 * col(52)

        light_sum = jnp.zeros_like(p3x)
        light_terms = []
        for l in range(n_lights):
            lx = light(l, 0)
            ly = light(l, 1)
            lz = light(l, 2)
            intensity = light(l, 3)
            dx = lx - p3x
            dy = ly - p3y
            dz = lz - p3z
            d_norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            d_inv = 1.0 / jnp.maximum(d_norm, 1e-12)
            ct = (dx * nx + dy * ny + dz * nz) * d_inv
            ndl = jnp.clip(ct, 0.0, 1.0)
            light_sum = light_sum + ndl * intensity
            light_terms.append(dict(dx=dx, dy=dy, dz=dz, d_inv=d_inv, ct=ct,
                                    ndl=ndl, intensity=intensity))
        shade_r = cr * light_sum
        shade_g = cg * light_sum
        shade_b = cbl * light_sum
        logit = jnp.where(valid, z / gamma, _NEG_BIG)

    sgn = jnp.where(inside, 1.0, -1.0)
    cov_raw = jax.nn.sigmoid(sgn * sq_dist / sigma)
    coverage = jnp.where(valid, cov_raw, 0.0)

    q.update(locals())
    q.pop("data"); q.pop("light"); q.pop("q")
    return q


def _fwd_kernel(params_ref, lights_ref, a_start_ref, a_count_ref,
                b_count_ref, b_cand_ref, tri_ref, rgb0_ref, rgb1_ref,
                rgb2_ref, alpha_ref, max_ref, sumw_ref, *, image_width,
                image_height, full_height, s_rows, n_lights):
    # Grid: (batch, tile_row, tile_col) — the whole mesh batch renders in
    # one pallas_call; never vmap these kernels. Each tile's N_SEG strips
    # run their own gathered-segment loop over [C, SEG_H, TILE_W] lane
    # blocks (the strip's exact per-triangle bin), plus the shared legacy
    # candidate loop at strip height.
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    def light(l, k):
        return lights_ref[0, l, k]
    sigma = params_ref[0]
    gamma = params_ref[1]
    sq_blur = params_ref[2]
    row_off = params_ref[3]

    def run_strip(h):
        px, py = _strip_coords(ti, h, tj, row_off, image_width, full_height)

        def visit(row_start, carry):
            run_max, sum_w, sum_r, sum_g, sum_b, sil = carry
            data = tri_ref[0, pl.ds(row_start, TRI_CHUNK), :]
            q = _chunk_forward(data, px, py, light, sigma, gamma,
                               sq_blur, n_lights)
            coverage, logit = q["coverage"], q["logit"]
            chunk_max = jnp.max(logit, axis=0)
            new_max = jnp.maximum(run_max, chunk_max)
            scale = jnp.exp(run_max - new_max)
            expw = coverage * jnp.exp(logit - new_max[None])
            sum_w = sum_w * scale + jnp.sum(expw, axis=0)
            sum_r = sum_r * scale + jnp.sum(expw * q["shade_r"], axis=0)
            sum_g = sum_g * scale + jnp.sum(expw * q["shade_g"], axis=0)
            sum_b = sum_b * scale + jnp.sum(expw * q["shade_b"], axis=0)
            one_minus = 1.0 - coverage
            factor = one_minus[0]
            for k in range(1, TRI_CHUNK):
                factor = factor * one_minus[k]
            sil = sil * factor
            return new_max, sum_w, sum_r, sum_g, sum_b, sil

        a_start = a_start_ref[0, h, tj, 0]

        def a_body(i, carry):
            return visit((a_start + i) * TRI_CHUNK, carry)

        def b_body(i, carry):
            return visit(s_rows + b_cand_ref[0, 0, tj, i] * TRI_CHUNK,
                         carry)

        zeros = jnp.zeros((SEG_H, TILE_W), jnp.float32)
        init = (jnp.full((SEG_H, TILE_W), EPS / gamma, jnp.float32),
                zeros, zeros, zeros, zeros,
                jnp.ones((SEG_H, TILE_W), jnp.float32))
        carry = jax.lax.fori_loop(0, a_count_ref[0, h, tj, 0], a_body, init)
        return jax.lax.fori_loop(0, b_count_ref[0, 0, tj, 0], b_body, carry)

    strips = [run_strip(h) for h in range(N_SEG)]
    run_max, sum_w, sum_r, sum_g, sum_b, sil = (
        s[0] if N_SEG == 1 else jnp.concatenate(s, axis=0)
        for s in zip(*strips))

    bg = jnp.maximum(jnp.exp(EPS / gamma - run_max), EPS)
    inv_total = 1.0 / (sum_w + bg)
    rgb0_ref[0] = sum_r * inv_total
    rgb1_ref[0] = sum_g * inv_total
    rgb2_ref[0] = sum_b * inv_total
    alpha_ref[0] = 1.0 - sil
    max_ref[0] = run_max
    sumw_ref[0] = sum_w


def _bwd_kernel(params_ref, lights_ref, a_start_ref, a_count_ref,
                b_count_ref, b_cand_ref, tri_ref, max_ref, sumw_ref,
                sil_ref, rgb0_ref, rgb1_ref, rgb2_ref, dr_ref, dg_ref,
                db_ref, da_ref, dsw_ref, ddata_ref, dlights_ref,
                dparams_ref, *, image_width, image_height, full_height,
                s_rows, n_lights, precision):
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    sigma = params_ref[0]
    gamma = params_ref[1]
    sq_blur = params_ref[2]
    row_off = params_ref[3]

    def light(l, k):
        return lights_ref[0, l, k]

    # Per-batch-element gradient accumulators, revisited across this batch
    # element's consecutive tile steps; zero them on its first tile.
    @pl.when((ti == 0) & (tj == 0))
    def _init():
        ddata_ref[:] = jnp.zeros_like(ddata_ref)
        dlights_ref[:] = jnp.zeros_like(dlights_ref)
        dparams_ref[:] = jnp.zeros_like(dparams_ref)

    ones_w = jnp.ones((1, TILE_W), jnp.float32)
    eye_c = jnp.eye(TRI_CHUNK, dtype=jnp.float32)

    # ALL per-chunk pixel reductions (53 table columns + per-light + sigma/
    # gamma) are DEFERRED into ONE [R*C, P] x [P, 1] MXU dot per chunk
    # (R = 53 + 4*n_lights + 2). Round 2 grouped them 8 columns per dot,
    # which cut the compiled backward ~2x vs single-column dots; one mega
    # dot removes the remaining launches AND — via a small identity-matrix
    # matmul that transposes the [R, C] result to [C, R] on the MXU —
    # replaces the ~48 narrow [C, 1] read-modify-writes per chunk with a
    # single wide [C, 53] accumulator update. Trace-time dicts/lists only:
    # every chunk traces the same static reduction schedule.
    cols = {}
    extras = []

    def acc(colidx, val):
        """Queue sum-over-pixels of val [C, TH, TW] into table column."""
        prev = cols.get(colidx)
        cols[colidx] = val if prev is None else prev + val

    def acc_extra(val):
        """Queue a scalar (summed over C and pixels) reduction; returns its
        slot index in the flushed tail."""
        extras.append(val)
        return len(extras) - 1

    def flush_acc(row_start, light_slots, param_slots):
        # Pre-reduce every queued [C, TH, TW] value over the tile-row axis
        # on the VPU first (halving adds the compiler can keep in
        # registers): the staged dot operand shrinks TH-fold, so the one
        # MXU reduction dot below reads [R*C, TW] instead of [R*C, TH*TW].
        zero = jnp.zeros((TRI_CHUNK, TILE_W), jnp.float32)
        rows = [zero if cols.get(j) is None else jnp.sum(cols[j], axis=1)
                for j in range(_COLS)]
        rows += [jnp.sum(v, axis=1) for v in extras]
        n_rows = len(rows)
        v_all = jnp.concatenate(rows, axis=0)
        red = jax.lax.dot_general(
            v_all, ones_w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # [R*C, 1]
        # MXU transpose: eye [C, C] x red [R, C] (contracting the C axes)
        # -> [C, R]. HIGHEST precision so the transpose adds no bf16
        # rounding on top of the reduction's.
        red_t = jax.lax.dot_general(
            eye_c, red.reshape(n_rows, TRI_CHUNK), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [C, R]
        sl = (0, pl.ds(row_start, TRI_CHUNK), pl.ds(0, _COLS))
        ddata_ref[sl] = ddata_ref[sl] + red_t[:, :_COLS]
        tail = jnp.sum(red_t[:, _COLS:], axis=0, keepdims=True)  # [1, E]
        for slot, (l, comp) in light_slots:
            lsl = (0, pl.ds(l, 1), pl.ds(comp, 1))
            dlights_ref[lsl] = dlights_ref[lsl] + tail[:, slot:slot + 1]
        for slot, comp in param_slots:
            psl = (0, pl.ds(0, 1), pl.ds(comp, 1))
            dparams_ref[psl] = dparams_ref[psl] + tail[:, slot:slot + 1]
        cols.clear()
        extras.clear()

    def visit(row_start, px, py, run_max, sil, rgb_r, rgb_g, rgb_b,
              d_r, d_g, d_b, d_a, d_sw, inv_total):
        data = tri_ref[0, pl.ds(row_start, TRI_CHUNK), :]

        def process(_):
            def col(k):
                return data[:, k].reshape(TRI_CHUNK, 1, 1)

            q = _chunk_forward(data, px, py, light, sigma, gamma,
                               sq_blur, n_lights)
            cov = q["coverage"]                       # gated by valid
            E = jnp.exp(q["logit"] - run_max[None])   # 0 for invalid lanes
            W = cov * E

            # rgb = sum(W * s) / (sum_w + bg); m cancels, bg const.
            common = (d_r[None] * (q["shade_r"] - rgb_r[None]) +
                      d_g[None] * (q["shade_g"] - rgb_g[None]) +
                      d_b[None] * (q["shade_b"] - rgb_b[None])) * inv_total
            common = common + d_sw[None]
            ds_r = d_r[None] * W * inv_total
            ds_g = d_g[None] * W * inv_total
            ds_b = d_b[None] * W * inv_total

            # coverage path: rgb term keeps sigma'(x) = cov(1-cov); the
            # silhouette term's (1-cov) cancels against prod_{j!=c}.
            dsq = (q["sgn"] / sigma) * (
                d_a[None] * sil[None] * cov +
                common * E * q["cov_raw"] * (1.0 - q["cov_raw"]) *
                jnp.where(q["valid"], 1.0, 0.0))

            # depth path: dW/dl = W; z = 0.5 - z_ndc/2; l = z/gamma.
            dz_ndc = common * W / gamma * (-0.5)

            # sigma / gamma gradients (sigma and gamma are traced SMEM
            # params so annealing schedules run without recompiles):
            #   x = sgn*d^2/sigma  =>  dx/dsigma = -x/sigma, and the
            #   cotangent of x is dsq*sigma/sgn, so dsigma = -dsq*d^2/sigma;
            #   l = z/gamma  =>  dgamma = (common*W)*(-z/gamma^2)
            #                           = 2*dz_ndc*z/gamma.
            # The background weight's own gamma dependence
            # (bg ~ exp(EPS/gamma - m), EPS = 1e-10) is dropped — it is
            # O(EPS/gamma^2) relative and vanishes wherever any triangle
            # covers the pixel.
            param_slots = [
                (acc_extra(-dsq * q["sq_dist"] / sigma), 0),
                (acc_extra(2.0 * dz_ndc * q["z"] / gamma), 1),
            ]

            dsb0 = dz_ndc * col(15)
            dsb1 = dz_ndc * col(16)
            dsb2 = dz_ndc * col(17)
            acc(15, dz_ndc * q["sb0"])
            acc(16, dz_ndc * q["sb1"])
            acc(17, dz_ndc * q["sb2"])

            # shading path.
            light_sum = q["light_sum"]
            dcr = ds_r * light_sum
            dcg = ds_g * light_sum
            dcbl = ds_b * light_sum
            dlight_sum = ds_r * q["cr"] + ds_g * q["cg"] + ds_b * q["cbl"]
            nx, ny, nz = q["nx"], q["ny"], q["nz"]
            dp3x = jnp.zeros_like(light_sum)
            dp3y = jnp.zeros_like(light_sum)
            dp3z = jnp.zeros_like(light_sum)
            dnx = jnp.zeros_like(light_sum)
            dny = jnp.zeros_like(light_sum)
            dnz = jnp.zeros_like(light_sum)
            light_slots = []
            for l in range(n_lights):
                lt = q["light_terms"][l]
                gate = ((lt["ct"] > 0.0) & (lt["ct"] < 1.0)).astype(
                    jnp.float32)
                dndl = dlight_sum * lt["intensity"] * gate
                light_slots.append(
                    (acc_extra(dlight_sum * lt["ndl"]), (l, 3)))
                di = lt["d_inv"]
                ct = lt["ct"]
                ddx = dndl * (nx * di - ct * lt["dx"] * di * di)
                ddy = dndl * (ny * di - ct * lt["dy"] * di * di)
                ddz = dndl * (nz * di - ct * lt["dz"] * di * di)
                dnx += dndl * lt["dx"] * di
                dny += dndl * lt["dy"] * di
                dnz += dndl * lt["dz"] * di
                dp3x -= ddx
                dp3y -= ddy
                dp3z -= ddz
                light_slots.append((acc_extra(ddx), (l, 0)))
                light_slots.append((acc_extra(ddy), (l, 1)))
                light_slots.append((acc_extra(ddz), (l, 2)))

            # normalize backward: u -> n.
            ndot = dnx * nx + dny * ny + dnz * nz
            ninv = q["n_inv"]
            dux = (dnx - nx * ndot) * ninv
            duy = (dny - ny * ndot) * ninv
            duz = (dnz - nz * ndot) * ninv

            # attribute interpolation transposes (corner-major columns).
            sb = (q["sb0"], q["sb1"], q["sb2"])
            for k in range(3):
                acc(26 + 3 * k, dp3x * sb[k])
                acc(27 + 3 * k, dp3y * sb[k])
                acc(28 + 3 * k, dp3z * sb[k])
                acc(35 + 3 * k, dux * sb[k])
                acc(36 + 3 * k, duy * sb[k])
                acc(37 + 3 * k, duz * sb[k])
                acc(44 + 3 * k, dcr * sb[k])
                acc(45 + 3 * k, dcg * sb[k])
                acc(46 + 3 * k, dcbl * sb[k])
            dsb0 += (dp3x * col(26) + dp3y * col(27) + dp3z * col(28) +
                     dux * col(35) + duy * col(36) + duz * col(37) +
                     dcr * col(44) + dcg * col(45) + dcbl * col(46))
            dsb1 += (dp3x * col(29) + dp3y * col(30) + dp3z * col(31) +
                     dux * col(38) + duy * col(39) + duz * col(40) +
                     dcr * col(47) + dcg * col(48) + dcbl * col(49))
            dsb2 += (dp3x * col(32) + dp3y * col(33) + dp3z * col(34) +
                     dux * col(41) + duy * col(42) + duz * col(43) +
                     dcr * col(50) + dcg * col(51) + dcbl * col(52))

            # L1-normalize backward: sb = ow / sum(|ow|).
            sdot = dsb0 * q["sb0"] + dsb1 * q["sb1"] + dsb2 * q["sb2"]
            inv_d = q["inv_denom"]
            dow0 = (dsb0 - sdot * jnp.sign(q["ow0"])) * inv_d
            dow1 = (dsb1 - sdot * jnp.sign(q["ow1"])) * inv_d
            dow2 = (dsb2 - sdot * jnp.sign(q["ow2"])) * inv_d
            iw0, iw1, iw2 = q["iw0"], q["iw1"], q["iw2"]
            dcb0 = dow0 * iw0
            dcb1 = dow1 * iw1
            dcb2 = dow2 * iw2
            # d(1/w) cotangents — the pack VJP turns them into the
            # -cb*dow/w^2 clip-w gradients the spec produces directly.
            acc(53, dow0 * q["cb0"])
            acc(54, dow1 * q["cb1"])
            acc(55, dow2 * q["cb2"])

            # inside: cb == screen barycentrics (linear in px, py, 1), so
            # the matrix-row gradients are (g*px, g*py, g) — queued as
            # ordinary columns into the chunk's one mega reduction dot.
            ins = q["inside"].astype(jnp.float32)
            for i, dcb in enumerate((dcb0, dcb1, dcb2)):
                g = dcb * ins
                acc(3 * i + 0, g * px)
                acc(3 * i + 1, g * py)
                acc(3 * i + 2, g)

            # outside: cb from the picked edge's t.
            outs = 1.0 - ins
            dts = (
                (dcb1 - dcb0) * outs * q["pick01"],
                (dcb2 - dcb1) * outs * q["pick12"],
                (dcb0 - dcb2) * outs * q["pick20"],
            )
            _edge_gradients(q, col, px, py, dsq, dts, acc)
            flush_acc(row_start, light_slots, param_slots)
            return 0

        process(0)
        return 0

    for h in range(N_SEG):
        px, py = _strip_coords(ti, h, tj, row_off, image_width, full_height)

        # Tiles at the image boundary are padded; the padded region of the
        # residual/cotangent blocks is uninitialized memory. Mask it to
        # neutral values or its garbage (possibly NaN) would poison the
        # per-triangle sum-reductions (0 * NaN == NaN).
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 1)
        pix_ok = ((row_idx + ti * TILE_H + h * SEG_H < image_height) &
                  (col_idx + tj * TILE_W < image_width))

        def load(ref, default):
            return jnp.where(pix_ok, ref[0, pl.ds(h * SEG_H, SEG_H), :],
                             default)

        run_max = load(max_ref, 1.0)
        sum_w = load(sumw_ref, 0.0)
        sil = load(sil_ref, 1.0)
        rgb_r = load(rgb0_ref, 0.0)
        rgb_g = load(rgb1_ref, 0.0)
        rgb_b = load(rgb2_ref, 0.0)
        d_r = load(dr_ref, 0.0)
        d_g = load(dg_ref, 0.0)
        d_b = load(db_ref, 0.0)
        d_a = load(da_ref, 0.0)
        # Cotangent of the RAW weight sum output (multi-pass merge path;
        # zero for plain rgba consumers). d(sum_w)/dW = 1 per lane, so it
        # simply adds to the rgb path's per-lane dW cotangent `common`.
        # The running max m is treated as a constant here, which combined
        # with the merge wrapper DISCARDING the m cotangent is exactly
        # right: the merged result is invariant under (m -> m+d,
        # sumw -> sumw*e^-d), so the two frame terms cancel identically
        # (up to the bg clamp corner).
        d_sw = load(dsw_ref, 0.0)
        bg = jnp.maximum(jnp.exp(EPS / gamma - run_max), EPS)
        inv_total = (1.0 / (sum_w + bg))[None]  # [1, SEG_H, TW]

        args = (px, py, run_max, sil, rgb_r, rgb_g, rgb_b, d_r, d_g, d_b,
                d_a, d_sw, inv_total)
        a_start = a_start_ref[0, h, tj, 0]
        jax.lax.fori_loop(
            0, a_count_ref[0, h, tj, 0],
            lambda i, _, args=args, a_start=a_start: visit(
                (a_start + i) * TRI_CHUNK, *args), 0)
        jax.lax.fori_loop(
            0, b_count_ref[0, 0, tj, 0],
            lambda i, _, args=args: visit(
                s_rows + b_cand_ref[0, 0, tj, i] * TRI_CHUNK, *args), 0)


def _edge_gradients(q, col, px, py, dsq, dts, acc):
    """Edge-endpoint gradients (table cols 9-14), shared by both backwards.

    Two chains per picked nearest edge: the offset-t path (dts — the edge
    barycentric fallback; identically zero for the silhouette-only kernel,
    where XLA constant-folds it away) and the squared-distance envelope
    path (dsq; t treated constant at the interior optimum — module
    docstring).
    """
    edges = (  # (ax, ay, bx, by, inv_len2, t, pick) per edge
        (9, 10, 11, 12, 56, q["t01"], q["pick01"]),
        (11, 12, 13, 14, 57, q["t12"], q["pick12"]),
        (13, 14, 9, 10, 58, q["t20"], q["pick20"]),
    )
    for (cax, cay, cbx, cby, cil2, t, pick), dt in zip(edges, dts):
        ax, ay = col(cax), col(cay)
        bx, by = col(cbx), col(cby)
        abx = bx - ax
        aby = by - ay
        qx = px - ax
        qy = py - ay
        tgate = ((t > 0.0) & (t < 1.0)).astype(jnp.float32)
        dtg = dt * tgate
        inv_len2 = col(cil2)
        # d t / d a and d t / d b (derivation in module docstring).
        da_tx = dtg * (-abx - qx + 2.0 * t * abx) * inv_len2
        da_ty = dtg * (-aby - qy + 2.0 * t * aby) * inv_len2
        db_tx = dtg * (qx - 2.0 * t * abx) * inv_len2
        db_ty = dtg * (qy - 2.0 * t * aby) * inv_len2
        # sq_dist path (envelope: t treated constant).
        pickf = pick.astype(jnp.float32)
        rx = ax + t * abx - px
        ry = ay + t * aby - py
        dsqp = dsq * pickf
        da_sx = dsqp * 2.0 * rx * (1.0 - t)
        da_sy = dsqp * 2.0 * ry * (1.0 - t)
        db_sx = dsqp * 2.0 * rx * t
        db_sy = dsqp * 2.0 * ry * t
        acc(cax, da_tx + da_sx)
        acc(cay, da_ty + da_sy)
        acc(cbx, db_tx + db_sx)
        acc(cby, db_ty + db_sy)


def _fwd_kernel_sil(params_ref, a_start_ref, a_count_ref, b_count_ref,
                    b_cand_ref, tri_ref, alpha_ref, *, image_width,
                    image_height, full_height, s_rows):
    """Silhouette-only forward: alpha = 1 - prod(1 - coverage).

    The SoftRas alpha channel needs none of the shading/softmax machinery
    (models/soft_mesh_renderer.render_silhouette) — per (pixel, triangle)
    only the geometry phase runs (~2x the full fwd+bwd step). Matches the
    full kernel's alpha output bit-for-bit: same _chunk_forward geometry,
    same coverage product.
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    sigma = params_ref[0]
    sq_blur = params_ref[2]
    row_off = params_ref[3]

    def run_strip(h):
        px, py = _strip_coords(ti, h, tj, row_off, image_width, full_height)

        def visit(row_start, sil):
            data = tri_ref[0, pl.ds(row_start, TRI_CHUNK), :]
            q = _chunk_forward(data, px, py, None, sigma, 1.0, sq_blur,
                               n_lights=0, shade=False)
            one_minus = 1.0 - q["coverage"]
            factor = one_minus[0]
            for k in range(1, TRI_CHUNK):
                factor = factor * one_minus[k]
            return sil * factor

        a_start = a_start_ref[0, h, tj, 0]
        sil = jax.lax.fori_loop(
            0, a_count_ref[0, h, tj, 0],
            lambda i, s: visit((a_start + i) * TRI_CHUNK, s),
            jnp.ones((SEG_H, TILE_W), jnp.float32))
        return jax.lax.fori_loop(
            0, b_count_ref[0, 0, tj, 0],
            lambda i, s: visit(s_rows + b_cand_ref[0, 0, tj, i] * TRI_CHUNK,
                               s),
            sil)

    strips = [run_strip(h) for h in range(N_SEG)]
    sil = strips[0] if N_SEG == 1 else jnp.concatenate(strips, axis=0)
    alpha_ref[0] = 1.0 - sil


def _bwd_kernel_sil(params_ref, a_start_ref, a_count_ref, b_count_ref,
                    b_cand_ref, tri_ref, sil_ref, da_ref, ddata_ref,
                    dparams_ref, *, image_width, image_height, full_height,
                    s_rows, precision):
    """Silhouette-only backward: edge-endpoint + dsigma gradients.

    alpha touches the triangle table ONLY through coverage =
    sigmoid(sgn * sq_dist / sigma) gated by validity: the barycentric
    matrix, depths, w, and attribute columns all have identically zero
    alpha-cotangent (depth enters via the non-differentiable z_ok gate),
    so the reduction flushes just the 6 edge-endpoint columns and dsigma —
    the same deferred one-dot scheme as the full backward, 10x narrower.
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    sigma = params_ref[0]
    sq_blur = params_ref[2]
    row_off = params_ref[3]

    @pl.when((ti == 0) & (tj == 0))
    def _init():
        ddata_ref[:] = jnp.zeros_like(ddata_ref)
        dparams_ref[:] = jnp.zeros_like(dparams_ref)

    ones_w = jnp.ones((1, TILE_W), jnp.float32)
    eye_c = jnp.eye(TRI_CHUNK, dtype=jnp.float32)
    cols = {}

    def acc(colidx, val):
        prev = cols.get(colidx)
        cols[colidx] = val if prev is None else prev + val

    def visit(row_start, px, py, sil, d_a):
        data = tri_ref[0, pl.ds(row_start, TRI_CHUNK), :]

        def col(k):
            return data[:, k].reshape(TRI_CHUNK, 1, 1)

        q = _chunk_forward(data, px, py, None, sigma, 1.0, sq_blur,
                           n_lights=0, shade=False)
        cov = q["coverage"]
        # d alpha / d cov_c = prod_{j != c}(1 - cov_j) = sil / (1 - cov_c);
        # folding through sigmoid' = cov(1-cov) cancels the (1-cov) (module
        # docstring) — same chain as the full backward's d_a term.
        dsq = (q["sgn"] / sigma) * d_a[None] * sil[None] * cov
        _edge_gradients(q, col, px, py, dsq,
                        (jnp.float32(0.0),) * 3, acc)
        dsig = -dsq * q["sq_dist"] / sigma

        # Deferred one-dot flush over the 6 edge columns + dsigma.
        rows = [jnp.sum(cols[j], axis=1) for j in range(9, 15)]
        rows.append(jnp.sum(dsig, axis=1))
        v_all = jnp.concatenate(rows, axis=0)  # [7C, TW]
        red = jax.lax.dot_general(
            v_all, ones_w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        red_t = jax.lax.dot_general(
            eye_c, red.reshape(len(rows), TRI_CHUNK),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [C, 7]
        sl = (0, pl.ds(row_start, TRI_CHUNK), pl.ds(9, 6))
        ddata_ref[sl] = ddata_ref[sl] + red_t[:, :6]
        psl = (0, pl.ds(0, 1), pl.ds(0, 1))
        dparams_ref[psl] = (dparams_ref[psl]
                            + jnp.sum(red_t[:, 6:7], axis=0, keepdims=True))
        cols.clear()
        return 0

    for h in range(N_SEG):
        px, py = _strip_coords(ti, h, tj, row_off, image_width, full_height)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (SEG_H, TILE_W), 1)
        pix_ok = ((row_idx + ti * TILE_H + h * SEG_H < image_height) &
                  (col_idx + tj * TILE_W < image_width))
        sil = jnp.where(pix_ok, sil_ref[0, pl.ds(h * SEG_H, SEG_H), :], 1.0)
        d_a = jnp.where(pix_ok, da_ref[0, pl.ds(h * SEG_H, SEG_H), :], 0.0)

        args = (px, py, sil, d_a)
        a_start = a_start_ref[0, h, tj, 0]
        jax.lax.fori_loop(
            0, a_count_ref[0, h, tj, 0],
            lambda i, _, args=args, a_start=a_start: visit(
                (a_start + i) * TRI_CHUNK, *args), 0)
        jax.lax.fori_loop(
            0, b_count_ref[0, 0, tj, 0],
            lambda i, _, args=args: visit(
                s_rows + b_cand_ref[0, 0, tj, i] * TRI_CHUNK, *args), 0)


def _run_forward_sil(table, s_rows, plan, candidates, counts, params,
                     image_width, image_height, full_height, interpret):
    batch, total_rows, _ = table.shape
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _fwd_kernel_sil, image_width=image_width,
        image_height=image_height, full_height=full_height, s_rows=s_rows)
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seg_spec,     # gathered per-strip segment starts
            seg_spec,     # gathered per-strip segment chunk counts
            count_spec,   # legacy candidate counts
            cand_spec,    # legacy candidate chunk ids
            tri_spec,
        ],
        out_specs=[tile_spec],
        out_shape=[jax.ShapeDtypeStruct(
            (batch, image_height, image_width), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(params, plan[2], plan[3], counts, candidates, table)[0]


def _run_backward_sil(table, s_rows, plan, candidates, counts, params,
                      alpha, cotangent, image_width, image_height,
                      full_height, interpret, dot_precision):
    batch, total_rows, _ = table.shape
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _bwd_kernel_sil, image_width=image_width,
        image_height=image_height, full_height=full_height, s_rows=s_rows,
        precision=resolve_dot_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec_data = pl.BlockSpec((1, total_rows, _COLS),
                                 lambda b, i, j: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    acc_spec_params = pl.BlockSpec((1, 1, 8),
                                   lambda b, i, j: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    dtab, dparams = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seg_spec,
            seg_spec,
            count_spec,
            cand_spec,
            tri_spec,
        ] + [tile_spec] * 2,
        out_specs=[acc_spec_data, acc_spec_params],
        out_shape=[
            jax.ShapeDtypeStruct((batch, total_rows, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, 8), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(params, plan[2], plan[3], counts, candidates, table, 1.0 - alpha,
      cotangent)
    ddata = binning_lib._segment_sum_gathered(dtab, s_rows, plan[0])
    return ddata, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _soft_sil_core(clip_space_vertices, triangles, row_offset, sigma_val,
                   image_width, image_height, blur_radius, full_height,
                   interpret, dot_precision, binning):
    out, _ = _sil_fwd(clip_space_vertices, triangles, row_offset, sigma_val,
                      image_width, image_height, blur_radius, full_height,
                      interpret, dot_precision, binning)
    return out


def _sil_pack(clip_v, triangles, blur_radius):
    zeros = jnp.zeros(clip_v.shape[:-1] + (3,), jnp.float32)
    return _pack_batched(clip_v, triangles, zeros, zeros, zeros,
                         blur_radius)


def _sil_fwd(clip_v, triangles, row_offset, sigma_val, image_width,
             image_height, blur_radius, full_height, interpret,
             dot_precision, binning):
    tri_data = _sil_pack(clip_v, triangles, blur_radius)
    table, s_rows, plan, candidates, counts = _prepare_tables(
        tri_data, binning, image_width, image_height, row_offset,
        full_height)
    params = _make_params(sigma_val, 1.0, blur_radius, row_offset)
    alpha = _run_forward_sil(table, s_rows, plan, candidates, counts,
                             params, image_width, image_height,
                             full_height, interpret)
    residuals = (triangles, jax.lax.stop_gradient(table),
                 jax.tree_util.tree_map(jax.lax.stop_gradient, plan),
                 candidates, counts,
                 jax.lax.stop_gradient(params), alpha, clip_v)
    return alpha, residuals


def _sil_bwd(image_width, image_height, blur_radius, full_height, interpret,
             dot_precision, binning, residuals, cotangent):
    (triangles, table, plan, candidates, counts, params, alpha,
     clip_v) = residuals
    s_rows = plan[0].shape[1]
    ddata, dparams = _run_backward_sil(
        table, s_rows, plan, candidates, counts, params, alpha, cotangent,
        image_width, image_height, full_height, interpret, dot_precision)
    _, pack_vjp = jax.vjp(
        lambda cv: _sil_pack(cv, triangles, blur_radius), clip_v)
    (dclip,) = pack_vjp(ddata)
    dsigma = jnp.sum(dparams[:, 0, 0])
    tri_cot = np.zeros(np.shape(triangles), dtype=jax.dtypes.float0)
    row_cot = np.zeros((), dtype=jax.dtypes.float0)
    return (dclip, tri_cot, row_cot, dsigma)


_soft_sil_core.defvjp(lambda *args: _sil_fwd(*args), _sil_bwd)


def soft_rasterize_silhouette_pallas_batched(
        clip_space_vertices, triangles, image_width, image_height,
        sigma_val, blur_radius=0.01, row_offset=None, full_height=None,
        interpret=None, dot_precision="default", binning="auto"):
    """Silhouette-only SoftRas: [B, H, W] alpha, ~2x the full fwd+bwd rate.

    Bit-identical to soft_rasterize_pallas_batched(...)[..., 3] (same
    geometry phase, same coverage product) but skips the shading/softmax
    math entirely, and its backward reduces only the 6 edge-endpoint
    columns + dsigma. sigma is a traced, differentiable scalar; gamma does
    not enter the silhouette. Meshes beyond the per-pass cap compose
    multiplicatively across passes (alpha = 1 - prod_p(1 - alpha_p) —
    exact, gradients included).
    """
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    if isinstance(blur_radius, jax.core.Tracer):
        raise TypeError(
            "blur_radius must be a static float for the Pallas soft "
            "rasterizer (it shapes the packed triangle bboxes); sigma may "
            "be traced.")
    interpret = _default_interpret(interpret)
    tris = jnp.asarray(triangles, jnp.int32)
    binning = _resolve_binning(binning, tris.shape[0], silhouette=True)
    row_off = jnp.asarray(row_offset, jnp.int32)
    sigma = jnp.asarray(sigma_val, jnp.float32)
    resolve_dot_precision(dot_precision)  # validate eagerly

    def one_pass(tri_slice):
        return _soft_sil_core(
            clip_space_vertices, tri_slice, row_off, sigma,
            int(image_width), int(image_height), float(blur_radius),
            int(full_height), interpret, dot_precision, binning)

    n_tri = tris.shape[0]
    max_tris = _max_pass_triangles(binning)
    if n_tri <= max_tris:
        return one_pass(tris)
    sil = 1.0
    start = 0
    while start < n_tri:
        size = min(max_tris, n_tri - start)
        sil = sil * (1.0 - one_pass(tris[start:start + size]))
        start += size
    return 1.0 - sil


def _run_forward(table, s_rows, plan, candidates, counts, lights, params,
                 image_width, image_height, full_height, n_lights,
                 interpret):
    """Batched forward: table [B, S + T_pad, 59], lights [B, L, 4]."""
    batch, total_rows, _ = table.shape
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _fwd_kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, s_rows=s_rows, n_lights=n_lights)
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    lights_spec = pl.BlockSpec((1, n_lights, 4), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.SMEM)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    out_shape = [jax.ShapeDtypeStruct(
        (batch, image_height, image_width), jnp.float32)] * 6
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sigma/gamma/blur/row
            lights_spec,
            seg_spec,     # gathered per-strip segment starts
            seg_spec,     # gathered per-strip segment chunk counts
            count_spec,   # legacy candidate counts
            cand_spec,    # legacy candidate chunk ids
            tri_spec,
        ],
        out_specs=[tile_spec] * 6,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(params, lights, plan[2], plan[3], counts, candidates, table)


def _run_backward(table, s_rows, plan, candidates, counts, lights, params,
                  run_max, sum_w, sil, rgb, cotangent, d_sumw, image_width,
                  image_height, full_height, n_lights, interpret,
                  dot_precision):
    """Batched backward: [B, ...] residuals -> (ddata [B, T_pad, 59],
    dlights [B, L, 4], dparams)."""
    batch, total_rows, _ = table.shape
    n_tri_padded = total_rows - s_rows
    grid = (batch, pl.cdiv(image_height, TILE_H),
            pl.cdiv(image_width, TILE_W))
    kernel = functools.partial(
        _bwd_kernel, image_width=image_width, image_height=image_height,
        full_height=full_height, s_rows=s_rows, n_lights=n_lights,
        precision=resolve_dot_precision(dot_precision))
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, total_rows, _COLS),
                            lambda b, i, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    lights_spec = pl.BlockSpec((1, n_lights, 4), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.SMEM)
    acc_spec_data = pl.BlockSpec((1, total_rows, _COLS),
                                 lambda b, i, j: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    acc_spec_lights = pl.BlockSpec((1, n_lights, 4),
                                   lambda b, i, j: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    acc_spec_params = pl.BlockSpec((1, 1, 8),
                                   lambda b, i, j: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    count_spec, cand_spec = _bin_specs(
        pl.cdiv(image_width, TILE_W), n_tri_padded // TRI_CHUNK)
    seg_spec = _seg_specs(pl.cdiv(image_width, TILE_W))
    dtab, dlights, dparams = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lights_spec,
            seg_spec,
            seg_spec,
            count_spec,
            cand_spec,
            tri_spec,
        ] + [tile_spec] * 11,
        out_specs=[acc_spec_data, acc_spec_lights, acc_spec_params],
        out_shape=[
            jax.ShapeDtypeStruct((batch, total_rows, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_lights, 4), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, 8), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(params, lights, plan[2], plan[3], counts, candidates, table, run_max,
      sum_w, sil, rgb[..., 0], rgb[..., 1], rgb[..., 2], cotangent[..., 0],
      cotangent[..., 1], cotangent[..., 2], cotangent[..., 3], d_sumw)
    ddata = binning_lib._segment_sum_gathered(dtab, s_rows, plan[0])
    return ddata, dlights, dparams


def _make_params(sigma_val, gamma_val, blur_radius, row_offset):
    return jnp.stack([
        jnp.asarray(sigma_val, jnp.float32).reshape(()),
        jnp.asarray(gamma_val, jnp.float32).reshape(()),
        jnp.asarray(blur_radius, jnp.float32).reshape(()) ** 2,
        jnp.asarray(row_offset, jnp.float32).reshape(()),
    ])


_pack_batched = jax.vmap(_pack_triangle_data,
                         in_axes=(0, None, 0, 0, 0, None))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17))
def _soft_pallas_core(clip_space_vertices, triangles, world_space_vertices,
                      normals, diffuse_colors, light_positions,
                      light_intensities, row_offset, sigma_val, gamma_val,
                      image_width, image_height, blur_radius,
                      full_height, interpret, raw=False,
                      dot_precision="default", binning="gathered"):
    out, _ = _fwd(clip_space_vertices, triangles, world_space_vertices,
                  normals, diffuse_colors, light_positions,
                  light_intensities, row_offset, sigma_val, gamma_val,
                  image_width, image_height, blur_radius, full_height,
                  interpret, raw, dot_precision, binning)
    return out


def _fwd(clip_v, triangles, world_v, normals, colors, lights, intensities,
         row_offset, sigma_val, gamma_val, image_width, image_height,
         blur_radius, full_height, interpret, raw=False,
         dot_precision="default", binning="gathered"):
    tri_data = _pack_batched(clip_v, triangles, world_v, normals, colors,
                             blur_radius)
    table, s_rows, plan, candidates, counts = _prepare_tables(
        tri_data, binning, image_width, image_height, row_offset,
        full_height)
    lights_packed = jnp.concatenate(
        [jnp.asarray(lights, jnp.float32),
         jnp.asarray(intensities, jnp.float32)[..., None]], axis=-1)
    params = _make_params(sigma_val, gamma_val, blur_radius, row_offset)
    r, g, b, a, run_max, sum_w = _run_forward(
        table, s_rows, plan, candidates, counts, lights_packed, params,
        image_width, image_height, full_height, lights.shape[-2],
        interpret)
    rgba = jnp.stack([r, g, b, a], axis=-1)
    # raw mode additionally exposes the online-softmax state (running max,
    # in-frame weight sum) so the multi-pass wrapper can merge passes
    # exactly; the m cotangent is analytically zero through the merge.
    out = (rgba, run_max, sum_w) if raw else rgba
    residuals = (triangles, jax.lax.stop_gradient(table),
                 jax.tree_util.tree_map(jax.lax.stop_gradient, plan),
                 candidates, counts,
                 jax.lax.stop_gradient(lights_packed),
                 jax.lax.stop_gradient(params), run_max,
                 sum_w, jnp.stack([r, g, b], axis=-1), a,
                 clip_v, world_v, normals, colors)
    return out, residuals


def _bwd(image_width, image_height, blur_radius, full_height, interpret,
         raw, dot_precision, binning, residuals, cotangent):
    (triangles, table, plan, candidates, counts, lights_packed, params,
     run_max, sum_w, rgb, alpha, clip_v, world_v, normals,
     colors) = residuals
    if raw:
        cotangent, _dm, d_sumw = cotangent  # m cotangent: see _fwd note
    else:
        d_sumw = jnp.zeros_like(sum_w)
    s_rows = plan[0].shape[1]
    ddata, dlights_packed, dparams = _run_backward(
        table, s_rows, plan, candidates, counts, lights_packed, params,
        run_max, sum_w, 1.0 - alpha, rgb, cotangent, d_sumw, image_width,
        image_height, full_height, lights_packed.shape[-2], interpret,
        dot_precision)
    # Transpose the (cheap) packing to reach clip vertices and attributes.
    _, pack_vjp = jax.vjp(
        lambda cv, wv, nn, cc: _pack_batched(
            cv, triangles, wv, nn, cc, blur_radius),
        clip_v, world_v, normals, colors)
    dclip, dworld, dnormals, dcolors = pack_vjp(ddata)
    dlight_pos = dlights_packed[..., :3]
    dlight_int = dlights_packed[..., 3]
    dsigma = jnp.sum(dparams[:, 0, 0])
    dgamma = jnp.sum(dparams[:, 0, 1])
    tri_cot = np.zeros(np.shape(triangles), dtype=jax.dtypes.float0)
    row_cot = np.zeros((), dtype=jax.dtypes.float0)
    return (dclip, tri_cot, dworld, dnormals, dcolors, dlight_pos,
            dlight_int, row_cot, dsigma, dgamma)


_soft_pallas_core.defvjp(
    lambda *args: _fwd(*args),
    _bwd)


def _default_interpret(interpret):
    if interpret is None:
        try:
            return jax.devices()[0].platform != "tpu"
        except Exception:  # pragma: no cover
            return True
    return bool(interpret)


def soft_rasterize_pallas_batched(clip_space_vertices, triangles,
                                  world_space_vertices, normals,
                                  diffuse_colors, light_positions,
                                  light_intensities, image_width,
                                  image_height, sigma_val, gamma_val,
                                  blur_radius=0.01, row_offset=None,
                                  full_height=None, interpret=None,
                                  dot_precision="default",
                                  binning="auto"):
    """Soft-rasterize a mesh batch with the tiled Pallas fwd+bwd kernels.

    All scene inputs carry a leading batch dimension (clip [B, V, 4], world
    / normals / colors [B, V, 3], lights [B, L, 3], intensities [B, L]);
    the whole batch runs in one pallas_call with batch as the leading grid
    dimension (do NOT vmap over this function — batching is native).
    sigma/gamma are traced f32 scalars (annealing schedules under jit stay
    on this kernel without recompiles) and are differentiable; only
    blur_radius must be a static float (it shapes the packed bboxes).
    """
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    if isinstance(blur_radius, jax.core.Tracer):
        raise TypeError(
            "blur_radius must be a static float for the Pallas soft "
            "rasterizer (it shapes the packed triangle bboxes); sigma/gamma "
            "may be traced. Use the XLA backend "
            "(SoftRasterizerConfig(backend='xla')) to trace blur_radius.")
    interpret = _default_interpret(interpret)
    tris = jnp.asarray(triangles, jnp.int32)
    binning = _resolve_binning(binning, tris.shape[0])
    row_off = jnp.asarray(row_offset, jnp.int32)
    sigma = jnp.asarray(sigma_val, jnp.float32)
    gamma = jnp.asarray(gamma_val, jnp.float32)

    resolve_dot_precision(dot_precision)  # validate eagerly

    def one_pass(tri_slice, raw):
        return _soft_pallas_core(
            clip_space_vertices, tri_slice, world_space_vertices, normals,
            diffuse_colors, light_positions, light_intensities, row_off,
            sigma, gamma, int(image_width), int(image_height),
            float(blur_radius), int(full_height), interpret, raw,
            dot_precision, binning)

    n_tri = tris.shape[0]
    max_tris = _max_pass_triangles(binning)
    if n_tri <= max_tris:
        return one_pass(tris, False)

    # Multi-pass: render <= max_tris triangles per pass and
    # merge the online-softmax states exactly. Per pass p (in its own
    # running-max frame m_p): the in-frame color sum is recovered as
    # rgb_p * (sumw_p + bg_p) (the background contributes no color), all
    # partial sums rescale by e^(m_p - m) into the global frame
    # m = max_p m_p, and the silhouette alpha composes multiplicatively.
    # The result is identical to a single pass over all triangles (the
    # aggregation is associative); gradients flow through each pass's
    # analytic VJP (see the raw-mode notes in _fwd/_bwd).
    parts = []
    start = 0
    while start < n_tri:
        size = min(max_tris, n_tri - start)
        parts.append(one_pass(tris[start:start + size], True))
        start += size

    m = parts[0][1]
    for rgba_p, m_p, _ in parts[1:]:
        m = jnp.maximum(m, m_p)
    sum_w = 0.0
    sum_c = 0.0
    sil = 1.0
    for rgba_p, m_p, sumw_p in parts:
        bg_p = jnp.maximum(jnp.exp(EPS / gamma - m_p), EPS)
        scale_p = jnp.exp(m_p - m)
        sum_w = sum_w + sumw_p * scale_p
        sum_c = sum_c + (rgba_p[..., :3] * (sumw_p + bg_p)[..., None]
                         * scale_p[..., None])
        sil = sil * (1.0 - rgba_p[..., 3])
    bg = jnp.maximum(jnp.exp(EPS / gamma - m), EPS)
    rgb = sum_c / (sum_w + bg)[..., None]
    return jnp.concatenate([rgb, 1.0 - sil[..., None]], axis=-1)


def rasterize_batch_pallas(clip_space_vertices, triangles,
                           world_space_vertices, normals, diffuse_colors,
                           light_positions, light_intensities, image_width,
                           image_height, sigma_val, gamma_val,
                           blur_radius=0.01, row_offset=None,
                           full_height=None, interpret=None,
                           dot_precision="default", binning="auto"):
    """Single-mesh wrapper over the batched Pallas soft rasterizer.

    Contract identical to soft_rasterize.rasterize_batch.
    """
    out = soft_rasterize_pallas_batched(
        clip_space_vertices[None], triangles, world_space_vertices[None],
        normals[None], diffuse_colors[None], light_positions[None],
        light_intensities[None], image_width, image_height, sigma_val,
        gamma_val, blur_radius=blur_radius, row_offset=row_offset,
        full_height=full_height, interpret=interpret,
        dot_precision=dot_precision, binning=binning)
    return out[0]
