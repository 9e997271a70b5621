"""Per-triangle patch-scatter decomposition: hardware go/no-go (VERDICT r4 #1).

THE question this answers: the shipped tile kernels' lane occupancy is low
(a ~12 px bench triangle covers ~7% of a 16x128 tile block; the soft
kernel's validity occupancy is 0.19%), and every finer decomposition in
the tile family measured a loss (chunk 4, SEG_H=8, gathered-at-stress,
MXU offload — BENCH.md r4). The one formulated-but-unmeasured layout is
**per-triangle patches**: give each triangle its own [PH, PW] pixel window
anchored at its bbox corner, flatten the window into the 128-lane axis
(PH*PW = 128), and evaluate (triangle, own-pixel) pairs densely — lane
occupancy becomes bbox-coverage (~50-90%) instead of tile-coverage.

The structural cost: lanes of one patch row are DIFFERENT image pixels
from lanes of another, so z-buffer composition can no longer be a VPU
select inside the kernel (dynamic per-sublane lane shifts don't exist on
TPU) — the winner merge must round-trip through HBM as a data-dependent
permutation. This script implements the full pipeline faithfully and
times every stage, against the PRODUCTION forward
(`rasterize_barycentric_pallas_batched`, its binning prepass included) on
the real bench scenes:

  stage A (XLA plan)   — per-triangle patch-instance enumeration +
                         compaction into a flat instance table
                         (same scatter tricks as binning._gather_plan);
  stage B (Pallas)     — the patch-eval kernel: [8 instance, 128 lane]
                         blocks, per-lane edge/z/valid math identical to
                         _rasterize_chunk_core, NO winner selection
                         (one triangle per lane);
  stage C (XLA merge)  — winner per pixel: lexicographic multi-key sort
                         by (pixel, z, -id) + first-occurrence compaction
                         + unique-index scatter to images (the exact
                         production contract: min z, ties to larger id).

Faithfulness notes (the mxu_full_microbench lesson — baseline verbatim):
the baseline is the actual production call on the same inputs, prepass
and all; the patch path produces the SAME (ids, bc, z) contract and the
script verifies it (bit-equal ids away from capped/overflowed triangles,
which it counts and reports — on the bench scenes the cap is sized for
zero overflow).

Reference anchor: the bbox pixel scan this replaces is
/root/reference/src/mesh_renderer/kernels/rasterize_triangles.cpp:355-371
(and the soft analogue, soft_mesh_renderer/rasterize.py:309-418).

RESULT (v5e, 2026-08-20, sha bdbd8bf — full table in BENCH.md round 5):
bit-exact at both configs; eval kernel 1.86/7.18 ms (5-10x more
efficient per useful lane than production, confirming the occupancy
analysis) — but the winner merge costs 60.8/1649 ms (sort) and
142/2319 ms (scatter-min) against a production forward of 3.21/12.14 ms.
VERDICT: KILLED — on TPU hard rasterization is select-bound, not
eval-bound; composition through HBM costs 19-136x the whole kernel.

Usage:
  python scripts/patch_scatter_microbench.py [--config headline|stress]
         [--batch N] [--iters N] [--cap K] [--patch 16x8] [--interpret]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", choices=["headline", "stress"],
                        default="headline")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--windows", type=int, default=3)
    parser.add_argument("--cap", type=int, default=32,
                        help="max patch instances per triangle; beyond it "
                             "the triangle is dropped (counted)")
    parser.add_argument("--patch", type=str, default="16x8",
                        help="PHxPW with PH*PW == 128")
    parser.add_argument("--budget-factor", type=int, default=4,
                        help="instance-table budget = factor * T_pad")
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    ph, pw = (int(x) for x in args.patch.split("x"))
    assert ph * pw == 128, "patch must flatten to the 128-lane axis"

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    size = 512 if args.config == "stress" else 256
    sphere = 72 if args.config == "stress" else None
    scene = bench.build_scene(args.batch, size, sphere)
    tris = jnp.asarray(scene["triangles"], jnp.int32)

    from pytorch_mesh_renderer_tpu.ops import camera
    cams = camera.clip_space_transforms(
        scene["eye"], scene["center"], scene["up"],
        jnp.full([args.batch], 40.0), jnp.full([args.batch], 0.01),
        jnp.full([args.batch], 10.0), size, size)
    clip = camera.transform_homogeneous(cams, scene["vertices"])

    CAP = args.cap
    IC = 8  # instance rows per kernel block (f32 sublane quantum)

    # ---------------- stage A: patch-instance plan (XLA) ----------------

    def plan(tri_data):
        """[B, T_pad, 21] packed rows -> flat patch-instance table.

        Returns (table [B, S_pad, 24] = 21 packed cols + ox, oy, pad;
        inst_tri [B, S_pad] source triangle per instance (t_pad = dead);
        n_dropped [B] eligible triangles lost to cap/budget).
        """
        batch, t_pad, _ = tri_data.shape
        budget = -(-args.budget_factor * t_pad // IC) * IC

        def plan_one(td):
            live = td[:, 15] > 0.0
            # NDC bbox -> inclusive pixel-center bounds (conservative:
            # floor/ceil outward; stray lanes just fail `inside`).
            c_lo = jnp.floor((td[:, 16] + 1.0) * (size / 2) - 0.5)
            c_hi = jnp.ceil((td[:, 17] + 1.0) * (size / 2) - 0.5)
            r_lo = jnp.floor((td[:, 18] + 1.0) * (size / 2) - 0.5)
            r_hi = jnp.ceil((td[:, 19] + 1.0) * (size / 2) - 0.5)
            c_lo = jnp.clip(c_lo, 0, size - 1).astype(jnp.int32)
            c_hi = jnp.clip(c_hi, 0, size - 1).astype(jnp.int32)
            r_lo = jnp.clip(r_lo, 0, size - 1).astype(jnp.int32)
            r_hi = jnp.clip(r_hi, 0, size - 1).astype(jnp.int32)
            nx = pl.cdiv(c_hi - c_lo + 1, pw)
            ny = pl.cdiv(r_hi - r_lo + 1, ph)
            nspan = nx * ny
            eligible = live & (nspan > 0)
            keep = eligible & (nspan <= CAP)

            # Global compaction: exclusive cumsum of instance counts.
            counts = jnp.where(keep, nspan, 0)
            starts = jnp.cumsum(counts) - counts
            fits = starts + counts <= budget
            keep = keep & fits

            k = jnp.arange(CAP, dtype=jnp.int32)
            nx_safe = jnp.maximum(nx, 1)
            ox = c_lo[:, None] + (k[None] % nx_safe[:, None]) * pw
            oy = r_lo[:, None] + (k[None] // nx_safe[:, None]) * ph
            valid_k = keep[:, None] & (k[None] < nspan[:, None])
            # Unique destinations (see binning._gather_plan): valid slots
            # are distinct by construction; invalid ones get distinct OOB.
            oob = budget + jnp.arange(
                t_pad * CAP, dtype=jnp.int32).reshape(t_pad, CAP)
            dst = jnp.where(valid_k, starts[:, None] + k[None], oob)
            src_tri = jnp.broadcast_to(
                jnp.arange(t_pad, dtype=jnp.int32)[:, None], dst.shape)

            def scat(v, fill):
                return jnp.full((budget,), fill, v.dtype).at[
                    dst.reshape(-1)].set(v.reshape(-1), mode="drop",
                                         unique_indices=True)

            inst_tri = scat(src_tri, jnp.int32(t_pad))
            inst_ox = scat(ox.astype(jnp.float32), 0.0)
            inst_oy = scat(oy.astype(jnp.float32), 0.0)
            n_dropped = jnp.sum(eligible & ~keep)
            return inst_tri, inst_ox, inst_oy, n_dropped

        inst_tri, inst_ox, inst_oy, n_dropped = jax.vmap(plan_one)(tri_data)
        # Gather packed rows per instance (sentinel row: dead).
        sentinel = jnp.zeros((batch, 1, tri_data.shape[-1]), jnp.float32)
        ext = jnp.concatenate([tri_data, sentinel], axis=1)
        rows = jnp.take_along_axis(ext, inst_tri[..., None], axis=1)
        table = jnp.concatenate(
            [rows, inst_ox[..., None], inst_oy[..., None],
             jnp.zeros_like(inst_ox)[..., None]], axis=-1)  # [B, S, 24]
        return table, inst_tri, n_dropped

    # ---------------- stage B: patch-eval kernel (Pallas) ----------------

    def kernel(tab_ref, z_ref, w0_ref, w1_ref, w2_ref):
        data = tab_ref[0]  # [IC, 24]

        def col(c):
            return data[:, c].reshape(IC, 1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (IC, 128), 1)
        dx = (lane % pw).astype(jnp.float32)
        dy = (lane // pw).astype(jnp.float32)
        fx = col(21) + dx  # pixel column
        fy = col(22) + dy  # pixel row (NDC bottom-up, as production)
        px = (fx + 0.5) * (2.0 / size) - 1.0
        py = (fy + 0.5) * (2.0 / size) - 1.0
        e0 = col(0) * px + col(1) * py + col(2)
        e1 = col(3) * px + col(4) * py + col(5)
        e2 = col(6) * px + col(7) * py + col(8)
        min_e = jnp.minimum(jnp.minimum(e0, e1), e2)
        max_e = jnp.maximum(jnp.maximum(e0, e1), e2)
        inside = (min_e >= 0.0) & (max_e > 0.0)
        num = e0 * col(9) + e1 * col(10) + e2 * col(11)
        den = e0 * col(12) + e1 * col(13) + e2 * col(14)
        z = num / jnp.where(den != 0.0, den, 1.0)
        valid = (inside & (col(15) > 0.0) & (z >= -1.0) & (z <= 1.0)
                 & (fx < size) & (fy < size))
        wf = valid.astype(jnp.float32)
        z_ref[0] = jnp.where(valid, z, 2.0)
        w0_ref[0] = wf * e0
        w1_ref[0] = wf * e1
        w2_ref[0] = wf * e2

    def run_kernel(table):
        batch, s_pad, width = table.shape
        grid = (batch, s_pad // IC)
        tab_spec = pl.BlockSpec((1, IC, width), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, IC, 128), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        shapes = [jax.ShapeDtypeStruct((batch, s_pad, 128), jnp.float32)] * 4
        return pl.pallas_call(
            kernel, grid=grid, in_specs=[tab_spec], out_specs=[out_spec] * 4,
            out_shape=shapes, interpret=args.interpret)(table)

    # ---------------- stage C: winner merge (XLA) ----------------

    HW = size * size

    def merge(z, w0, w1, w2, inst_tri, inst_ox, inst_oy, t_pad):
        """Per-pixel winner (min z, ties to larger id) -> (ids, bc, z)."""
        batch, s_pad, _ = z.shape
        lane = jnp.arange(128, dtype=jnp.int32)
        fx = inst_ox.astype(jnp.int32)[..., None] + (lane % pw)[None, None]
        fy = inst_oy.astype(jnp.int32)[..., None] + (lane // pw)[None, None]
        pid = jnp.where(z < 2.0, fy * size + fx, HW)  # [B, S, 128]
        neg_id = -jnp.broadcast_to(inst_tri[..., None], pid.shape)

        n = s_pad * 128
        ops = jax.lax.sort(
            (pid.reshape(batch, n), z.reshape(batch, n),
             neg_id.reshape(batch, n), w0.reshape(batch, n),
             w1.reshape(batch, n), w2.reshape(batch, n)),
            dimension=1, num_keys=3)
        pid_s, z_s, nid_s, w0_s, w1_s, w2_s = ops
        first = (pid_s < HW) & jnp.concatenate(
            [jnp.ones((batch, 1), bool), pid_s[:, 1:] != pid_s[:, :-1]],
            axis=1)
        oob = HW + jnp.arange(n, dtype=jnp.int32)
        dst = jnp.where(first, pid_s, oob[None])

        def scatter_one(d, vals):
            out = jnp.zeros((HW, 4), jnp.float32).at[d].set(
                vals, mode="drop", unique_indices=True)
            return out

        vals = jnp.stack([(-nid_s).astype(jnp.float32), w0_s, w1_s, w2_s],
                         axis=-1)
        img = jax.vmap(scatter_one)(dst, vals)  # [B, HW, 4]
        wsum = img[..., 1] + img[..., 2] + img[..., 3]
        inv = 1.0 / jnp.where(wsum != 0.0, wsum, 1.0)
        bc = img[..., 1:4] * inv[..., None]
        covered = wsum != 0.0
        ids = jnp.where(covered, img[..., 0].astype(jnp.int32), 0)
        zimg = jax.vmap(lambda d, v: jnp.full((HW,), 1.0).at[d].set(
            v, mode="drop", unique_indices=True))(
                dst, jnp.where(z_s > 1.0, 1.0, z_s))
        return (ids.reshape(batch, size, size),
                bc.reshape(batch, size, size, 3),
                zimg.reshape(batch, size, size))

    def merge_scatter(z, w0, w1, w2, inst_tri, inst_ox, inst_oy, t_pad):
        """Scatter-min winner merge (the sort-free alternative).

        Three passes over the lane set: duplicate-index scatter-min of the
        sortable z key per pixel, duplicate-index scatter-max of the id
        among z-minimal lanes (production tie rule), then a unique-index
        payload scatter of the per-pixel winner. Same contract as `merge`;
        timed separately so the go/no-go covers both merge families.
        """
        batch, s_pad, _ = z.shape
        lane = jnp.arange(128, dtype=jnp.int32)
        fx = inst_ox.astype(jnp.int32)[..., None] + (lane % pw)[None, None]
        fy = inst_oy.astype(jnp.int32)[..., None] + (lane // pw)[None, None]
        valid = z < 2.0
        pid = jnp.where(valid, fy * size + fx, HW)  # [B, S, 128]
        tid = jnp.broadcast_to(inst_tri[..., None], pid.shape)
        # Monotone f32 -> i32 key (ascending float order; negatives map
        # below zero, -0.0 and +0.0 coincide at 0).
        zb = jax.lax.bitcast_convert_type(z, jnp.int32)
        int_min = jnp.int32(-2147483648)
        zkey = jnp.where(zb >= 0, zb, int_min - zb)
        big = jnp.iinfo(jnp.int32).max

        n = s_pad * 128
        pid_f = pid.reshape(batch, n)
        zkey_f = zkey.reshape(batch, n)
        tid_f = tid.reshape(batch, n)

        def one(pid_f, zkey_f, tid_f, z, w0, w1, w2):
            zmin = jnp.full((HW + 1,), big, jnp.int32).at[pid_f].min(zkey_f)
            at_min = zkey_f == zmin[pid_f]  # invalid lanes: pid=HW never min
            pid_min = jnp.where(at_min & (pid_f < HW), pid_f, HW)
            idmax = jnp.full((HW + 1,), -1, jnp.int32).at[pid_min].max(tid_f)
            winner = (pid_min < HW) & (tid_f == idmax[pid_min])
            oob = HW + jnp.arange(n, dtype=jnp.int32)
            dst = jnp.where(winner, pid_f, oob)
            vals = jnp.stack(
                [tid_f.astype(jnp.float32), w0.reshape(n), w1.reshape(n),
                 w2.reshape(n), jnp.minimum(z.reshape(n), 1.0)], axis=-1)
            img = jnp.zeros((HW, 5), jnp.float32).at[dst].set(
                vals, mode="drop", unique_indices=True)
            zimg = jnp.where(
                jnp.zeros((HW,), bool).at[dst].set(
                    True, mode="drop", unique_indices=True),
                img[:, 4], 1.0)
            return img, zimg

        img, zimg = jax.vmap(one)(pid_f, zkey_f, tid_f, z, w0, w1, w2)
        wsum = img[..., 1] + img[..., 2] + img[..., 3]
        inv = 1.0 / jnp.where(wsum != 0.0, wsum, 1.0)
        bc = img[..., 1:4] * inv[..., None]
        ids = jnp.where(wsum != 0.0, img[..., 0].astype(jnp.int32), 0)
        return (ids.reshape(batch, size, size),
                bc.reshape(batch, size, size, 3),
                zimg.reshape(batch, size, size))

    # ---------------- assemble + time ----------------

    chunk = rp.TRI_CHUNK
    pack = jax.jit(lambda cv: rp._pack_batched(cv, tris, chunk))
    tri_data = jax.block_until_ready(pack(clip))
    t_pad = tri_data.shape[1]

    plan_j = jax.jit(plan)
    kernel_j = jax.jit(run_kernel)
    merge_j = jax.jit(functools.partial(merge, t_pad=t_pad))
    merge_scatter_j = jax.jit(functools.partial(merge_scatter, t_pad=t_pad))

    def patch_end2end(cv):
        td = rp._pack_batched(cv, tris, chunk)
        table, inst_tri, n_dropped = plan(td)
        z, w0, w1, w2 = run_kernel(table)
        return merge(z, w0, w1, w2, inst_tri, table[..., 21],
                     table[..., 22], t_pad=t_pad), n_dropped

    patch_j = jax.jit(patch_end2end)
    prod_j = jax.jit(lambda cv: rp.rasterize_barycentric_pallas_batched(
        cv, tris, size, size, interpret=args.interpret))

    # Correctness first.
    _log("compiling production forward...")
    jax.block_until_ready(prod_j(clip))
    _log("production compiled; compiling patch plan...")
    jax.block_until_ready(plan_j(tri_data))
    _log("plan compiled; compiling patch end-to-end...")
    (ids_p, bc_p, z_p), n_dropped = jax.block_until_ready(patch_j(clip))
    _log("patch compiled")
    ids_r, bc_r, z_r = jax.block_until_ready(prod_j(clip))
    _log("correctness pass done")
    id_mismatch = int(jnp.sum(ids_p != ids_r))
    bc_err = float(jnp.max(jnp.abs(bc_p - bc_r)))
    z_err = float(jnp.max(jnp.abs(z_p - z_r)))
    dropped = int(jnp.sum(n_dropped))

    # Stage artifacts for the breakdown timings.
    table, inst_tri, _ = jax.block_until_ready(plan_j(tri_data))
    kouts = jax.block_until_ready(kernel_j(table))

    # Scatter-merge correctness (independent of the sort merge).
    ids_s, bc_s, z_s2 = jax.block_until_ready(merge_scatter_j(
        *kouts, inst_tri, table[..., 21], table[..., 22]))
    scatter_id_mismatch = int(jnp.sum(ids_s != ids_r))
    _log("scatter merge compiled + checked")

    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))
        dts = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            jax.block_until_ready(out)
            dts.append((time.perf_counter() - t0) / args.iters)
        return sorted(dts)[len(dts) // 2]

    _log("timing production...")
    t_prod = timeit(prod_j, clip)
    _log(f"prod {t_prod*1e3:.3f} ms; timing patch end2end...")
    t_patch = timeit(patch_j, clip)
    _log(f"patch {t_patch*1e3:.3f} ms; timing stages...")
    t_plan = timeit(plan_j, tri_data)
    t_kernel = timeit(kernel_j, table)
    t_merge = timeit(merge_j, *kouts, inst_tri, table[..., 21],
                     table[..., 22])
    t_merge_sc = timeit(merge_scatter_j, *kouts, inst_tri, table[..., 21],
                        table[..., 22])

    s_pad = table.shape[1]
    live_inst = int(jnp.sum(inst_tri < t_pad))
    print(json.dumps({
        "config": args.config, "size": size, "batch": args.batch,
        "mesh": scene["mesh_name"], "tris": scene["tri_count"],
        "patch": f"{ph}x{pw}", "cap": CAP,
        "instances_live": live_inst, "instances_padded": int(s_pad * args.batch),
        "capped_or_overflowed_triangles": dropped,
        "lane_evals_patch": int(s_pad * 128 * args.batch),
        "id_mismatch_px": id_mismatch, "bc_max_err": bc_err,
        "z_max_err": z_err,
        "prod_fwd_ms": round(t_prod * 1e3, 3),
        "patch_fwd_ms": round(t_patch * 1e3, 3),
        "patch_plan_ms": round(t_plan * 1e3, 3),
        "patch_kernel_ms": round(t_kernel * 1e3, 3),
        "patch_merge_sort_ms": round(t_merge * 1e3, 3),
        "patch_merge_scatter_ms": round(t_merge_sc * 1e3, 3),
        "scatter_id_mismatch_px": scatter_id_mismatch,
        "patch_vs_prod": round(t_prod / t_patch, 3),
    }))


if __name__ == "__main__":
    main()
