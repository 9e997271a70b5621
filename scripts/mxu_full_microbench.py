"""Full per-visit pipeline: pixel-major MXU core vs production core.

Companion to scripts/mxu_edge_microbench.py (which isolated the affine
eval stage and measured the bf16x6 dot 2.44x faster at chunk 8). This
script answers the integration go/no-go: does the win survive once the
WHOLE per-visit pipeline — inside/valid tests, z divide, winner
selection, carry merge — runs in the dot's pixel-major frame?

  * prod — the production path verbatim: _rasterize_chunk_core +
    _merge_better on [C, TILE_H, TILE_W] triangle-major blocks, positional
    ids, the exact shipped carry structure (best_z, best_id, we0..2).
  * mxu  — [5C, 3] @ [3, 2048] bf16x6 dot, then the same masking/winner
    math on [C, 2048] pixel-major blocks: sublane reductions over C to
    [1, 2048] carries, ids from iota, merge identical in structure.

Both kernels produce (z, id, we0, we1, we2) images; the script reports
timing plus the id-mismatch pixel count and max |z| gap — the measure of
how much bf16x6 edge rounding perturbs knife-edge winner decisions (the
parity-tolerance question for production adoption).

Fidelity caveat (ADVICE r4): kernel_mxu's `valid` omits the production
live-flag test (`col(15) > 0.0` in _rasterize_chunk_core) — harmless for
this A/B because the synthetic table sets col 15 = 1 everywhere, but it
means the mxu side is measured slightly LIGHTER than a faithful port
(one fewer compare/and per visit). Since the mxu variant already loses
(0.94-0.96x), adding the test could only widen the loss.

Usage: python scripts/mxu_full_microbench.py [--visits 512] [--iters 30]
       [--chunk 8] [--interpret]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

TILE_H = 16
TILE_W = 128
N_PIX = TILE_H * TILE_W


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--visits", type=int, default=512)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    C = args.chunk
    visits = args.visits
    rng = np.random.default_rng(0)

    # Synthetic table, production layout cols 0-15 (edge coeffs, vz, vw,
    # live=1). Coefficients scaled so a realistic fraction of (tri, px)
    # lanes pass the inside test.
    data = rng.uniform(-1.0, 1.0, size=(visits * C, 16)).astype(np.float32)
    data[:, 0:9] *= 2.0
    data[:, 15] = 1.0

    m = data.reshape(visits, C, 16)
    a = m[:, :, 0:9].reshape(visits, C, 3, 3)
    num_c = np.einsum("vcek,vce->vck", a, m[:, :, 9:12])
    den_c = np.einsum("vcek,vce->vck", a, m[:, :, 12:15])
    # Edge-major row order (e0 x C, e1 x C, e2 x C) so the kernel's
    # out[k*C:(k+1)*C] sublane slices select one edge across the chunk.
    coeff = np.concatenate(
        [a.transpose(0, 2, 1, 3).reshape(visits, C * 3, 3), num_c, den_c],
        axis=1)
    coeff = np.pad(coeff, [(0, 0), (0, 0), (0, 5)])
    coeff = coeff.reshape(visits * 5 * C, 8).astype(np.float32)

    def kernel_prod(tri_ref, z_ref, id_ref, w0_ref, w1_ref, w2_ref):
        r = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        c = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        px = (c + 0.5) * (2.0 / 512) - 1.0
        py = (r + 0.5) * (2.0 / 512) - 1.0

        def visit(i, carry):
            d = tri_ref[pl.ds(i * C, C), :]
            ids = i * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1), 0)
            best_z, best_id, b0, b1, b2 = carry
            cz, cid, w0, w1, w2 = rp._rasterize_chunk_core(d, px, py, C, ids)
            better = rp._merge_better(cz, cid, best_z, best_id)
            return (jnp.where(better, cz, best_z),
                    jnp.where(better, cid, best_id),
                    jnp.where(better, w0.sum(0), b0),
                    jnp.where(better, w1.sum(0), b1),
                    jnp.where(better, w2.sum(0), b2))

        init = (jnp.full((TILE_H, TILE_W), 2.0),
                jnp.full((TILE_H, TILE_W), -1, jnp.int32),
                jnp.zeros((TILE_H, TILE_W)), jnp.zeros((TILE_H, TILE_W)),
                jnp.zeros((TILE_H, TILE_W)))
        z, i_, w0, w1, w2 = jax.lax.fori_loop(0, visits, visit, init)
        z_ref[...], id_ref[...] = z, i_
        w0_ref[...], w1_ref[...], w2_ref[...] = w0, w1, w2

    def kernel_mxu(coef_ref, z_ref, id_ref, w0_ref, w1_ref, w2_ref):
        c = jax.lax.broadcasted_iota(
            jnp.int32, (3, N_PIX), 1).astype(jnp.float32)
        px = (c % TILE_W + 0.5) * (2.0 / 512) - 1.0
        py = (jnp.floor_divide(c, TILE_W) % TILE_H + 0.5) * (2.0 / 512) - 1.0
        one = jnp.ones((3, N_PIX), jnp.float32)
        sel = jax.lax.broadcasted_iota(jnp.int32, (3, N_PIX), 0)
        p = jnp.where(sel == 0, px, jnp.where(sel == 1, py, one))  # [3,N_PIX]

        def visit(i, carry):
            best_z, best_id, b0, b1, b2 = carry
            cf = coef_ref[pl.ds(i * 5 * C, 5 * C), 0:3]            # [5C, 3]
            out = jax.lax.dot_general(
                cf, p, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)                # [5C,N_PIX]
            e0, e1 = out[0:C], out[C:2 * C]
            e2, num, den = out[2 * C:3 * C], out[3 * C:4 * C], out[4 * C:]
            min_e = jnp.minimum(jnp.minimum(e0, e1), e2)
            max_e = jnp.maximum(jnp.maximum(e0, e1), e2)
            inside = (min_e >= 0.0) & (max_e > 0.0)
            z = num / jnp.where(den != 0.0, den, 1.0)
            valid = inside & (z >= -1.0) & (z <= 1.0)
            ids = i * C + jax.lax.broadcasted_iota(jnp.int32, (C, N_PIX), 0)
            z_masked = jnp.where(valid, z, 2.0)
            cz = jnp.min(z_masked, axis=0, keepdims=True)          # [1,N_PIX]
            at_min = valid & (z_masked == cz)
            cid = jnp.max(jnp.where(at_min, ids, -1), axis=0,
                          keepdims=True)
            winner = at_min & (ids == cid)
            wf = winner.astype(jnp.float32)
            w0 = jnp.sum(wf * e0, axis=0, keepdims=True)
            w1 = jnp.sum(wf * e1, axis=0, keepdims=True)
            w2 = jnp.sum(wf * e2, axis=0, keepdims=True)
            better = (cz < best_z) | ((cz == best_z) & (cid > best_id))
            return (jnp.where(better, cz, best_z),
                    jnp.where(better, cid, best_id),
                    jnp.where(better, w0, b0),
                    jnp.where(better, w1, b1),
                    jnp.where(better, w2, b2))

        init = (jnp.full((1, N_PIX), 2.0),
                jnp.full((1, N_PIX), -1, jnp.int32),
                jnp.zeros((1, N_PIX)), jnp.zeros((1, N_PIX)),
                jnp.zeros((1, N_PIX)))
        z, i_, w0, w1, w2 = jax.lax.fori_loop(0, visits, visit, init)
        z_ref[...], id_ref[...] = z, i_
        w0_ref[...], w1_ref[...], w2_ref[...] = w0, w1, w2

    interp = args.interpret
    f32 = jnp.float32

    prod = jax.jit(lambda t: pl.pallas_call(
        kernel_prod,
        out_shape=[jax.ShapeDtypeStruct((TILE_H, TILE_W), f32),
                   jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.int32)] +
                  [jax.ShapeDtypeStruct((TILE_H, TILE_W), f32)] * 3,
        interpret=interp)(t))
    mxu = jax.jit(lambda cf: pl.pallas_call(
        kernel_mxu,
        out_shape=[jax.ShapeDtypeStruct((1, N_PIX), f32),
                   jax.ShapeDtypeStruct((1, N_PIX), jnp.int32)] +
                  [jax.ShapeDtypeStruct((1, N_PIX), f32)] * 3,
        interpret=interp)(cf))

    jdata = jnp.asarray(data)
    jcoeff = jnp.asarray(coeff)

    res_p = jax.block_until_ready(prod(jdata))
    res_m = jax.block_until_ready(mxu(jcoeff))
    id_p = np.asarray(res_p[1]).reshape(-1)
    id_m = np.asarray(res_m[1]).reshape(-1)
    z_p = np.asarray(res_p[0]).reshape(-1)
    z_m = np.asarray(res_m[0]).reshape(-1)

    results = {
        "covered_px": int((id_p >= 0).sum()),
        "id_mismatch_px": int((id_p != id_m).sum()),
        "max_abs_z_gap": float(np.max(np.abs(z_p - z_m))),
    }
    for name, fn, arg in (("prod", prod, jdata), ("mxu", mxu, jcoeff)):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(arg)
        jax.block_until_ready(out)
        results[name + "_us"] = round(
            (time.perf_counter() - t0) / args.iters * 1e6, 2)
    results.update(chunk=C, visits=visits, interpret=bool(interp),
                   speedup=round(results["prod_us"] / results["mxu_us"], 3))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
