"""MXU-vs-VPU edge-function evaluation microbench (VERDICT r3 weak #5).

CAUTION — superseded for go/no-go decisions by mxu_full_microbench.py:
this script times the eval stage behind an additive reduction fold whose
cost distorts the VPU baseline ~2.4x (BENCH.md "MXU edge-function
offload"); the full-pipeline A/B there measured the dot variant a 4-6%
LOSS at both shipped chunk sizes. Kept for the per-precision dot numbers.
Note when comparing per-dot numbers ACROSS the two scripts: this script's
dot contracts the full K-padded [5C, 8] rows (5 zero K-rows), while
mxu_full_microbench.py slices to K=3 — the dots are not the same
contraction, so cross-script per-dot deltas confound K-padding cost.

The hard kernels' per-visit hot path evaluates five affine functions of the
pixel coordinates per triangle — e0, e1, e2 (edge/barycentric numerators)
and the depth numerator/denominator (num = sum e_i*vz_i, den = sum
e_i*vw_i, themselves affine because the e_i are) — as broadcast FMAs on
the VPU over [chunk, TILE_H, TILE_W] lane blocks
(ops/rasterize_pallas.py:_rasterize_chunk_core). BENCH.md's roofline says
the 512^2 stress step sustains ~3/4 of the v5e VPU's f32 FMA rate, so the
only untried lever left in this decomposition family is moving those FMAs
off the VPU entirely: all five functions are one contraction

    [5*chunk, 3] @ [3, TILE_H*TILE_W]  (coeff rows x homogeneous pixels)

which the MXU could absorb, leaving the VPU only the inside/valid/winner
masking. This script times JUST the contraction stage both ways inside
otherwise-identical Pallas kernels (visit loop over a VMEM table, additive
f32 accumulator so nothing dead-codes), for the dot at both Mosaic-legal
precisions:

  * vpu        — production formulation: broadcast FMAs, [C, TH, TW].
  * mxu_bf16   — Precision.DEFAULT single-pass bf16 dot. NOT
                 production-usable for coverage: bf16 rounds the pixel
                 coordinate to 8 mantissa bits, so near-edge inside tests
                 (e >= 0) misclassify pixels and break the Pallas==XLA
                 parity invariant. Timed as the upper bound of the lever.
  * mxu_bf16x6 — Precision.HIGHEST (bf16x6 passes), the only
                 parity-plausible MXU route (Mosaic rejects HIGH).

Interpretation guide: the contraction is ~1/3 of the per-visit VPU issue
count (the rest is inside/valid/z-divide/winner masking, which stays on
the VPU in any formulation), so a dot that costs the same as or more than
the FMA stage kills the idea; even a free dot caps the end-to-end kernel
win at ~1.3x before relayout costs (the dot's pixel-major output must be
re-laid-out or the winner pipeline rewritten pixel-major).

Usage: python scripts/mxu_edge_microbench.py [--visits 512] [--iters 30]
       [--chunk 8] [--interpret]
"""

import argparse
import functools
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
    parser.add_argument("--visits", type=int, default=512,
                        help="table chunks visited per kernel invocation")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--chunk", type=int, default=8,
                        help="triangles per visit (stress ships 8)")
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    import jax
    if args.interpret:
        # Parity-check mode must not touch (or queue behind) the TPU;
        # sitecustomize clobbers JAX_PLATFORMS, so set the config directly.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    C = args.chunk
    visits = args.visits
    rng = np.random.default_rng(0)

    # Per-triangle data rows, production layout: cols 0-8 edge coeffs
    # (a,b,c per edge), 9-11 vz, 12-14 vw (ops/rasterize_pallas.py
    # _pack_triangle_data). Values in the NDC-ish range the kernels see.
    data = rng.uniform(-2.0, 2.0, size=(visits * C, 16)).astype(np.float32)

    # The same rows refactored for the contraction: [visits*5C, 8] —
    # per visit a [5C, 3] coefficient block (rows: e0,e1,e2,num,den per
    # triangle; num/den coeffs are the vz/vw-folded edge coeffs), padded
    # K 3 -> 8 for sublane alignment.
    m = data.reshape(visits, C, 16)
    a = m[:, :, 0:9].reshape(visits, C, 3, 3)        # [V, C, edge, (a,b,c)]
    vz = m[:, :, 9:12]
    vw = m[:, :, 12:15]
    num_c = np.einsum("vcek,vce->vck", a, vz)        # [V, C, 3]
    den_c = np.einsum("vcek,vce->vck", a, vw)
    coeff = np.concatenate(
        [a.reshape(visits, C * 3, 3), num_c, den_c], axis=1)  # [V, 5C, 3]
    coeff = np.pad(coeff, [(0, 0), (0, 0), (0, 5)])           # K pad -> 8
    coeff = coeff.reshape(visits * 5 * C, 8).astype(np.float32)

    # Homogeneous pixel matrix [8, N_PIX]: rows (x, y, 1, 0*5).
    cols = np.arange(TILE_W, dtype=np.float32)
    rows = np.arange(TILE_H, dtype=np.float32)
    px = np.tile((cols + 0.5) * (2.0 / 512) - 1.0, TILE_H)
    py = np.repeat((rows + 0.5) * (2.0 / 512) - 1.0, TILE_W)
    pix = np.zeros((8, N_PIX), np.float32)
    pix[0], pix[1], pix[2] = px, py, 1.0

    def kernel_vpu(tri_ref, acc_ref):
        # Pixel coords from iota, as production _strip_pixel_coords does.
        r = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        c = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        pxv = jnp.broadcast_to(
            (c + 0.5) * (2.0 / 512) - 1.0, (C, TILE_H, TILE_W))
        pyv = jnp.broadcast_to(
            (r + 0.5) * (2.0 / 512) - 1.0, (C, TILE_H, TILE_W))

        def visit(i, acc):
            d = tri_ref[pl.ds(i * C, C), :]

            def col(k):
                return d[:, k].reshape(C, 1, 1)

            e0 = col(0) * pxv + col(1) * pyv + col(2)
            e1 = col(3) * pxv + col(4) * pyv + col(5)
            e2 = col(6) * pxv + col(7) * pyv + col(8)
            num = e0 * col(9) + e1 * col(10) + e2 * col(11)
            den = e0 * col(12) + e1 * col(13) + e2 * col(14)
            return acc + jnp.sum(e0 + e1 + e2 + num + den, axis=0)

        acc_ref[...] = jax.lax.fori_loop(
            0, visits, visit, jnp.zeros((TILE_H, TILE_W), jnp.float32))

    def kernel_mxu(coef_ref, pix_ref, acc_ref, *, precision):
        p = pix_ref[...]  # [8, N_PIX]

        def visit(i, acc):
            cf = coef_ref[pl.ds(i * 5 * C, 5 * C), :]          # [5C, 8]
            out = jax.lax.dot_general(
                cf, p, (((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)            # [5C, N_PIX]
            # Fold the 5C rows; the accumulator stays pixel-flat
            # ([1, N_PIX]) so no per-visit relayout is charged — the
            # production integration would likewise keep the whole
            # masking pipeline in the dot's pixel-major frame.
            return acc + jnp.sum(out, axis=0, keepdims=True)

        acc_ref[...] = jax.lax.fori_loop(
            0, visits, visit, jnp.zeros((1, N_PIX), jnp.float32))

    interp = args.interpret

    vpu = jax.jit(lambda t: pl.pallas_call(
        kernel_vpu,
        out_shape=jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.float32),
        interpret=interp)(t))

    def mxu(precision):
        return jax.jit(lambda cf, p: pl.pallas_call(
            functools.partial(kernel_mxu, precision=precision),
            out_shape=jax.ShapeDtypeStruct((1, N_PIX), jnp.float32),
            interpret=interp)(cf, p))

    jdata = jnp.asarray(data)
    jcoeff = jnp.asarray(coeff)
    jpix = jnp.asarray(pix)

    variants = {
        "vpu": lambda: vpu(jdata),
        "mxu_bf16": (lambda f=mxu(jax.lax.Precision.DEFAULT):
                     f(jcoeff, jpix)),
        "mxu_bf16x6": (lambda f=mxu(jax.lax.Precision.HIGHEST):
                       f(jcoeff, jpix)),
    }

    results = {}
    ref = None
    for name, fn in variants.items():
        out = jax.block_until_ready(fn())
        flat = np.asarray(out).reshape(-1)
        if ref is None:
            ref = flat
        else:  # bf16x6 tracks f32 closely; bf16 drifts — report both
            err = float(np.max(np.abs(flat - ref))
                        / max(1e-9, float(np.max(np.abs(ref)))))
            results[name + "_relerr"] = round(err, 8)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        results[name + "_us"] = round(dt * 1e6, 2)

    results.update(chunk=C, visits=visits, tile=[TILE_H, TILE_W],
                   interpret=bool(interp))
    if "vpu_us" in results and "mxu_bf16x6_us" in results:
        results["mxu_bf16x6_speedup"] = round(
            results["vpu_us"] / results["mxu_bf16x6_us"], 3)
        results["mxu_bf16_speedup"] = round(
            results["vpu_us"] / results["mxu_bf16_us"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
