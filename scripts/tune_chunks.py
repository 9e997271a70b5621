"""Chunk-size sweep for the gathered-binning Pallas kernels.

Gathered binning decouples the compute chunk from the binning granularity
(chunk-union bbox slack is gone), so the r2/r3 tuned values — hard 16
(<4096 tris) / 8 (>=4096), soft 8 — were tuned for a trade-off that no
longer exists: under the gathered plan a bigger chunk only costs per-tile
segment padding (count rounds up to a chunk multiple) while saving loop
iterations. This script re-times the bench steps across chunk sizes.

CPU-measured pair counts (2026-08-18, gathered plan, zero legacy overflow
on the teapot configs): lane work (pairs*chunk) is nearly FLAT in chunk —
headline 12.9k->13.8k lanes from chunk 4->32, soft-128 5.7k->5.9k, stress
+22% over the same range — while the per-chunk iteration count halves per
doubling. Segment padding is thus almost free and larger chunks amortize
the per-iteration flush: sweep 8/16/32/64, expect >=32 to win on the
teapot configs and 16-32 on stress (where padding costs more).

Usage: python scripts/tune_chunks.py [--soft] [--stress] [--iters 30]
One TPU job at a time (see CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(step, args_, iters):
    import jax
    out = step(*args_)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args_)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--soft", action="store_true")
    parser.add_argument("--stress", action="store_true")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--chunks", type=int, nargs="*",
                        default=[8, 16, 32])
    parser.add_argument("--tile-h", type=int, default=None,
                        help="override TILE_H (exact binning may favor "
                             "8 where chunk-union slack favored 16)")
    parser.add_argument("--size", type=int, default=None,
                        help="override the image size (CPU smoke tests)")
    parser.add_argument("--batch", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pytorch_mesh_renderer_tpu.models import mesh_renderer
    from pytorch_mesh_renderer_tpu.models import soft_mesh_renderer
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp
    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp

    if args.stress:
        batch, size, sphere = 64, 512, 72
    else:
        batch, size, sphere = 4, (128 if args.soft else 256), None
    if args.size:
        size = args.size
    if args.batch:
        batch = args.batch
    scene = bench.build_scene(batch, size, sphere)

    if args.tile_h:
        rp.TILE_H = args.tile_h
        sp.TILE_H = args.tile_h

    results = {}
    for chunk in args.chunks:
        if args.soft:
            sp.TRI_CHUNK = chunk
            triangles = scene["triangles"][:, ::-1].copy()

            def loss_fn(vertices):
                images = soft_mesh_renderer.render(
                    vertices, triangles, scene["diffuse"], scene["eye"],
                    scene["center"], scene["up"], scene["lights"][..., :3],
                    scene["intensities"][..., 0], size, size)
                return jnp.mean(images[..., 3] ** 2)
        else:
            rp.TRI_CHUNK = chunk
            rp.BWD_TRI_CHUNK = chunk
            rp.FUSED_TRI_CHUNK = chunk
            rp.FUSED_TRI_CHUNK_LARGE = chunk
            triangles = scene["triangles"]

            def loss_fn(vertices):
                images = mesh_renderer.render(
                    vertices, triangles, scene["normals"], scene["diffuse"],
                    scene["eye"], scene["center"], scene["up"],
                    scene["lights"], scene["intensities"], size, size)
                return jnp.mean(images[..., :3] ** 2)

        step = jax.jit(jax.value_and_grad(loss_fn))
        try:
            dt = time_step(step, (scene["vertices"],), args.iters)
        except Exception as e:  # keep sweeping: one Mosaic/VMEM failure
            results[chunk] = None  # must not cost the remaining points
            print(f"chunk {chunk:3d}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
            continue
        rps = batch / dt
        results[chunk] = round(rps, 1)
        print(f"chunk {chunk:3d}: {dt * 1e3:8.3f} ms/step "
              f"({rps:8.1f} renders/s)", flush=True)

    print(json.dumps({"mode": "soft" if args.soft else "hard",
                      "stress": args.stress, "renders_per_sec": results}))


if __name__ == "__main__":
    main()
