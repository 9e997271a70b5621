"""Measure multi-pass overhead vs the streamed single-kernel bound.

VERDICT r2 next-#5 asks either for an in-kernel streamed triangle table
(HBM-resident, DMA-chunked) or a measurement showing the existing
multi-pass scheme is already within ~10% of the streamed bound. This
script produces that measurement on the 100k-triangle sphere:

  t_full     full fwd+bwd step with automatic multi-pass (P passes)
  t_slice_p  full fwd+bwd step on pass p's triangle slice ALONE
             (its own pack + bin + kernels + dispatch)

The streamed bound is >= sum_p(t_slice_p) minus (P-1) dispatch floors: a
single streamed kernel still executes every pass's binned (tile, chunk)
pairs and reads the same table bytes from HBM (VMEM can't hold them by
construction); it saves only the extra dispatches, the per-pass XLA merge,
and any prepass duplication. So

  overhead = t_full - sum_p(t_slice_p) + (P-1) * t_noop

is the total the streaming rewrite could reclaim; overhead / t_full is the
headline fraction.

Usage: python scripts/multipass_overhead.py [--soft] [--resolution 224]
       [--size 256] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / iters)
    return sorted(dts)[1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--resolution", type=int, default=224,
                        help="UV-sphere resolution (224 ~= 100k tris)")
    parser.add_argument("--soft", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pytorch_mesh_renderer_tpu.models import mesh_renderer
    from pytorch_mesh_renderer_tpu.models import soft_mesh_renderer

    size = args.size
    scene = bench.build_scene(args.batch, size, args.resolution)

    if args.soft:
        from pytorch_mesh_renderer_tpu import config as config_lib
        from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as mod
        size = min(size, 128)
        n_tri = scene["triangles"].shape[0]
        cap = mod._max_pass_triangles(mod._resolve_binning(
            config_lib.SOFT_CONFIG.binning, n_tri))
        triangles = scene["triangles"][:, ::-1].copy()  # CCW

        def make_step(tris):
            def loss_fn(vertices):
                images = soft_mesh_renderer.render(
                    vertices, tris, scene["diffuse"], scene["eye"],
                    scene["center"], scene["up"], scene["lights"][..., :3],
                    scene["intensities"][..., 0], size, size)
                return jnp.mean(images[..., 3] ** 2)
            return jax.jit(jax.value_and_grad(loss_fn))
    else:
        from pytorch_mesh_renderer_tpu import config as config_lib
        from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as mod
        cap = mod._max_pass_triangles(mod._resolve_binning(
            config_lib.HARD_CONFIG.binning))
        triangles = scene["triangles"]

        def make_step(tris):
            def loss_fn(vertices):
                images = mesh_renderer.render(
                    vertices, tris, scene["normals"], scene["diffuse"],
                    scene["eye"], scene["center"], scene["up"],
                    scene["lights"], scene["intensities"], size, size)
                return jnp.mean(images[..., :3] ** 2)
            return jax.jit(jax.value_and_grad(loss_fn))

    n_tri = triangles.shape[0]
    slices = [(s, min(s + cap, n_tri)) for s in range(0, n_tri, cap)]
    print(f"{n_tri} triangles, {len(slices)} passes (cap {cap})", flush=True)

    t_full = time_fn(make_step(triangles), scene["vertices"],
                     iters=args.iters)
    print(f"full multi-pass step: {t_full * 1e3:8.3f} ms", flush=True)

    t_slices = []
    for s, e in slices:
        t = time_fn(make_step(triangles[s:e]), scene["vertices"],
                    iters=args.iters)
        t_slices.append(t)
        print(f"  slice [{s}:{e}]: {t * 1e3:8.3f} ms", flush=True)

    noop = jax.jit(lambda v: v + 1.0)
    t_noop = time_fn(noop, scene["vertices"], iters=args.iters)
    overhead = t_full - sum(t_slices) + (len(slices) - 1) * t_noop
    print(f"dispatch floor: {t_noop * 1e3:.3f} ms", flush=True)
    print(json.dumps({
        "mode": "soft" if args.soft else "hard",
        "tri_count": int(n_tri),
        "passes": len(slices),
        "full_ms": round(t_full * 1e3, 3),
        "slice_ms": [round(t * 1e3, 3) for t in t_slices],
        "noop_ms": round(t_noop * 1e3, 3),
        "reclaimable_ms": round(overhead * 1e3, 3),
        "reclaimable_frac": round(overhead / t_full, 4),
    }))


if __name__ == "__main__":
    main()
