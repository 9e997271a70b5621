"""Standalone fused-forward micro-benchmark (stress-config ablations).

Times ONLY jitted rasterize_interpolate_pallas_batched on the bench's
stress scene — the stage where the round-4 hard chunk-path regression
lives (r3 284.9 ms vs round-4 343.8 ms at batch 64, 512^2, sphere72;
scripts/regression_bisect.sh + profile_breakdown attribution, BENCH.md).
A full bench run takes ~10 min; this gives one number in ~2 min so kernel
ablations can be swept quickly.

Usage: python scripts/fused_fwd_microbench.py [--batch 64] [--size 512]
       [--sphere-resolution 72] [--iters 20] [--bwd]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--sphere-resolution", type=int, default=72)
    parser.add_argument("--teapot", action="store_true")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--bwd", action="store_true",
                        help="time value_and_grad of a bc+attr loss instead")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pytorch_mesh_renderer_tpu.ops import camera
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    scene = bench.build_scene(args.batch, args.size,
                              None if args.teapot else args.sphere_resolution)
    size = args.size
    batch = scene["vertices"].shape[0]
    cams = camera.clip_space_transforms(
        scene["eye"], scene["center"], scene["up"],
        jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), size, size)
    clip = camera.transform_homogeneous(cams, scene["vertices"])
    attrs = jnp.concatenate(
        [scene["normals"], scene["vertices"], scene["diffuse"]], axis=2)

    def fwd(clip, attrs):
        return rp.rasterize_interpolate_pallas_batched(
            clip, attrs, scene["triangles"], size, size)

    if args.bwd:
        def loss(clip, attrs):
            ids, bc, ai = fwd(clip, attrs)
            return jnp.sum(bc) + jnp.sum(ai * ai)

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(fwd)

    out = fn(clip, attrs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(clip, attrs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "stage": "fused_bwd" if args.bwd else "fused_fwd",
        "ms": round(dt * 1e3, 3), "batch": batch, "size": size,
        "tri_count": int(scene["triangles"].shape[0]),
        "attr_col": rp._ATTR_COL,
    }))


if __name__ == "__main__":
    main()
