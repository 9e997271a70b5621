"""Time the hard chunk-mode XLA prepass stages in isolation (stress scene).

Decomposes the ~61 ms/step prepass+concat cost inferred from the
regression A/B (BENCH.md round-4): pack, bbox hit matrix, candidate
compaction (old argsort vs new cumsum-scatter), and the combined-table
concat. Each stage is jitted standalone; inputs are device-resident.

Usage: python scripts/prepass_microbench.py [--batch 64] [--size 512]
       [--sphere-resolution 72] [--iters 30]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--sphere-resolution", type=int, default=72)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pytorch_mesh_renderer_tpu.ops import camera
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    scene = bench.build_scene(args.batch, args.size, args.sphere_resolution)
    size = args.size
    batch = scene["vertices"].shape[0]
    cams = camera.clip_space_transforms(
        scene["eye"], scene["center"], scene["up"],
        jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), size, size)
    clip = camera.transform_homogeneous(cams, scene["vertices"])
    attrs = jnp.concatenate(
        [scene["normals"], scene["vertices"], scene["diffuse"]], axis=2)
    tris = scene["triangles"]
    chunk = rp._fused_chunk_for(tris.shape[0])
    a_pad = rp._pad_attr_count(attrs.shape[-1])

    pack = jax.jit(lambda c: rp._pack_batched(c, tris, chunk))
    tri_data = pack(clip)
    attr_pack = jax.jit(functools.partial(
        rp._pack_corner_attributes, triangles=tris, a_pad=a_pad,
        n_tri_padded=tri_data.shape[1]))
    attr_packed = attr_pack(attrs)

    hits = jax.jit(lambda td: rp._bin_hits(
        td[:, :, 15:20], chunk, size, size, 0, size))
    hit = hits(tri_data)
    argsort_c = jax.jit(
        lambda h: jnp.argsort(~h, axis=-1, stable=True).astype(jnp.int32))

    def _compact_scatter(h):
        # The rejected cumsum+scatter compaction (measured 70.8 ms vs the
        # argsort's 12.4 ms on this matrix, 2026-08-19) — kept here so the
        # comparison stays reproducible.
        n = h.shape[-1]
        flat = h.reshape(-1, n)
        ar = jnp.arange(n, dtype=jnp.int32)
        pos = jnp.where(flat, jnp.cumsum(flat, -1, dtype=jnp.int32) - 1,
                        n + ar[None])
        rows = jnp.arange(flat.shape[0], dtype=jnp.int32)[:, None]
        cand = jnp.zeros(flat.shape, jnp.int32).at[rows, pos].set(
            jnp.broadcast_to(ar[None], flat.shape), mode="drop",
            unique_indices=True)
        return cand.reshape(h.shape)

    scatter_c = jax.jit(_compact_scatter)
    concat = jax.jit(
        lambda td, ap: jnp.concatenate([td[:, :, :rp._COLS], ap], axis=2))

    res = {
        "pack_ms": round(_time(pack, clip, iters=args.iters), 3),
        "attr_pack_ms": round(_time(attr_pack, attrs, iters=args.iters), 3),
        "bin_hits_ms": round(_time(hits, tri_data, iters=args.iters), 3),
        "compact_argsort_ms": round(_time(argsort_c, hit,
                                          iters=args.iters), 3),
        "compact_scatter_ms": round(_time(scatter_c, hit,
                                          iters=args.iters), 3),
        "concat_table_ms": round(_time(concat, tri_data, attr_packed,
                                       iters=args.iters), 3),
        "batch": batch, "size": size, "chunk": chunk,
        "n_chunks": int(hit.shape[-1]),
        "tri_count": int(tris.shape[0]),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
