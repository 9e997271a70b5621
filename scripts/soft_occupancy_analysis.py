"""Estimate the lane-work reduction of sub-tile-height soft binning.

VERDICT r3 #4: the soft kernels' dense (chunk x 16x128-tile) blocks have
~0.2% valid-lane occupancy. This script measures, WITHOUT touching the
kernels, how much raw lane-work (sum over visits of chunk * strip_pixels)
a half-tile (8-row) gathered-segment decomposition removes vs the shipping
(16,128) plan, on the actual bench scenes. Run on CPU; pure prepass math.

Usage: python scripts/soft_occupancy_analysis.py [--size 128] [--stress]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--stress", action="store_true")
    p.add_argument("--blur", type=float, default=0.01)
    args = p.parse_args()
    if args.stress:
        args.size, args.batch = 512, 64

    import jax.numpy as jnp
    from bench import build_scene
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as hp
    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp
    from pytorch_mesh_renderer_tpu.ops import camera

    scene = build_scene(args.batch, args.size,
                        72 if args.stress else None)
    # Soft convention: CCW triangles (build_scene flips to CW for hard).
    tris = np.asarray(scene["triangles"])[:, ::-1].copy()
    cams = camera.clip_space_transforms(
        scene["eye"], scene["center"], scene["up"],
        jnp.full([args.batch], 40.0), jnp.full([args.batch], 0.01),
        jnp.full([args.batch], 10.0), args.size, args.size)
    clip = camera.transform_homogeneous(cams, scene["vertices"])
    packed = jnp.stack([
        sp._pack_triangle_data(clip[b], tris, scene["vertices"][b],
                               scene["normals"][b],
                               jnp.ones_like(scene["normals"][b]), args.blur)
        for b in range(args.batch)])

    H = W = args.size
    results = {}
    for name, tile_h in [("full16", 16), ("half8", 8)]:
        n_rows = -(-H // tile_h)
        n_cols = -(-W // sp.TILE_W)
        budget = hp._gather_budget_rows(packed.shape[1], n_rows * n_cols,
                                        sp.TRI_CHUNK)
        plan = hp._gather_plan(packed[:, :, 21:26], sp.TRI_CHUNK, W, H, 0,
                               H, budget, top_down=True, tile_h=tile_h,
                               tile_w=sp.TILE_W)
        gather_idx, keep, start_chunk, n_chunks = plan
        gathered_chunks = int(jnp.sum(n_chunks))
        # Legacy fallback: chunk-binned candidates over ~keep triangles,
        # visited on full 16-row tiles regardless of the gathered tile_h.
        table, _ = hp._build_tables(packed, None, plan, live_col=21,
                                    with_id=False)
        s_rows = plan[0].shape[1]
        _, counts = hp._bin_chunks(table[:, s_rows:], sp.TRI_CHUNK, W, H, 0,
                                   H, live_col=21, top_down=True,
                                   tile_h=16, tile_w=sp.TILE_W)
        legacy_chunks = int(jnp.sum(counts))
        lanes = (gathered_chunks * sp.TRI_CHUNK * tile_h * sp.TILE_W +
                 legacy_chunks * sp.TRI_CHUNK * 16 * sp.TILE_W)
        n_legacy_tris = int(jnp.sum(~keep & (packed[:, :, 21] > 0)))
        results[name] = (gathered_chunks, legacy_chunks, lanes,
                         n_legacy_tris)
        print(f"{name}: tile_h={tile_h} gathered_chunk_visits="
              f"{gathered_chunks} legacy_chunk_visits={legacy_chunks} "
              f"legacy_tris={n_legacy_tris} total_lane_work={lanes:,}")

    full = results["full16"][2]
    half = results["half8"][2]
    print(f"half-tile lane-work ratio: {half / full:.3f} "
          f"(projected kernel-bound speedup ~{full / half:.2f}x)")


if __name__ == "__main__":
    import jax
    main()
