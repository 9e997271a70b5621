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
    p.add_argument("--hard", action="store_true",
                   help="analyze the HARD kernels (fwd gathered + bwd "
                        "winner segments) instead of the soft kernels")
    p.add_argument("--blur", type=float, default=0.01)
    args = p.parse_args()
    if args.stress:
        # Keep an explicit --batch override (the per-mesh binning structure
        # is batch-independent; a smaller batch keeps the CPU-side id-image
        # render for the bwd analysis tractable).
        args.size = 512
        if args.batch == 4:
            args.batch = 64
    if args.hard:
        return main_hard(args)

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


def main_hard(args):
    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as hp
    from pytorch_mesh_renderer_tpu.ops import rasterize_xla
    from pytorch_mesh_renderer_tpu.ops import camera

    scene = build_scene(args.batch, args.size,
                        72 if args.stress else None)
    tris = np.asarray(scene["triangles"])  # CW already
    cams = camera.clip_space_transforms(
        scene["eye"], scene["center"], scene["up"],
        jnp.full([args.batch], 40.0), jnp.full([args.batch], 0.01),
        jnp.full([args.batch], 10.0), args.size, args.size)
    clip = camera.transform_homogeneous(cams, scene["vertices"])
    chunk = hp._fused_chunk_for(tris.shape[0])
    packed = jnp.stack([hp._pack_triangle_data(clip[b], tris, chunk)
                        for b in range(args.batch)])

    H = W = args.size
    print(f"hard fwd (chunk={chunk}):")
    results = {}
    for name, tile_h in [("full16", 16), ("half8", 8)]:
        n_rows = -(-H // tile_h)
        n_cols = -(-W // hp.TILE_W)
        budget = hp._gather_budget_rows(packed.shape[1], n_rows * n_cols,
                                        chunk)
        plan = hp._gather_plan(packed[:, :, 15:20], chunk, W, H, 0, H,
                               budget, tile_h=tile_h, tile_w=hp.TILE_W)
        _, keep, _, n_chunks = plan
        gathered = int(jnp.sum(n_chunks))
        table, _ = hp._build_tables(packed, None, plan)
        s_rows = plan[0].shape[1]
        _, counts = hp._bin_chunks(table[:, s_rows:], chunk, W, H, 0, H)
        legacy = int(jnp.sum(counts))
        lanes = (gathered * chunk * tile_h * hp.TILE_W +
                 legacy * chunk * 16 * hp.TILE_W)
        results[name] = lanes
        print(f"  {name}: gathered={gathered} legacy={legacy} "
              f"lane_work={lanes:,}")
    print(f"  fwd lane-work ratio: "
          f"{results['half8'] / results['full16']:.3f}")

    # Backward: winner segments from the real forward id/bc images.
    ids, bc, _ = jax.jit(jax.vmap(
        lambda c: rasterize_xla.rasterize_barycentric_xla(
            c, tris, W, H, 64)))(clip)
    print("hard bwd (winner segments):")
    results = {}
    for name, tile_h in [("full16", 16), ("half8", 8)]:
        n_rows = -(-H // tile_h)
        n_cols = -(-W // hp.TILE_W)
        budget = hp._gather_budget_rows(packed.shape[1], n_rows * n_cols,
                                        chunk)
        _, _, n_chunks, tile_fits = hp._winner_plan(
            ids, bc, chunk, budget, tile_h=tile_h, tile_w=hp.TILE_W)
        visits = int(jnp.sum(n_chunks))
        lanes = visits * chunk * tile_h * hp.TILE_W
        results[name] = lanes
        print(f"  {name}: winner_chunk_visits={visits} "
              f"all_tiles_fit={bool(jnp.all(tile_fits))} "
              f"lane_work={lanes:,}")
    print(f"  bwd lane-work ratio: "
          f"{results['half8'] / results['full16']:.3f}")


if __name__ == "__main__":
    import jax
    main()
