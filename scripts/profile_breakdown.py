"""Step-time breakdown of the headline hard-renderer benchmark.

VERDICT r2 weak #1: the chip idles at the headline config (~1.7% bf16 peak)
and nobody knows where the 1.75 ms/render goes. Rather than eyeballing an
XProf trace (no trace viewer in this environment), this script times
compiled ablations of the exact headline step so each pipeline stage's
share is measured directly:

  full          value_and_grad(loss(render))          — the benchmark step
  fwd           render only (jit)
  pallas_fwd    pack + bin + fused forward pallas_call
  prepass       pack + gathered-binning plan/tables (the real prepass)
  prepass_chunk pack + legacy chunk binning (comparison)
  pack          triangle pack only
  bin_nosort    chunk-binning hit-matrix + counts only (no argsort)
  camera        camera transforms + clip projection only
  noop          jitted identity on the step inputs (dispatch floor)

With --soft, the soft-renderer analogues (full / fwd / pallas_fwd /
prepass / pack / camera / noop) are timed instead.

Usage: python scripts/profile_breakdown.py [--batch 4] [--size 256]
       [--iters 50] [--soft]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def time_fn(fn, *args, iters=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def soft_stages(scene, size, args):
    import jax
    import jax.numpy as jnp

    from pytorch_mesh_renderer_tpu.models import soft_mesh_renderer
    from pytorch_mesh_renderer_tpu.ops import camera
    from pytorch_mesh_renderer_tpu.ops import mesh as mesh_ops
    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp

    triangles = scene["triangles"][:, ::-1].copy()  # CCW

    def loss_fn(vertices):
        images = soft_mesh_renderer.render(
            vertices, triangles, scene["diffuse"], scene["eye"],
            scene["center"], scene["up"], scene["lights"][..., :3],
            scene["intensities"][..., 0], size, size)
        return jnp.mean(images[..., 3] ** 2)

    def fwd_fn(vertices):
        return soft_mesh_renderer.render(
            vertices, triangles, scene["diffuse"], scene["eye"],
            scene["center"], scene["up"], scene["lights"][..., :3],
            scene["intensities"][..., 0], size, size)

    def clip_of(vertices):
        batch = vertices.shape[0]
        cams = camera.clip_space_transforms(
            scene["eye"], scene["center"], scene["up"],
            jnp.full([batch], 40.0), jnp.full([batch], 0.01),
            jnp.full([batch], 10.0), size, size)
        return camera.transform_homogeneous(cams, vertices)

    def pack_fn(vertices):
        normals = mesh_ops.compute_vertex_normals(vertices, triangles)
        return sp._pack_batched(clip_of(vertices), triangles, vertices,
                                normals, scene["diffuse"], 0.01)

    def prepass_fn(vertices):
        # The real (gathered-binning) prepass: plan + table assembly +
        # legacy candidate lists.
        return sp._prepare_tables(pack_fn(vertices), "gathered", size,
                                  size, 0, size)

    def prepass_chunk_fn(vertices):
        return sp._bin_chunks(pack_fn(vertices), size, size, 0, size)

    def pallas_fwd_fn(vertices):
        normals = mesh_ops.compute_vertex_normals(vertices, triangles)
        return sp.soft_rasterize_pallas_batched(
            clip_of(vertices), triangles, vertices, normals,
            scene["diffuse"], scene["lights"][..., :3],
            scene["intensities"][..., 0], size, size, 1e-5, 1e-4)

    return {
        "full": jax.jit(jax.value_and_grad(loss_fn)),
        "fwd": jax.jit(fwd_fn),
        "pallas_fwd": jax.jit(pallas_fwd_fn),
        "prepass": jax.jit(prepass_fn),
        "prepass_chunk": jax.jit(prepass_chunk_fn),
        "pack": jax.jit(pack_fn),
        "camera": jax.jit(clip_of),
        "noop": jax.jit(lambda v: v + 1.0),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--sphere-resolution", type=int, default=None)
    parser.add_argument("--soft", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pytorch_mesh_renderer_tpu.models import mesh_renderer
    from pytorch_mesh_renderer_tpu.ops import camera
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    size = args.size
    scene = bench.build_scene(args.batch, size, args.sphere_resolution)
    triangles = scene["triangles"]
    chunk = rp._fused_chunk_for(triangles.shape[0])

    if args.soft:
        stages = soft_stages(scene, size, args)
        results = {}
        for name, fn in stages.items():
            dt = time_fn(fn, scene["vertices"], iters=args.iters)
            results[name] = round(dt * 1e3, 4)
            print(f"{name:12s} {dt * 1e3:8.3f} ms", flush=True)
        results.update(batch=args.batch, size=size, soft=True,
                       tri_count=int(triangles.shape[0]))
        print(json.dumps(results))
        return

    def loss_fn(vertices):
        images = mesh_renderer.render(
            vertices, triangles, scene["normals"], scene["diffuse"],
            scene["eye"], scene["center"], scene["up"], scene["lights"],
            scene["intensities"], size, size)
        return jnp.mean(images[..., :3] ** 2)

    def fwd_fn(vertices):
        images = mesh_renderer.render(
            vertices, triangles, scene["normals"], scene["diffuse"],
            scene["eye"], scene["center"], scene["up"], scene["lights"],
            scene["intensities"], size, size)
        return images

    def clip_of(vertices):
        batch = vertices.shape[0]
        cams = camera.clip_space_transforms(
            scene["eye"], scene["center"], scene["up"],
            jnp.full([batch], 40.0), jnp.full([batch], 0.01),
            jnp.full([batch], 10.0), size, size)
        return camera.transform_homogeneous(cams, vertices)

    def pack_fn(vertices):
        return rp._pack_batched(clip_of(vertices), triangles, chunk)

    def prepass_fn(vertices):
        # The real (gathered-binning) prepass: plan + table assembly +
        # legacy candidate lists over the fallback section.
        tri_data = rp._pack_batched(clip_of(vertices), triangles, chunk)
        return rp._prepare_tables(tri_data, None, chunk, size, size, 0,
                                  size, "gathered")

    def prepass_chunk_fn(vertices):
        tri_data = rp._pack_batched(clip_of(vertices), triangles, chunk)
        return rp._bin_chunks(tri_data, chunk, size, size, 0, size)

    def bin_nosort_fn(vertices):
        # _bin_chunks minus the argsort: hit matrix + counts only.
        tri_data = rp._pack_batched(clip_of(vertices), triangles, chunk)
        batch, t_pad, _ = tri_data.shape
        n_chunks = t_pad // chunk
        per_tri = tri_data[:, :, 15:20].reshape(batch, n_chunks, chunk, 5)
        live = per_tri[..., 0] > 0.0
        inf = jnp.float32(np.inf)
        cmin_x = jnp.min(jnp.where(live, per_tri[..., 1], inf), axis=2)
        cmax_x = jnp.max(jnp.where(live, per_tri[..., 2], -inf), axis=2)
        cmin_y = jnp.min(jnp.where(live, per_tri[..., 3], inf), axis=2)
        cmax_y = jnp.max(jnp.where(live, per_tri[..., 4], -inf), axis=2)
        n_rows = -(-size // rp.TILE_H)
        n_cols = -(-size // rp.TILE_W)
        ti = jnp.arange(n_rows, dtype=jnp.float32)
        tj = jnp.arange(n_cols, dtype=jnp.float32)
        tmin_y = ti * rp.TILE_H * (2.0 / size) - 1.0
        tmax_y = (ti + 1) * rp.TILE_H * (2.0 / size) - 1.0
        tmin_x = tj * rp.TILE_W * (2.0 / size) - 1.0
        tmax_x = (tj + 1) * rp.TILE_W * (2.0 / size) - 1.0
        hit = ((cmin_x[:, None, None, :] <= tmax_x[None, None, :, None]) &
               (cmax_x[:, None, None, :] >= tmin_x[None, None, :, None]) &
               (cmin_y[:, None, None, :] <= tmax_y[None, :, None, None]) &
               (cmax_y[:, None, None, :] >= tmin_y[None, :, None, None]))
        return jnp.sum(hit, axis=-1, dtype=jnp.int32)

    def pallas_fwd_fn(vertices):
        clip = clip_of(vertices)
        attrs = jnp.concatenate(
            [scene["normals"], vertices, scene["diffuse"]], axis=2)
        return rp.rasterize_interpolate_pallas_batched(
            clip, attrs, triangles, size, size)

    # Backward ablations (gathered mode): the hard backward's per-step cost
    # splits into (a) the XLA winner-plan prepass — _prepare_bwd_tables
    # sorts the id image per strip, compacts winner segments, gathers a
    # fresh combined table — and (b) the Pallas backward kernel itself.
    # Timing them separately attributes any gathered-vs-chunk step-time gap.
    from pytorch_mesh_renderer_tpu import config as config_lib

    binning = rp._resolve_binning(config_lib.HARD_CONFIG.binning)
    interp = rp._default_interpret(None)
    clip0 = jax.jit(clip_of)(scene["vertices"])
    attrs0 = jnp.concatenate(
        [scene["normals"], scene["vertices"], scene["diffuse"]], axis=2)
    a_pad = rp._pad_attr_count(attrs0.shape[-1])
    tri_data0 = rp._pack_batched(clip0, triangles, chunk)
    attr_packed0 = rp._pack_corner_attributes(attrs0, triangles, a_pad,
                                              tri_data0.shape[1])
    ftab0, base0, _, fplan0, fcand0, fcounts0 = jax.jit(
        lambda td, ap: rp._prepare_tables(td, ap, chunk, size, size, 0,
                                          size, binning))(tri_data0,
                                                          attr_packed0)
    ids0, bc0, attr_img0 = jax.jit(pallas_fwd_fn)(scene["vertices"])
    df_dbc0 = jnp.ones_like(bc0)
    df_dattr0 = jnp.ones_like(attr_img0)

    if rp.BWD_PLAN == "forward":
        # Shipping path: the backward reuses the forward plan/table — its
        # "prepass" is just the per-strip repeat of the legacy counts.
        def bwd_prepass_fn(base, ids, bc):
            return jnp.repeat(fcounts0, rp.N_SEG, axis=1)

        table0, plan0, candidates0 = ftab0, fplan0, fcand0
        counts0 = jax.jit(bwd_prepass_fn)(base0, ids0, bc0)
    else:
        def bwd_prepass_fn(base, ids, bc):
            return rp._prepare_bwd_tables(base, ids, bc, chunk, size, size,
                                          0, size, binning)

        tables0 = jax.jit(bwd_prepass_fn)(base0, ids0, bc0)
        table0, _, plan0, candidates0, counts0 = tables0

    def bwd_kernel_fn(table, plan, candidates, counts, ids, bc, df_dbc,
                      df_dattr):
        return rp._backward_fused(
            table, plan, candidates, counts, triangles,
            scene["vertices"].shape[1], attrs0.shape[-1], ids, bc, df_dbc,
            df_dattr, 0, size, size, size, interp, "default")

    stages = {
        "full": jax.jit(jax.value_and_grad(loss_fn)),
        "fwd": jax.jit(fwd_fn),
        "pallas_fwd": jax.jit(pallas_fwd_fn),
        "prepass": jax.jit(prepass_fn),
        "prepass_chunk": jax.jit(prepass_chunk_fn),
        "pack": jax.jit(pack_fn),
        "bin_nosort": jax.jit(bin_nosort_fn),
        "camera": jax.jit(clip_of),
        "noop": jax.jit(lambda v: v + 1.0),
        "bwd_prepass": (jax.jit(bwd_prepass_fn), (base0, ids0, bc0)),
        "bwd_kernel": (jax.jit(bwd_kernel_fn),
                       (table0, plan0, candidates0, counts0, ids0, bc0,
                        df_dbc0, df_dattr0)),
    }
    results = {}
    for name, fn in stages.items():
        fn, fargs = fn if isinstance(fn, tuple) else (fn,
                                                      (scene["vertices"],))
        dt = time_fn(fn, *fargs, iters=args.iters)
        results[name] = round(dt * 1e3, 4)
        print(f"{name:12s} {dt * 1e3:8.3f} ms", flush=True)
    results["batch"] = args.batch
    results["size"] = size
    results["tri_count"] = int(triangles.shape[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
