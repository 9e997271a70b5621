"""Multi-view silhouette shape fitting (soft renderer).

Capability parity: /root/reference/src/examples/example7b.py:25-294 — deform
a UV-sphere to match four silhouette views (the reference uses cow targets),
minimizing silhouette MSE plus edge-length and uniform-Laplacian smoothing
regularizers, with periodic OBJ/PNG previews. TPU-native extensions over the
reference:

  * the four views render as one batch-4 jitted program (the reference loops
    cameras per step);
  * optional (data, space) mesh sharding via --mesh for multi-chip runs
    (views over "data", pixel rows over "space");
  * optional --scan-chunk N: N optimizer steps per device dispatch
    (lax.scan) to amortize the host dispatch floor;
  * checkpoint/resume of (params, opt_state, step) between invocations.

Usage: python examples/fit_shape_multiview.py --epochs 200
       python examples/fit_shape_multiview.py --mesh 4,2 --scan-chunk 25
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import common


def load_targets(size):
    """The reference's four cow silhouettes (vendored), or a box target."""
    paths = [common.target_path(f"example7b_target{i}.png")
             for i in range(1, 5)]
    if all(os.path.exists(p) for p in paths):
        imgs = []
        for p in paths:
            img = common.load_png(p)
            alpha = img[..., 3] if img.shape[-1] == 4 else img.mean(-1)
            ys = (np.arange(size) * alpha.shape[0] // size)
            xs = (np.arange(size) * alpha.shape[1] // size)
            imgs.append(alpha[ys][:, xs])
        return jnp.asarray(np.stack(imgs)), True
    return None, False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=250)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--resolution", type=int, default=20)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--edge-weight", type=float, default=0.3)
    parser.add_argument("--laplacian-weight", type=float, default=0.1)
    parser.add_argument("--sigma", type=float, default=3e-5)
    parser.add_argument("--gamma", type=float, default=1e-4)
    parser.add_argument("--preview-every", type=int, default=50)
    parser.add_argument("--out-prefix", type=str, default="fit_shape")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="path to save/resume optimization state")
    parser.add_argument("--mesh", type=str, default=None, metavar="DATA,SPACE",
                        help="shard over a (data, space) device mesh, e.g. "
                             "'4,2': views over 'data', pixel rows over "
                             "'space' (views %% data == 0, size %% space == 0)")
    parser.add_argument("--scan-chunk", type=int, default=None,
                        help="run N optimizer steps per device dispatch "
                             "(lax.scan via parallel.make_train_loop); "
                             "previews/checkpoints happen between chunks")
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu import parallel
    from pytorch_mesh_renderer_tpu.models import shapes, soft_mesh_renderer
    from pytorch_mesh_renderer_tpu.ops import camera, losses
    from pytorch_mesh_renderer_tpu.ops import mesh as mesh_ops
    from pytorch_mesh_renderer_tpu.utils import checkpoint, obj_io

    verts0, tris, _ = shapes.sphere(0.5, resolution=args.resolution)
    edges = mesh_ops.compute_edges_list(tris)

    # Four cameras on a horizontal ring (the reference's multi-view setup).
    n_views = 4
    phis = np.linspace(0.0, 2 * np.pi, n_views, endpoint=False)
    eyes = jnp.asarray(
        np.stack([2.0 * np.sin(phis), 0.3 * np.ones(n_views),
                  2.0 * np.cos(phis)], -1).astype(np.float32))
    centers = jnp.zeros([n_views, 3])
    ups = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [n_views, 1])
    lights = eyes[:, None, :]
    intensities = jnp.ones([n_views, 1])

    device_mesh = None
    if args.mesh:
        d, s = (int(x) for x in args.mesh.split(","))
        device_mesh = parallel.make_mesh(data=d, space=s)
        cams = camera.clip_space_transforms(
            eyes, centers, ups, jnp.full([n_views], 40.0),
            jnp.full([n_views], 0.01), jnp.full([n_views], 10.0),
            args.size, args.size)

    def render_alphas(vertices):
        # Silhouette-only fast path: bit-identical to the full render's
        # alpha channel, ~2x faster (docs/soft_renderer.md).
        v = jnp.tile(vertices[None], [n_views, 1, 1])
        if device_mesh is not None:
            # Views shard over "data", pixel rows over "space"; output
            # equals the unsharded render exactly (tests/test_parallel.py).
            return parallel.sharded_soft_silhouette(
                device_mesh, v, tris, cams, args.size, args.size,
                sigma_val=args.sigma)
        return soft_mesh_renderer.render_silhouette(
            v, tris, eyes, centers, ups, args.size, args.size,
            sigma_val=args.sigma)

    # jit the preview renderer too (eager dispatch is slow on remote TPU).
    render_alphas_jit = jax.jit(render_alphas)

    targets, from_file = load_targets(args.size)
    if not from_file:
        print("[example] target silhouettes missing; fitting to a stretched "
              "ellipsoid target")
        tv, _, _ = shapes.sphere(0.5, resolution=args.resolution)
        tv = tv * jnp.array([1.4, 0.7, 0.9])
        targets = render_alphas_jit(tv)

    def loss_fn(params, target_alphas):
        vertices = verts0 + params["offsets"]
        sil = losses.silhouette_mse_loss(render_alphas(vertices),
                                         target_alphas)
        edge = losses.edge_loss(vertices, edges)
        lap = losses.laplacian_smoothing_loss(vertices, edges)
        return (sil + args.edge_weight * edge +
                args.laplacian_weight * lap), (sil, edge, lap)

    opt = optax.adam(args.lr)
    params = {"offsets": jnp.zeros_like(verts0)}
    if device_mesh is not None:
        params = parallel.replicate(device_mesh, params)
        targets = parallel.shard_batch(device_mesh, targets)
    opt_state = opt.init(params)
    start = 0
    if args.checkpoint and checkpoint.exists(args.checkpoint):
        state = checkpoint.restore(
            args.checkpoint,
            {"params": params, "opt_state": opt_state, "step": 0})
        params, opt_state = state["params"], state["opt_state"]
        start = int(state["step"])
        print(f"[example] resumed from step {start}")

    @jax.jit
    def step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, targets)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def preview(epoch, params, opt_state, loss, sil, edge, lap):
        vertices = verts0 + params["offsets"]
        alphas = np.asarray(render_alphas_jit(vertices))
        # Mean binarized IoU across views (the fit-quality number the
        # committed trajectory reports; threshold 0.5 on both sides).
        got = alphas > 0.5
        want = np.asarray(targets) > 0.5
        inter = (got & want).sum(axis=(1, 2))
        union = np.maximum((got | want).sum(axis=(1, 2)), 1)
        iou = float(np.mean(inter / union))
        print(f"epoch {epoch}: loss {float(loss):.5f} "
              f"(sil {float(sil):.5f} edge {float(edge):.5f} "
              f"lap {float(lap):.5f}) IoU {iou:.4f}")
        common.save_png(f"{args.out_prefix}_view0_{epoch:04d}.png",
                        alphas[0][..., None].repeat(3, -1))
        obj_io.save_obj(f"{args.out_prefix}_{epoch:04d}.obj", vertices, tris)
        if args.checkpoint:
            checkpoint.save(args.checkpoint,
                            {"params": params, "opt_state": opt_state,
                             "step": epoch + 1})

    if args.scan_chunk:
        # K steps per dispatch; loss components re-evaluated (one forward)
        # only at chunk boundaries for logging. The final chunk is sized to
        # the remaining steps so the executed step count equals --epochs
        # exactly (and the checkpoint's saved step stays truthful); at most
        # two loop lengths ever compile.
        loops = {}

        def loop_for(k):
            if k not in loops:
                loops[k] = parallel.make_train_loop(
                    lambda p, t: loss_fn(p, t)[0], opt, steps_per_call=k)
            return loops[k]

        eval_aux = jax.jit(lambda p: loss_fn(p, targets))
        epoch = start
        while epoch < args.epochs:
            k = min(args.scan_chunk, args.epochs - epoch)
            params, opt_state, chunk_losses = loop_for(k)(params, opt_state,
                                                          targets)
            epoch += k
            loss, (sil, edge, lap) = eval_aux(params)
            preview(epoch - 1, params, opt_state, chunk_losses[-1],
                    sil, edge, lap)
    else:
        for epoch in range(start, args.epochs):
            params, opt_state, loss, (sil, edge, lap) = step(params,
                                                             opt_state)
            if epoch % args.preview_every == 0 or epoch == args.epochs - 1:
                preview(epoch, params, opt_state, loss, sil, edge, lap)

    vertices = verts0 + params["offsets"]
    obj_io.save_obj(f"{args.out_prefix}_final.obj", vertices, tris)
    print(f"wrote {args.out_prefix}_final.obj")


if __name__ == "__main__":
    main()
