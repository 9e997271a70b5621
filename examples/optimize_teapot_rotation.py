"""Teapot-rotation recovery with the hard or soft renderer.

Capability parity: /root/reference/src/examples/example6.py (hard; converges
for small perturbations) and example6b.py (soft; robust to larger ones).
Normals are rotated with the inverse-transpose, as in example6.py:57 — for a
pure rotation that is the rotation itself, kept explicit for parity.

Usage: python examples/optimize_teapot_rotation.py [--soft]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import common


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", type=str, default=None)
    parser.add_argument("--soft", action="store_true")
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--perturbation", type=float, default=0.3,
                        help="initial angle offset from the target (radians)")
    parser.add_argument("--out-video", type=str,
                        default="teapot_rotation.mp4")
    parser.add_argument("--out-plot", type=str,
                        default="teapot_rotation_loss.png")
    parser.add_argument("--scan-chunk", type=int, default=None,
                        help="run N optimizer steps per device dispatch "
                             "(lax.scan via parallel.make_train_loop) — "
                             "amortizes the ~0.5 ms/step host dispatch "
                             "floor; one video frame / log line per chunk")
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu.models import (mesh_renderer,
                                                  soft_mesh_renderer)
    from pytorch_mesh_renderer_tpu.ops import camera, losses

    verts, tris, normals = common.load_teapot(args.obj)
    if not args.soft:
        tris = jnp.asarray(tris)[:, ::-1]

    eye = jnp.array([[0.0, 3.0, 3.0]], jnp.float32)
    center = jnp.zeros([1, 3], jnp.float32)
    up = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    colors = jnp.ones_like(verts)[None]

    def render(angles):
        rot = camera.euler_matrices(angles[None])[0, :3, :3]
        v = (verts @ rot.T)[None]
        if args.soft:
            return soft_mesh_renderer.render(
                v, tris, colors, eye, center, up, eye[:, None, :],
                jnp.ones([1, 1]), args.size, args.size)[0]
        # Inverse-transpose of a rotation is the rotation.
        n = (normals @ jnp.linalg.inv(rot))[None]
        return mesh_renderer.render(
            v, tris, n, colors, eye, center, up, eye[:, None, :],
            jnp.ones([1, 1, 3]), args.size, args.size)[0]

    target_angles = jnp.array([0.0, 0.4, 0.0])
    # jit the frame renderer too (eager dispatch is slow on remote TPU).
    render_jit = jax.jit(render)
    target = render_jit(target_angles)
    angles = target_angles + args.perturbation

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.sgd(0.7, momentum=0.1))
    opt_state = opt.init(angles)

    @jax.jit
    def step(angles, opt_state):
        def loss_fn(a):
            return losses.image_l1_loss(render(a), target)
        loss, g = jax.value_and_grad(loss_fn)(angles)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(angles, updates), opt_state, loss

    video = common.VideoWriter(args.out_video)
    history = []
    if args.scan_chunk:
        from pytorch_mesh_renderer_tpu import parallel
        # The tail chunk is sized to the remaining steps so exactly
        # --steps optimizer steps execute (at most two loop lengths
        # compile).
        loss_fn = lambda a, batch: losses.image_l1_loss(render(a), batch)
        loops = {}
        for i in range(0, args.steps, args.scan_chunk):
            k = min(args.scan_chunk, args.steps - i)
            if k not in loops:
                loops[k] = parallel.make_train_loop(loss_fn, opt,
                                                    steps_per_call=k)
            angles, opt_state, chunk_losses = loops[k](angles, opt_state,
                                                       target)
            history.extend(np.asarray(chunk_losses).tolist())
            video.append(np.asarray(render_jit(angles)))
            print(f"step {i + k - 1}: loss {history[-1]:.5f}")
    else:
        for i in range(args.steps):
            angles, opt_state, loss = step(angles, opt_state)
            history.append(float(loss))
            video.append(np.asarray(render_jit(angles)))
            if i % 10 == 0:
                print(f"step {i}: loss {history[-1]:.5f}")
    video.close()
    common.save_loss_plot(args.out_plot, history)
    print(f"final angles {np.asarray(angles).round(4)} "
          f"(target {np.asarray(target_angles)})")


if __name__ == "__main__":
    main()
