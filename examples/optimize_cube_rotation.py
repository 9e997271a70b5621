"""Cube-rotation recovery with the hard or soft renderer.

Capability parity: /root/reference/src/examples/example5.py (hard) and
example5b.py (soft) — recover euler rotation angles of a colored cube from a
target image by SGD on an L1 pixel loss, with mp4 + loss-plot artifacts. The
whole step (render, loss, backward, clip, momentum update) is one jitted XLA
program.

Usage: python examples/optimize_cube_rotation.py [--soft] [--steps 50]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import common


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--soft", action="store_true")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--out-video", type=str, default="cube_rotation.mp4")
    parser.add_argument("--out-plot", type=str,
                        default="cube_rotation_loss.png")
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu.models import (mesh_renderer, shapes,
                                                  soft_mesh_renderer)
    from pytorch_mesh_renderer_tpu.ops import camera, losses

    verts, tris, normals = shapes.cube(2.0)
    if not args.soft:
        tris = jnp.asarray(tris)[:, ::-1]  # hard renderer wants CW

    # Distinct face colors so rotation is observable (like example5.py:38-47).
    colors = jnp.asarray(np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
         [1, 1, 1], [0.5, 0.5, 0.5]], np.float32))
    eye = jnp.array([[0.0, 0.0, 6.0]], jnp.float32)
    center = jnp.zeros([1, 3], jnp.float32)
    up = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)

    def render(angles):
        rot = camera.euler_matrices(angles[None])[0, :3, :3]
        v = (verts @ rot.T)[None]
        if args.soft:
            return soft_mesh_renderer.render(
                v, tris, colors[None], eye, center, up,
                eye[:, None, :], jnp.ones([1, 1]), args.size, args.size)[0]
        n = (normals @ rot.T)[None]
        return mesh_renderer.render(
            v, tris, n, colors[None], eye, center, up, eye[:, None, :],
            jnp.ones([1, 1, 3]), args.size, args.size)[0]

    # jit the frame renderer too: eager per-op dispatch is pathologically
    # slow on remote/tunneled TPU backends.
    render_jit = jax.jit(render)
    target_angles = jnp.array([-0.35, 0.0, 1.05])
    target = render_jit(target_angles)

    angles = jnp.zeros(3)
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
    for i in range(args.steps):
        angles, opt_state, loss = step(angles, opt_state)
        history.append(float(loss))
        video.append(np.asarray(render_jit(angles)))
        if i % 10 == 0:
            print(f"step {i}: loss {history[-1]:.5f} angles "
                  f"{np.asarray(angles).round(3)}")
    video.close()
    common.save_loss_plot(args.out_plot, history)
    print(f"final angles: {np.asarray(angles).round(4)} "
          f"(target {np.asarray(target_angles)})")


if __name__ == "__main__":
    main()
