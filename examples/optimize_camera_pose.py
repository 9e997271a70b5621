"""Camera-pose optimization against a target image (hard renderer).

Capability parity: /root/reference/src/examples/example4.py:23-97 — optimize
camera eye position + euler look-rotation with SGD(momentum) on an L1 image
loss, logging an mp4 of the render per step and a loss plot. (The reference
notes its own version does not converge reliably, example4.py:4; neither
formulation is convex — this is a gradient-quality demo.)

Usage: python examples/optimize_camera_pose.py --target target.png
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import common


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", type=str, default=None)
    parser.add_argument(
        "--target", type=str,
        default=common.target_path("example4_target.png"))
    parser.add_argument("--out-video", type=str, default="camera_pose.mp4")
    parser.add_argument("--out-plot", type=str, default="camera_pose_loss.png")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=240)
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu.models import mesh_renderer
    from pytorch_mesh_renderer_tpu.ops import camera, losses

    vertices, triangles, normals = common.load_teapot(args.obj)
    triangles = jnp.asarray(triangles)[:, ::-1]  # CW for the hard renderer
    vertices, normals = vertices[None], normals[None]
    diffuse = jnp.ones_like(vertices)
    lights = jnp.array([[[0.0, 3.0, 3.0]]], jnp.float32)
    intensities = jnp.ones([1, 1, 3], jnp.float32)

    def render(params):
        rot = camera.euler_matrices(params["angles"][None])[0, :3, :3]
        eye = params["eye"][None]
        # Look direction rotates with the euler angles around the origin.
        center = (rot @ jnp.array([0.0, 0.0, -1.0]))[None] + eye
        up = (rot @ jnp.array([0.0, 1.0, 0.0]))[None]
        return mesh_renderer.render(
            vertices, triangles, normals, diffuse, eye, center, up, lights,
            intensities, args.width, args.height)[0]

    # jit the frame renderer too (eager dispatch is slow on remote TPU).
    render_jit = jax.jit(render)

    if os.path.exists(args.target):
        target = jnp.asarray(common.load_png(args.target))
        if target.shape[:2] != (args.height, args.width):
            import numpy as _np
            print("[example] resizing target via nearest neighbor")
            ys = (_np.arange(args.height) * target.shape[0]
                  // args.height)
            xs = (_np.arange(args.width) * target.shape[1] // args.width)
            target = target[ys][:, xs]
        if target.shape[-1] == 3:
            target = jnp.concatenate(
                [target, jnp.ones(target.shape[:2] + (1,))], axis=-1)
    else:
        print("[example] target image missing; rendering a synthetic target")
        target = render_jit({"eye": jnp.array([0.0, 3.2, 2.8]),
                         "angles": jnp.array([-0.7, 0.1, 0.0])})

    params = {"eye": jnp.array([0.0, 2.5, 3.5]),
              "angles": jnp.array([-0.6, 0.0, 0.0])}
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.sgd(0.7, momentum=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return losses.image_l1_loss(render(p), target)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    video = common.VideoWriter(args.out_video)
    history = []
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        history.append(float(loss))
        if i % 5 == 0:
            video.append(np.asarray(render_jit(params)))
            print(f"step {i}: loss {history[-1]:.5f}")
    video.close()
    common.save_loss_plot(args.out_plot, history)


if __name__ == "__main__":
    main()
