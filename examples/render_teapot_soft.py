"""Forward render a teapot with the soft (SoftRas) renderer.

Capability parity: /root/reference/src/examples/example1b.py:18-65 — 100x100
soft render with binarized alpha, jitted.

Usage: python examples/render_teapot_soft.py --obj teapot.obj --out out.png
"""

import argparse

import jax
import jax.numpy as jnp

import common


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", type=str, default=None)
    parser.add_argument("--out", type=str, default="teapot_soft.png")
    parser.add_argument("--size", type=int, default=100)
    parser.add_argument("--sigma", type=float, default=1e-5)
    parser.add_argument("--gamma", type=float, default=1e-4)
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu.models import soft_mesh_renderer

    vertices, triangles, _ = common.load_teapot(args.obj)
    vertices = vertices[None]
    diffuse = jnp.ones_like(vertices)
    eye = jnp.array([[0.0, 3.0, 3.0]], jnp.float32)
    center = jnp.zeros([1, 3], jnp.float32)
    up = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    lights = jnp.array([[[0.0, 3.0, 3.0]]], jnp.float32)
    intensities = jnp.ones([1, 1], jnp.float32)

    @jax.jit
    def render(v):
        images = soft_mesh_renderer.render(
            v, triangles, diffuse, eye, center, up, lights, intensities,
            args.size, args.size, sigma_val=args.sigma, gamma_val=args.gamma)
        rgb = images[..., :3]
        alpha = (images[..., 3:] > 0.5).astype(jnp.float32)  # binarize
        return jnp.concatenate([rgb, alpha], axis=-1)

    image = render(vertices)[0]
    common.save_png(args.out, image)


if __name__ == "__main__":
    main()
