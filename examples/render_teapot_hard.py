"""Forward render a teapot with the hard renderer (Phong + tone mapping).

Capability parity: /root/reference/src/examples/example1.py:18-52, jitted.

Usage: python examples/render_teapot_hard.py --obj teapot.obj --out out.png
"""

import argparse

import jax
import jax.numpy as jnp

import common


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", type=str, default=None)
    parser.add_argument("--out", type=str, default="teapot_hard.png")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    args = parser.parse_args()

    from pytorch_mesh_renderer_tpu.models import mesh_renderer

    vertices, triangles, normals = common.load_teapot(args.obj)
    # Hard renderer expects CW winding toward the viewer (OBJ files are CCW).
    triangles = jnp.asarray(triangles)[:, ::-1]

    vertices = vertices[None]
    normals = normals[None]
    diffuse = jnp.ones_like(vertices)
    eye = jnp.array([[0.0, 3.0, 3.0]], jnp.float32)
    center = jnp.zeros([1, 3], jnp.float32)
    up = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    lights = jnp.array([[[0.0, 3.0, 3.0]]], jnp.float32)
    intensities = jnp.ones([1, 1, 3], jnp.float32)

    @jax.jit
    def render(v, n):
        images = mesh_renderer.render(
            v, triangles, n, diffuse, eye, center, up, lights, intensities,
            args.width, args.height)
        rgb = mesh_renderer.tone_mapper(images[..., :3], 0.7)
        return jnp.concatenate([rgb, images[..., 3:]], axis=-1)

    image = render(vertices, normals)[0]
    common.save_png(args.out, image)


if __name__ == "__main__":
    main()
