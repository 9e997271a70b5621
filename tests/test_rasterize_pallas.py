"""Pallas hard-rasterizer backend: parity with the XLA semantic spec.

The tiled Pallas kernel (ops/rasterize_pallas.py) must agree bit-for-bit
with the dense XLA backend (the semantic reference, mirroring how the
reference keeps its python kernel as the spec for its C++ kernel,
src/mesh_renderer/rasterize.py:14-25). On CPU CI this runs the kernel in
interpreter mode; on TPU it runs compiled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops import camera
from pytorch_mesh_renderer_tpu.ops.rasterize_xla import (
    rasterize_barycentric_xla)
from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
    rasterize_barycentric_pallas)

CUBE_VERTICES = np.array(
    [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1], [1, -1, 1],
     [1, -1, -1], [1, 1, -1], [1, 1, 1]], np.float32)
CUBE_TRIANGLES = np.array(
    [[0, 1, 2], [2, 3, 0], [3, 2, 6], [6, 7, 3], [7, 6, 5], [5, 4, 7],
     [4, 5, 1], [1, 0, 4], [5, 6, 2], [2, 1, 5], [7, 4, 0], [0, 3, 7]],
    np.int32)


def _cube_clip(width, height, eye=(2.0, 3.0, 6.0)):
    perspective = camera.perspective(
        width / height, jnp.array([40.0]), jnp.array([0.01]),
        jnp.array([10.0]))
    look = camera.look_at(jnp.array([list(eye)]), jnp.zeros([1, 3]),
                          jnp.array([[0.0, 1.0, 0.0]]))
    proj = jnp.matmul(perspective, look, precision=jax.lax.Precision.HIGHEST)
    return camera.transform_homogeneous(
        proj, jnp.asarray(CUBE_VERTICES)[None])[0]


def test_pallas_matches_xla_forward():
    width, height = 64, 48
    clip = _cube_clip(width, height)
    ids_x, bc_x, z_x = rasterize_barycentric_xla(
        clip, CUBE_TRIANGLES, width, height)
    ids_p, bc_p, z_p = rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, height)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(bc_p), np.asarray(bc_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x), atol=1e-6)


def test_pallas_matches_xla_gradient():
    width, height = 64, 48
    clip = _cube_clip(width, height)

    def loss(rast):
        def f(c):
            _, bc, _ = rast(c, CUBE_TRIANGLES, width, height)
            return jnp.sum(bc ** 2) + jnp.sum(bc[..., 0] * bc[..., 1])
        return f

    g_x = jax.grad(loss(rasterize_barycentric_xla))(clip)
    g_p = jax.grad(loss(rasterize_barycentric_pallas))(clip)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5,
                               atol=1e-4)
    # No gradient to vertex z in either backend (cpp:232-269 property).
    np.testing.assert_array_equal(np.asarray(g_p[:, 2]), 0.0)


def test_pallas_row_sharding_strips_match_full():
    """Strips rendered with row_offset reassemble to the full image."""
    width, height = 64, 48
    clip = _cube_clip(width, height)
    full_ids, full_bc, full_z = rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, height)
    strip_h = height // 2
    parts = [rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, strip_h,
        row_offset=jnp.asarray(i * strip_h), full_height=height)
        for i in range(2)]
    ids = jnp.concatenate([p[0] for p in parts], axis=0)
    bc = jnp.concatenate([p[1] for p in parts], axis=0)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(full_ids))
    np.testing.assert_allclose(np.asarray(bc), np.asarray(full_bc),
                               atol=1e-6)
