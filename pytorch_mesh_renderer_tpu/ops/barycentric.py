"""Homogeneous edge-function math shared by the hard-rasterizer backends.

This implements the Olano-Greer "Triangle Scan Conversion using 2D
Homogeneous Coordinates" formulation used by the reference's native kernel
(/root/reference/src/mesh_renderer/kernels/rasterize_triangles.cpp:34-98):
an *unnormalized* 3x3 matrix inverse whose sign is transferred from the
determinant, so that edge functions of neighboring triangles agree
numerically up to sign and rasterization is crack-free without fixed-point
arithmetic. Both the dense XLA kernel and the Pallas tile kernel build on
these functions, as does the analytic backward pass.

All functions are elementwise over arbitrary leading batch dimensions and are
jit/vmap/grad safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this barycentric-coordinate sum, a pixel is treated as degenerate /
# background in the backward pass (rasterize_triangles.cpp:13).
DEGENERATE_BARYCENTRIC_CUTOFF = 0.9


def unnormalized_matrix_inverse(x, y, w):
    """Sign-corrected adjugate of M = [[x0,x1,x2],[y0,y1,y2],[w0,w1,w2]].

    Args:
      x, y, w: [..., 3] f32 per-triangle vertex clip coordinates.

    Returns:
      (m_inv [..., 3, 3], det [...]). Row i of m_inv holds the coefficients
      (a, b, c) of edge function i: e_i(px, py) = a*px + b*py + c. If
      det(M) < 0 every entry is negated, so inside tests are orientation
      independent (rasterize_triangles.cpp:61-87).
    """
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]

    m0 = y1 * w2 - w1 * y2
    m1 = x2 * w1 - w2 * x1
    m2 = x1 * y2 - y1 * x2
    m3 = y2 * w0 - w2 * y0
    m4 = x0 * w2 - w0 * x2
    m5 = x2 * y0 - y2 * x0
    m6 = y0 * w1 - w0 * y1
    m7 = x1 * w0 - w1 * x0
    m8 = x0 * y1 - y0 * x1

    det = x0 * m0 + x1 * m3 + x2 * m6
    m_inv = jnp.stack([
        jnp.stack([m0, m1, m2], axis=-1),
        jnp.stack([m3, m4, m5], axis=-1),
        jnp.stack([m6, m7, m8], axis=-1),
    ], axis=-2)
    sign = jnp.where(det < 0.0, -1.0, 1.0)
    return m_inv * sign[..., None, None], det


def pixel_is_inside(e0, e1, e2):
    """Inside test: all edge values non-negative, at least one positive.

    Degenerate (zero-area) triangles always fail
    (rasterize_triangles.cpp:89-98).
    """
    nonneg = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
    some_pos = (e0 > 0.0) | (e1 > 0.0) | (e2 > 0.0)
    return nonneg & some_pos


def ndc_pixel_centers(image_width: int, image_height: int):
    """NDC coordinates of pixel centers.

    Returns (px [W], py [H]) where px = (ix+0.5)/(W/2) - 1, matching the
    native kernel's pixel addressing (rasterize_triangles.cpp:376-377). Row 0
    is the *bottom* of NDC space; the shading layer flips vertically at the
    end, exactly like the reference (render.py:384-386).
    """
    px = (jnp.arange(image_width, dtype=jnp.float32) + 0.5) / (
        0.5 * image_width) - 1.0
    py = (jnp.arange(image_height, dtype=jnp.float32) + 0.5) / (
        0.5 * image_height) - 1.0
    return px, py
