"""Inverse-rendering losses.

Parity targets: the shape-fitting regularizers of the reference's multi-view
example (/root/reference/src/examples/example7b.py:25-129 — uniform-weight
Laplacian smoothing and mean edge length, themselves ported there from
PyTorch3D) plus the image losses its optimization loops use
(L1: mesh_renderer_test.py:250; silhouette MSE: example7b.py:242).

TPU-native formulation: the reference builds a sparse [V, V] Laplacian with
torch.sparse and multiplies it per step; here the same operator is two
scatter-adds (neighbor sum + degree) fused by XLA — no sparse matrix, no
host-side precompute beyond the static edge list.
"""

from __future__ import annotations

import jax.numpy as jnp


def edge_loss(vertices, edges):
    """Mean edge length of a single mesh.

    Args:
      vertices: [V, 3] f32.
      edges: [E, 2] i32 unique undirected edges (ops.mesh.compute_edges_list).

    Parity: example7b.py:117-129.
    """
    v0 = vertices[edges[:, 0]]
    v1 = vertices[edges[:, 1]]
    d = v0 - v1
    # Explicit norm (see ops/camera.py on the TPU linalg.norm mis-lowering).
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=1)))


def laplacian_smoothing_loss(vertices, edges):
    """Uniform-weight Laplacian smoothing objective of a single mesh.

    (L v)_i = mean of neighbors of v_i minus v_i; the loss is
    sum_i ||(L v)_i|| / V. Equivalent to the reference's sparse-matrix
    formulation (example7b.py:25-78 + 103-115) but computed with two
    scatter-adds instead of a [V, V] sparse matmul.

    Args:
      vertices: [V, 3] f32.
      edges: [E, 2] i32 unique undirected edges.
    """
    n_vertices = vertices.shape[0]
    e0, e1 = edges[:, 0], edges[:, 1]

    neighbor_sum = jnp.zeros_like(vertices)
    neighbor_sum = neighbor_sum.at[e0].add(vertices[e1])
    neighbor_sum = neighbor_sum.at[e1].add(vertices[e0])

    degree = jnp.zeros([n_vertices], vertices.dtype)
    degree = degree.at[e0].add(1.0)
    degree = degree.at[e1].add(1.0)
    inv_degree = jnp.where(degree > 0.0, 1.0 / jnp.maximum(degree, 1.0), 0.0)

    lap = neighbor_sum * inv_degree[:, None] - vertices
    return jnp.sum(jnp.sqrt(jnp.sum(lap * lap, axis=1))) / n_vertices


def image_l1_loss(rendered, target):
    """Mean absolute pixel error (the optimization tests' image loss)."""
    return jnp.mean(jnp.abs(rendered - target))


def silhouette_mse_loss(rendered_alpha, target_alpha):
    """Mean squared silhouette error (example7b.py:242)."""
    return jnp.mean((rendered_alpha - target_alpha) ** 2)


def silhouette_iou(rendered_alpha, target_alpha, eps=1e-6):
    """Soft intersection-over-union of two [0,1] silhouettes (diagnostic)."""
    inter = jnp.sum(rendered_alpha * target_alpha)
    union = (jnp.sum(rendered_alpha) + jnp.sum(target_alpha) - inter)
    return inter / jnp.maximum(union, eps)
