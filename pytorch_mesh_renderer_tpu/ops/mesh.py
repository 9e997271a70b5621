"""Mesh geometry ops.

Parity target: /root/reference/src/common/meshes.py:3-36 — area-weighted
per-vertex normals. The reference loops over the batch and uses three
`index_add_` scatters; here the whole computation is a single batched
scatter-add expressed with jnp `.at[].add`, which XLA lowers to an efficient
TPU scatter, and is differentiable + vmap/jit friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math_utils import normalize


def compute_vertex_normals(vertices: jnp.ndarray,
                           triangles: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals from face geometry.

    Face normals (scaled by 2x face area) are accumulated onto each incident
    vertex and the result is L2-normalized. The cross product is evaluated at
    each corner separately, matching the reference's three `index_add_` calls
    (meshes.py:23-34) bit-for-bit up to reduction order.

    Args:
      vertices: [batch_size, vertex_count, 3] f32 world-space positions.
      triangles: [triangle_count, 3] int vertex indices.

    Returns:
      [batch_size, vertex_count, 3] f32 unit normal vectors.
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    tris = jnp.asarray(triangles, jnp.int32)
    face_vertices = vertices[:, tris, :]  # [B, T, 3(corner), 3(xyz)]
    v0 = face_vertices[:, :, 0]
    v1 = face_vertices[:, :, 1]
    v2 = face_vertices[:, :, 2]
    c0 = jnp.cross(v1 - v0, v2 - v0)
    c1 = jnp.cross(v2 - v1, v0 - v1)
    c2 = jnp.cross(v0 - v2, v1 - v2)

    normals = jnp.zeros_like(vertices)
    normals = normals.at[:, tris[:, 0]].add(c0)
    normals = normals.at[:, tris[:, 1]].add(c1)
    normals = normals.at[:, tris[:, 2]].add(c2)
    return normalize(normals, p=2, axis=-1, eps=1e-6)


def compute_edges_list(triangles: jnp.ndarray) -> jnp.ndarray:
    """Unique undirected edges of a triangle mesh.

    Mirrors the edge extraction in the reference's shape-fitting example
    (/root/reference/src/examples/example7b.py:81-101): edges are the pairs
    (v0,v1), (v1,v2), (v0,v2) of every face, deduplicated as ordered pairs.

    Args:
      triangles: [triangle_count, 3] int array (concrete, host-side).

    Returns:
      [edge_count, 2] int32 array of unique edges.
    """
    import numpy as np
    tris = np.asarray(triangles)
    edges = np.concatenate(
        [tris[:, :2], tris[:, 1:], tris[:, ::2]], axis=0).reshape(-1, 2)
    edges = np.unique(edges, axis=0)
    return jnp.asarray(edges, jnp.int32)
