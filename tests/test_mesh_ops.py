"""Mesh ops, shapes, and OBJ IO parity tests."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.models import shapes
from pytorch_mesh_renderer_tpu.ops import mesh
from pytorch_mesh_renderer_tpu.utils import obj_io

from conftest import import_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="pytorch reference not available")


def test_vertex_normals_cube_match_numpy():
    vertices, triangles, _ = shapes.cube(2.0)
    normals = np.asarray(
        mesh.compute_vertex_normals(vertices[None], triangles)[0])
    # Direct numpy re-computation of area-weighted vertex normals.
    v = np.asarray(vertices)
    t = np.asarray(triangles)
    acc = np.zeros_like(v)
    for (i0, i1, i2) in t:
        face = np.cross(v[i1] - v[i0], v[i2] - v[i0])
        for i in (i0, i1, i2):
            acc[i] += face
    expected = acc / np.maximum(
        np.linalg.norm(acc, axis=1, keepdims=True), 1e-6)
    np.testing.assert_allclose(normals, expected, atol=1e-5)
    # All normals must point outward on a convex solid.
    assert np.all(np.sum(normals * v, axis=1) > 0)


def test_vertex_normals_batched():
    vertices, triangles, _ = shapes.sphere(1.0, resolution=6)
    batch = jnp.stack([vertices, vertices * 2.0])
    normals = np.asarray(mesh.compute_vertex_normals(batch, triangles))
    # Scaling a sphere does not change its normals.
    np.testing.assert_allclose(normals[0], normals[1], atol=1e-5)
    lengths = np.linalg.norm(normals[0], axis=1)
    np.testing.assert_allclose(lengths, 1.0, atol=1e-5)


@needs_reference
def test_vertex_normals_match_reference():
    import torch
    src = import_reference()
    from src.common import meshes as ref_meshes

    rng = np.random.RandomState(1)
    verts = rng.uniform(-1, 1, size=[2, 30, 3]).astype(np.float32)
    tris = rng.randint(0, 30, size=[40, 3]).astype(np.int32)
    ours = np.asarray(mesh.compute_vertex_normals(
        jnp.asarray(verts), jnp.asarray(tris)))
    theirs = ref_meshes.compute_vertex_normals(
        torch.tensor(verts), torch.tensor(tris)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@needs_reference
def test_shapes_match_reference():
    import torch
    src = import_reference()
    from src.common import shapes as ref_shapes

    for res in (3, 7):
        v, t, n = shapes.sphere(1.5, resolution=res)
        rv, rt, rn = ref_shapes.sphere(1.5, resolution=res)
        np.testing.assert_allclose(np.asarray(v), rv.numpy(), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(t), rt.numpy())
        np.testing.assert_allclose(np.asarray(n), rn.numpy(), atol=1e-6)

    v, t, n = shapes.cube(2.0)
    rv, rt, rn = ref_shapes.cube(2.0)
    np.testing.assert_allclose(np.asarray(v), rv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t), rt.numpy())
    np.testing.assert_allclose(np.asarray(n), rn.numpy(), atol=1e-6)


def test_obj_roundtrip():
    vertices, triangles, normals = shapes.cube(1.0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cube.obj")
        obj_io.save_obj(path, vertices, triangles, normals)
        v, f, n = obj_io.load_obj(path, normalize=False)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vertices),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(triangles))
        # Normals are averaged per-vertex on load; cube corner normals are
        # already per-vertex so they should round trip.
        np.testing.assert_allclose(np.asarray(n), np.asarray(normals),
                                   atol=1e-5)


@needs_reference
def test_load_teapot_matches_reference():
    import torch
    src = import_reference()
    from src.common import obj_utils as ref_obj

    teapot = "/root/reference/src/examples/teapot.obj"
    if not os.path.exists(teapot):
        pytest.skip("teapot asset missing")
    v, f, n = obj_io.load_obj(teapot)
    rv, rf, rn = ref_obj.load_obj(teapot)
    np.testing.assert_allclose(np.asarray(v), rv.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f), rf.numpy())
    np.testing.assert_allclose(np.asarray(n), rn.numpy(), atol=1e-4)


def test_edges_list_cube():
    _, triangles, _ = shapes.cube(1.0)
    edges = np.asarray(mesh.compute_edges_list(triangles))
    assert edges.shape[1] == 2
    # A cube as 12 triangles has 18 undirected edges; directed unique pairs
    # may double-count orientation, so bound loosely and check symmetry-free
    # uniqueness.
    assert len(np.unique(edges, axis=0)) == len(edges)
