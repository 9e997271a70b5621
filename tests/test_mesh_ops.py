"""Mesh ops, shapes, and OBJ IO parity tests."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.models import shapes
from pytorch_mesh_renderer_tpu.ops import mesh
from pytorch_mesh_renderer_tpu.utils import obj_io

from conftest import ASSETS_DIR, import_reference, oracle_snapshot

TEAPOT_OBJ = os.path.join(ASSETS_DIR, "teapot.obj")


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


def test_vertex_normals_match_reference():
    rng = np.random.RandomState(1)
    verts = rng.uniform(-1, 1, size=[2, 30, 3]).astype(np.float32)
    tris = rng.randint(0, 30, size=[40, 3]).astype(np.int32)

    def compute():
        import torch
        import_reference()
        from src.common import meshes as ref_meshes

        return {"normals": ref_meshes.compute_vertex_normals(
            torch.tensor(verts), torch.tensor(tris)).numpy()}

    ref = oracle_snapshot("vertex_normals_random", compute)
    ours = np.asarray(mesh.compute_vertex_normals(
        jnp.asarray(verts), jnp.asarray(tris)))
    np.testing.assert_allclose(ours, ref["normals"], atol=1e-5)


def test_shapes_match_reference():
    def compute():
        import torch  # noqa: F401
        import_reference()
        from src.common import shapes as ref_shapes

        out = {}
        for res in (3, 7):
            rv, rt, rn = ref_shapes.sphere(1.5, resolution=res)
            out[f"sphere{res}_v"] = rv.numpy()
            out[f"sphere{res}_t"] = rt.numpy()
            out[f"sphere{res}_n"] = rn.numpy()
        rv, rt, rn = ref_shapes.cube(2.0)
        out["cube_v"], out["cube_t"], out["cube_n"] = (
            rv.numpy(), rt.numpy(), rn.numpy())
        return out

    ref = oracle_snapshot("shapes", compute)

    for res in (3, 7):
        v, t, n = shapes.sphere(1.5, resolution=res)
        np.testing.assert_allclose(np.asarray(v), ref[f"sphere{res}_v"],
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(t), ref[f"sphere{res}_t"])
        np.testing.assert_allclose(np.asarray(n), ref[f"sphere{res}_n"],
                                   atol=1e-6)

    v, t, n = shapes.cube(2.0)
    np.testing.assert_allclose(np.asarray(v), ref["cube_v"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t), ref["cube_t"])
    np.testing.assert_allclose(np.asarray(n), ref["cube_n"], atol=1e-6)


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


def test_load_teapot_matches_reference():
    """OBJ loader parity on the vendored teapot asset (assets/teapot.obj,
    copied from the reference's example data)."""
    def compute():
        import_reference()
        from src.common import obj_utils as ref_obj

        rv, rf, rn = ref_obj.load_obj(TEAPOT_OBJ)
        return {"v": rv.numpy(), "f": rf.numpy(), "n": rn.numpy()}

    ref = oracle_snapshot("teapot_load", compute)
    v, f, n = obj_io.load_obj(TEAPOT_OBJ)
    np.testing.assert_allclose(np.asarray(v), ref["v"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f), ref["f"])
    np.testing.assert_allclose(np.asarray(n), ref["n"], atol=1e-4)


def test_edges_list_cube():
    _, triangles, _ = shapes.cube(1.0)
    edges = np.asarray(mesh.compute_edges_list(triangles))
    assert edges.shape[1] == 2
    # A cube as 12 triangles has 18 undirected edges; directed unique pairs
    # may double-count orientation, so bound loosely and check symmetry-free
    # uniqueness.
    assert len(np.unique(edges, axis=0)) == len(edges)
