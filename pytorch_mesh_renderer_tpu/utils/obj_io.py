"""Wavefront .obj load/save (host-side IO).

Parity target: /root/reference/src/common/obj_utils.py:6-111. Supports
v/vn/f records and `f v//vn` face-vertex normals (averaged to one normal per
vertex); optionally normalizes the mesh into a +-1 cube. Parsing runs on the
host in numpy (IO is not a device workload); the returned arrays are jnp
tensors ready for the TPU compute path.

If the optional native C++ parser (native/libmeshops) is built, large files
are parsed through it; the numpy path is the always-available fallback with
identical outputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.mesh import compute_vertex_normals


def _parse_obj_python(lines):
    vertices = []
    all_normals = []
    vertex_id_to_normals = {}
    faces = []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            vertices.append([float(v) for v in parts[1:4]])
        elif parts[0] == "vn":
            all_normals.append([float(v) for v in parts[1:4]])
        elif parts[0] == "f":
            face_vertices = parts[1:]
            if len(face_vertices) > 3:
                print("warning: encountered a face with more than 3 "
                      "vertices, extra vertices will be skipped")
            faces.append(
                [int(fv.split("/")[0]) for fv in face_vertices[:3]])
            if len(face_vertices[0].split("/")) > 2:
                for fv in face_vertices[:3]:
                    fv_parts = fv.split("/")
                    vertex_id = int(fv_parts[0]) - 1
                    normal_id = int(fv_parts[2]) - 1
                    vertex_id_to_normals.setdefault(vertex_id, []).append(
                        normal_id)
    return vertices, all_normals, vertex_id_to_normals, faces


def load_obj(filename: str, normalize: bool = True):
    """Load a Wavefront .obj file.

    Only v / vn / f records are supported. Face-vertex normals
    (`f v//vn ...`) are averaged so each vertex gets exactly one normal;
    meshes without normals get area-weighted computed normals.

    Returns:
      (vertices [V, 3] f32, faces [T, 3] int32, normals [V, 3] f32) as jnp
      arrays. With normalize=True the vertices are rescaled into a unit cube
      centered near zero, exactly as the reference does
      (obj_utils.py:69-74).
    """
    parsed = None
    try:
        from . import native
        parsed = native.parse_obj(filename)
    except Exception:  # noqa: BLE001 - native path is best-effort
        parsed = None

    if parsed is not None:
        # Native C++ parser path: vectorized normal averaging.
        vertices, all_normals, faces, fn_ids = parsed
        vertices = vertices.astype(np.float32)
        faces = faces.astype(np.int32)
        has_vn = (fn_ids >= 0)
        if all_normals is None or not has_vn.any():
            normals = np.asarray(compute_vertex_normals(
                jnp.asarray(vertices)[None], jnp.asarray(faces))[0])
        else:
            acc = np.zeros_like(vertices)
            counts = np.zeros([len(vertices)], np.float32)
            vid = faces.ravel()[has_vn.ravel()]
            nid = fn_ids.ravel()[has_vn.ravel()]
            np.add.at(acc, vid, all_normals[nid])
            np.add.at(counts, vid, 1.0)
            normals = np.where(counts[:, None] > 0,
                               acc / np.maximum(counts[:, None], 1.0), 1.0)
            norm = np.linalg.norm(normals, axis=1, keepdims=True)
            normals = normals / np.maximum(norm, 1e-12)
    else:
        with open(filename) as f:
            lines = f.readlines()

        vertices, all_normals, vertex_id_to_normals, faces = (
            _parse_obj_python(lines))

        vertices = np.array(vertices, np.float32).reshape(-1, 3)
        faces = np.array(faces, np.int32).reshape(-1, 3) - 1
        all_normals = np.array(all_normals, np.float32).reshape(-1, 3)

        if not vertex_id_to_normals:
            normals = np.asarray(compute_vertex_normals(
                jnp.asarray(vertices)[None], jnp.asarray(faces))[0])
        else:
            normals = np.zeros_like(vertices)
            for i in range(len(vertices)):
                ids = vertex_id_to_normals.get(i)
                if not ids:
                    normals[i] = 1.0
                    continue
                normals[i] = all_normals[ids].sum(axis=0) / len(ids)
            norm = np.linalg.norm(normals, axis=1, keepdims=True)
            normals = normals / np.maximum(norm, 1e-12)

    if normalize:
        # Normalize into a unit cube centered around zero (reference order of
        # operations preserved: shift to positive, scale by max-abs, double,
        # recenter by half the max).
        vertices -= vertices.min(0)[None, :]
        vertices /= np.abs(vertices).max()
        vertices *= 2
        vertices -= vertices.max(0)[None, :] / 2

    return (jnp.asarray(vertices), jnp.asarray(faces),
            jnp.asarray(normals.astype(np.float32)))


def save_obj(filename: str, vertices, faces, normals=None) -> None:
    """Save a mesh to a Wavefront .obj file.

    Vertices/normals are written 1-1 (no per-face-vertex normals), matching
    the reference writer (obj_utils.py:78-111).
    """
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    if vertices.ndim != 2 or vertices.shape[1] != 3:
        raise ValueError("vertices must have shape [vertex_count, 3]")
    if faces.ndim != 2 or faces.shape[1] != 3:
        raise ValueError("faces must have shape [triangle_count, 3]")
    if normals is not None:
        normals = np.asarray(normals)
        if normals.ndim != 2 or normals.shape[1] != 3:
            raise ValueError("normals must have shape [vertex_count, 3]")
    with open(filename, "w") as f:
        for vertex in vertices:
            f.write("v {} {} {}\n".format(vertex[0], vertex[1], vertex[2]))
        # vn records come BEFORE the f records that reference them: strict
        # streaming OBJ readers reject forward references (the reference
        # writer emits them after, obj_utils.py:109-111 — a quirk not worth
        # preserving; our loader accepts either order).
        if normals is not None:
            for normal in normals:
                f.write("vn {} {} {}\n".format(normal[0], normal[1],
                                               normal[2]))
        for face in faces:
            if normals is not None:
                f.write("f {}//{} {}//{} {}//{}\n".format(
                    face[0] + 1, face[0] + 1, face[1] + 1, face[1] + 1,
                    face[2] + 1, face[2] + 1))
            else:
                f.write("f {} {} {}\n".format(
                    face[0] + 1, face[1] + 1, face[2] + 1))
