"""ctypes bindings for the native C++ host runtime (native/meshops.cpp).

The library is built lazily with `make -C native` on first use and cached;
callers must handle `load_library() is None` (pure-python fallback). No
pybind11 — the ABI is plain C, marshalled with ctypes + numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmeshops.so")

_lock = threading.Lock()
_lib = None
_load_attempted = False


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("vertex_count", ctypes.c_long),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("normal_count", ctypes.c_long),
        ("faces", ctypes.POINTER(ctypes.c_int)),
        ("face_count", ctypes.c_long),
        ("face_normal_ids", ctypes.POINTER(ctypes.c_int)),
        ("skipped_face_vertices", ctypes.c_long),
        ("error", ctypes.c_char * 256),
    ]


def load_library():
    """Returns the loaded native library, building it if needed, or None."""
    global _lib, _load_attempted
    with _lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        if not os.path.exists(os.path.join(_NATIVE_DIR, "meshops.cpp")):
            return None
        # Always invoke make (it is timestamp-incremental): a prebuilt .so
        # from an older source revision would otherwise be loaded against a
        # newer ctypes struct layout — an ABI mismatch that misparses every
        # field after the change point.
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"[native] build failed ({e}); using python fallback",
                  file=sys.stderr)
            return None
        if not os.path.exists(_LIB_PATH):  # pragma: no cover
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            print(f"[native] load failed ({e}); using python fallback",
                  file=sys.stderr)
            return None
        lib.meshops_load_obj.restype = ctypes.POINTER(_ObjMesh)
        lib.meshops_load_obj.argtypes = [ctypes.c_char_p]
        lib.meshops_free.argtypes = [ctypes.POINTER(_ObjMesh)]
        lib.meshops_save_obj.restype = ctypes.c_int
        lib.meshops_save_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def parse_obj(path: str):
    """Parses an .obj with the native library.

    Returns (vertices [V,3] f32, raw_normals [N,3] f32 or None,
    faces [T,3] i32, face_normal_ids [T,3] i32 with -1 for absent) or None
    when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    mesh_p = lib.meshops_load_obj(path.encode())
    if not mesh_p:  # calloc failure in the library
        return None
    try:
        mesh = mesh_p.contents
        err = bytes(mesh.error).split(b"\0", 1)[0]
        if err:
            raise IOError(err.decode())
        if mesh.skipped_face_vertices:
            print(f"warning: obj file has faces with more than 3 vertices; "
                  f"{mesh.skipped_face_vertices} face vertices were dropped",
                  file=sys.stderr)
        v = np.ctypeslib.as_array(
            mesh.vertices, shape=(mesh.vertex_count, 3)).copy()
        faces = np.ctypeslib.as_array(
            mesh.faces, shape=(mesh.face_count, 3)).copy()
        fn_ids = np.ctypeslib.as_array(
            mesh.face_normal_ids, shape=(mesh.face_count, 3)).copy()
        normals = None
        if mesh.normal_count:
            normals = np.ctypeslib.as_array(
                mesh.normals, shape=(mesh.normal_count, 3)).copy()
        return v, normals, faces, fn_ids
    finally:
        lib.meshops_free(mesh_p)


def write_obj(path: str, vertices, faces, normals=None) -> bool:
    """Writes an .obj with the native library. Returns False if unavailable."""
    lib = load_library()
    if lib is None:
        return False
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    normals_p = None
    if normals is not None:
        normals = np.ascontiguousarray(normals, np.float32)
        normals_p = normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.meshops_save_obj(
        path.encode(),
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vertices.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), faces.shape[0],
        normals_p)
    if rc != 0:
        raise IOError(f"cannot write {path}")
    return True
