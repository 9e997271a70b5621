"""Compute ops: camera math, mesh ops, rasterization kernels, shading."""

from . import barycentric, camera, math_utils, mesh, shading  # noqa: F401
