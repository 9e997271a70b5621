"""Compute ops: camera math, mesh ops, rasterization kernels, shading."""

from . import (barycentric, camera, losses, math_utils, mesh,  # noqa: F401
               shading)
