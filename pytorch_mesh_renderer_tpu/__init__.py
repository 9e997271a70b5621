"""pytorch_mesh_renderer_tpu — a TPU-native differentiable mesh renderer.

A brand-new JAX/XLA/Pallas framework with the capability set of
andrewkchan/pytorch_mesh_renderer (see SURVEY.md): two differentiable
triangle-mesh renderers —

  * `mesh_renderer`: hard barycentric rasterization (Genova 2018 un-clipped
    formulation) with an analytic custom_vjp backward pass;
  * `soft_mesh_renderer`: SoftRas probabilistic rasterization (Liu 2019)
    with sigmoid-distance coverage and softmax-depth aggregation;

plus scene math (cameras, normals, shapes, OBJ IO), Phong shading, inverse
rendering losses, and `shard_map` data parallelism over TPU meshes.

Typical use mirrors the reference library:

    import pytorch_mesh_renderer_tpu as pmr
    images = pmr.mesh_renderer.render(vertices, triangles, normals, ...)
    images = pmr.soft_mesh_renderer.render(vertices, triangles, colors, ...)
"""

from . import config
from .models import mesh_renderer, soft_mesh_renderer
from .models import shapes
from .ops import camera, mesh
from .utils import obj_io, debug

__all__ = [
    "config", "mesh_renderer", "soft_mesh_renderer", "shapes", "camera",
    "mesh", "obj_io", "debug",
]

__version__ = "0.1.0"
