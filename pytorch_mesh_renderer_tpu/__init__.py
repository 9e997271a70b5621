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

from . import config, parallel
from .models import mesh_renderer, soft_mesh_renderer
from .models import shapes
from .ops import camera, losses, mesh
from .utils import checkpoint, debug, obj_io, profiling

__all__ = [
    "config", "parallel", "mesh_renderer", "soft_mesh_renderer", "shapes",
    "camera", "losses", "mesh", "obj_io", "checkpoint", "debug", "profiling",
]

__version__ = "0.1.0"
