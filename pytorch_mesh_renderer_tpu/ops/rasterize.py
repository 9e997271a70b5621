"""Hard rasterization + attribute interpolation (batched, differentiable).

Parity target: /root/reference/src/mesh_renderer/rasterize.py:14-152. The
reference loops over the batch in Python (rasterize.py:112-121); here the
per-image kernel is `vmap`ped so the whole batch compiles into one XLA
program, and backend selection (dense XLA kernel vs tiled Pallas kernel)
replaces the reference's USE_CPP_RASTERIZER global.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as config_lib
from . import camera
from .rasterize_xla import rasterize_barycentric_xla


def _select_backend(cfg):
    backend = cfg.backend
    if backend == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no devices at all
            platform = "cpu"
        backend = "pallas" if platform == "tpu" else "xla"
    return backend


def rasterize_barycentric(clip_space_vertices, triangles, image_width,
                          image_height, config=None, row_offset=None,
                          full_height=None):
    """Rasterize one mesh in clip space to (ids, barycentrics, z-buffer).

    Backend dispatch equivalent of rasterize.py:15-25. See
    rasterize_xla.rasterize_barycentric_xla for the output contract and the
    row-sharding (`row_offset`/`full_height`) semantics.
    """
    cfg = config or config_lib.HARD_CONFIG
    backend = _select_backend(cfg)
    if backend == "pallas":
        try:
            from .rasterize_pallas import rasterize_barycentric_pallas
        except ImportError:
            backend = "xla"
        else:
            return rasterize_barycentric_pallas(
                clip_space_vertices, triangles, image_width, image_height,
                row_offset=row_offset, full_height=full_height,
                interpret=cfg.interpret, dot_precision=cfg.dot_precision,
                binning=cfg.binning)
    return rasterize_barycentric_xla(
        clip_space_vertices, triangles, image_width, image_height,
        cfg.triangle_chunk, row_offset=row_offset, full_height=full_height)


def rasterize(world_space_vertices, attributes, triangles, camera_matrices,
              image_width, image_height, background_value, config=None,
              row_offset=None, full_height=None):
    """Rasterize a batch of meshes and interpolate vertex attributes.

    Args:
      world_space_vertices: [batch_size, vertex_count, 3] f32 xyz positions.
      attributes: [batch_size, vertex_count, attribute_count] f32, each
        attribute barycentrically interpolated across its triangle.
      triangles: [triangle_count, 3] i32, CW winding toward the viewer
        (reference convention, rasterize.py:39-44).
      camera_matrices: [batch_size, 4, 4] f32 model-view-perspective.
      image_width, image_height: static ints.
      background_value: [attribute_count] f32 value for uncovered pixels.

    Returns:
      [batch_size, image_height, image_width, attribute_count] f32.

    Parity: rasterize.py:27-63.
    """
    clip_space_vertices = camera.transform_homogeneous(
        camera_matrices, world_space_vertices)
    return rasterize_clip_space(clip_space_vertices, attributes, triangles,
                                image_width, image_height, background_value,
                                config=config, row_offset=row_offset,
                                full_height=full_height)


def rasterize_clip_space(clip_space_vertices, attributes, triangles,
                         image_width, image_height, background_value,
                         config=None, row_offset=None, full_height=None):
    """Rasterize clip-space meshes and interpolate vertex attributes.

    Semantics (rasterize.py:66-152): per-pixel corner attributes are gathered
    via the winning triangle's vertex ids and summed with barycentric
    weights; alpha = clamp(2 * sum(barycentrics), 0, 1) composites the result
    over `background_value`.
    """
    if not image_width > 0:
        raise ValueError("Image width must be > 0.")
    if not image_height > 0:
        raise ValueError("Image height must be > 0.")
    if clip_space_vertices.ndim != 3:
        raise ValueError("The vertex buffer must be 3D.")

    tris = jnp.asarray(triangles, jnp.int32)

    cfg = config or config_lib.HARD_CONFIG
    if _select_backend(cfg) == "pallas":
        # Batch is a native grid dimension of the Pallas kernels (one
        # pallas_call for the whole batch; vmap-free), and attribute
        # interpolation is fused into the kernel: per-pixel gathers from
        # [B, V, A] (and the pixel-count-sized scatter-add in the backward)
        # do not vectorize on TPU and cost more than rasterization itself.
        from .rasterize_pallas import rasterize_interpolate_pallas_batched
        _, px_barycentric, attribute_images = (
            rasterize_interpolate_pallas_batched(
                clip_space_vertices, jnp.asarray(attributes, jnp.float32),
                tris, image_width, image_height,
                row_offset=row_offset, full_height=full_height,
                interpret=cfg.interpret, dot_precision=cfg.dot_precision,
                spatial_sort=cfg.spatial_sort, binning=cfg.binning))
    else:
        def kernel(verts):
            return rasterize_barycentric(
                verts, tris, image_width, image_height, config=config,
                row_offset=row_offset, full_height=full_height)

        px_triangle_ids, px_barycentric, _ = jax.vmap(kernel)(
            clip_space_vertices)

        corner_ids = tris[px_triangle_ids]  # [B, H, W, 3]
        # Interpolate corner-by-corner instead of materializing the
        # [B, H, W, 3, A] gather: a 9-wide minor dimension lane-pads 14x on
        # TPU, which at 512^2 x large batches is gigabytes of wasted HBM.
        gather = jax.vmap(lambda attr, ids: attr[ids])
        attribute_images = sum(
            gather(attributes, corner_ids[..., k]) *
            px_barycentric[..., k:k + 1]
            for k in range(3))  # [B, H, W, A]

    alphas = jnp.clip(
        jnp.sum(2.0 * px_barycentric, axis=-1), 0.0, 1.0)[..., None]
    background_value = jnp.asarray(background_value, jnp.float32)
    return alphas * attribute_images + (1.0 - alphas) * background_value
