"""Hard (Genova 2018 sampled un-clipped barycentric) mesh renderer.

Parity target: /root/reference/src/mesh_renderer/render.py:16-228 — argument
validation and broadcasting, attribute packing, camera matrix construction,
rasterization with background value -1, Phong shading with the diffuse-based
pixel mask, and vertical flip. The whole pipeline is pure jax and jits into a
single XLA program (the reference runs eagerly per batch element).

Triangle winding: clockwise as seen from the viewer (the reference's hard
convention, render.py:40-44). The soft renderer uses CCW; see
models/soft_mesh_renderer.py and the reference TODO at render.py:44.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as config_lib
from ..ops import camera
from ..ops.rasterize import rasterize
from ..ops.shading import phong_shader, tone_mapper  # re-export: tone_mapper
from ..ops.math_utils import normalize
from ..utils.debug import debug_check_finite

__all__ = ["render", "phong_shader", "tone_mapper"]


def _broadcast_camera_vec(value, batch_size, name):
    value = jnp.asarray(value, jnp.float32)
    if value.shape == (3,):
        return jnp.tile(value[None, :], [batch_size, 1])
    if value.shape != (batch_size, 3):
        raise ValueError(
            "%s must have shape [batch_size, 3] or [3]." % name)
    return value


def _broadcast_scalar(value, batch_size, name):
    if isinstance(value, (float, int)):
        return jnp.full([batch_size], float(value), jnp.float32)
    value = jnp.asarray(value, jnp.float32)
    if value.ndim == 0:
        return jnp.tile(value[None], [batch_size])
    if value.shape != (batch_size,):
        raise ValueError(
            "%s must be a float, a 0D tensor, or a 1D tensor with shape "
            "[batch_size]." % name)
    return value


def render(vertices, triangles, normals, diffuse_colors, camera_position,
           camera_lookat, camera_up, light_positions, light_intensities,
           image_width, image_height, specular_colors=None,
           shininess_coefficients=None, ambient_color=None, fov_y=40.0,
           near_clip=0.01, far_clip=10.0, config=None):
    """Renders an input scene with Phong shading to an RGBA image batch.

    See the reference docstring (render.py:34-95) for full argument
    semantics; shapes and defaults are identical. Returns a
    [batch_size, image_height, image_width, 4] f32 tensor of lit RGBA; RGB is
    pre-tonemapping (may exceed 1), alpha is ~1 on mesh pixels and 0 on
    background.
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    if vertices.ndim != 3 or vertices.shape[-1] != 3:
        raise ValueError(
            "Vertices must have shape [batch_size, vertex_count, 3].")
    batch_size = vertices.shape[0]
    normals = jnp.asarray(normals, jnp.float32)
    if normals.ndim != 3 or normals.shape[-1] != 3:
        raise ValueError(
            "Normals must have shape [batch_size, vertex_count, 3].")
    light_positions = jnp.asarray(light_positions, jnp.float32)
    if light_positions.ndim != 3 or light_positions.shape[-1] != 3:
        raise ValueError(
            "light_positions must have shape [batch_size, light_count, 3].")
    light_intensities = jnp.asarray(light_intensities, jnp.float32)
    if light_intensities.ndim != 3 or light_intensities.shape[-1] != 3:
        raise ValueError(
            "light_intensities must have shape [batch_size, light_count, 3].")
    diffuse_colors = jnp.asarray(diffuse_colors, jnp.float32)
    if diffuse_colors.ndim != 3 or diffuse_colors.shape[-1] != 3:
        raise ValueError(
            "diffuse_colors must have shape [batch_size, vertex_count, 3].")
    if ambient_color is not None:
        ambient_color = jnp.asarray(ambient_color, jnp.float32)
        if list(ambient_color.shape) != [batch_size, 3]:
            raise ValueError("ambient_color must have shape [batch_size, 3].")
    camera_position = _broadcast_camera_vec(camera_position, batch_size,
                                            "camera_position")
    camera_lookat = _broadcast_camera_vec(camera_lookat, batch_size,
                                          "camera_lookat")
    camera_up = _broadcast_camera_vec(camera_up, batch_size, "camera_up")
    fov_y = _broadcast_scalar(fov_y, batch_size, "fov_y")
    near_clip = _broadcast_scalar(near_clip, batch_size, "near_clip")
    far_clip = _broadcast_scalar(far_clip, batch_size, "far_clip")
    if specular_colors is not None and shininess_coefficients is None:
        raise ValueError(
            "Specular colors were supplied without shininess coefficients.")
    if shininess_coefficients is not None and specular_colors is None:
        raise ValueError(
            "Shininess coefficients were supplied without specular colors.")
    if specular_colors is not None:
        specular_colors = jnp.asarray(specular_colors, jnp.float32)
        if isinstance(shininess_coefficients, float):
            shininess_coefficients = jnp.asarray(shininess_coefficients,
                                                 jnp.float32)
        shininess_coefficients = jnp.asarray(shininess_coefficients,
                                             jnp.float32)
        if specular_colors.ndim != 3:
            raise ValueError(
                "The specular colors must have shape [batch_size, "
                "vertex_count, 3].")
        if shininess_coefficients.ndim > 2:
            raise ValueError(
                "The shininess coefficients must have shape at most "
                "[batch_size, vertex_count].")
        # Per-vertex shininess gets interpolated as an attribute; scalar /
        # per-batch shininess just broadcasts later (render.py:168-179).
        if shininess_coefficients.ndim < 2:
            vertex_attributes = jnp.concatenate(
                [normals, vertices, diffuse_colors, specular_colors], axis=2)
        else:
            vertex_attributes = jnp.concatenate(
                [normals, vertices, diffuse_colors, specular_colors,
                 shininess_coefficients[..., None]], axis=2)
    else:
        vertex_attributes = jnp.concatenate(
            [normals, vertices, diffuse_colors], axis=2)

    clip_space_transforms = camera.clip_space_transforms(
        camera_position, camera_lookat, camera_up, fov_y, near_clip,
        far_clip, image_width, image_height)

    background_value = -1.0 * jnp.ones(
        [vertex_attributes.shape[2]], jnp.float32)
    pixel_attributes = rasterize(
        vertices, vertex_attributes, triangles, clip_space_transforms,
        image_width, image_height, background_value, config=config)

    pixel_normals = normalize(pixel_attributes[..., 0:3], p=2, axis=3)
    pixel_positions = pixel_attributes[..., 3:6]
    pixel_diffuse = pixel_attributes[..., 6:9]
    pixel_specular = None
    shininess_for_shader = None
    if specular_colors is not None:
        pixel_specular = pixel_attributes[..., 9:12]
        if shininess_coefficients.ndim == 2:
            shininess_for_shader = pixel_attributes[..., 12]
        else:
            shininess_for_shader = shininess_coefficients.reshape(-1, 1, 1)

    pixel_mask = jnp.any(pixel_diffuse >= 0.0, axis=3).astype(jnp.float32)

    images = phong_shader(
        normals=pixel_normals,
        alphas=pixel_mask,
        pixel_positions=pixel_positions,
        light_positions=light_positions,
        light_intensities=light_intensities,
        diffuse_colors=pixel_diffuse,
        camera_position=(camera_position if specular_colors is not None
                         else None),
        specular_colors=pixel_specular,
        shininess_coefficients=shininess_for_shader,
        ambient_color=ambient_color)
    if config_lib.debug_checks_enabled():
        # Opt-in traced guard (reference parity: its camera asserts are
        # always-on, camera_utils.py:65-76, but cannot run on tracers) —
        # a degenerate camera or NaN input surfaces here as a runtime
        # warning instead of silently poisoning the training loss.
        debug_check_finite(images, "mesh_renderer.render output")
    return images
