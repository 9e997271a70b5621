"""Phong shading + tone mapping.

Parity target: /root/reference/src/mesh_renderer/render.py:231-419. The
pixelwise lighting math is expressed over [batch, light, pixel] axes with
broadcasting; under jit XLA fuses the whole shader into the rasterizer's
epilogue, so it is effectively free on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math_utils import normalize


def phong_shader(normals, alphas, pixel_positions, light_positions,
                 light_intensities, diffuse_colors=None, camera_position=None,
                 specular_colors=None, shininess_coefficients=None,
                 ambient_color=None):
    """Pixelwise Phong lighting from rasterized buffers.

    Args:
      normals: [B, H, W, 3] f32 world-space unit normals per pixel.
      alphas: [B, H, W] f32 per-pixel alpha.
      pixel_positions: [B, H, W, 3] f32 world-space positions per pixel.
      light_positions: [B, L, 3] f32.
      light_intensities: [B, L, 3] f32 (may exceed 1).
      diffuse_colors: [B, H, W, 3] f32 in [0, 1].
      camera_position: [B, 3] f32; if provided, specular terms are computed
        and specular_colors/shininess_coefficients are required.
      specular_colors: [B, H, W, 3] f32.
      shininess_coefficients: broadcastable to [B, H, W] f32.
      ambient_color: [B, 3] f32 added to each pixel (scaled by diffuse).

    Returns:
      [B, H, W, 4] f32 lit RGBA; RGB zeroed where alpha <= 0.5 and the image
      flipped vertically, matching render.py:373-386.
    """
    batch_size, image_height, image_width = normals.shape[:3]
    light_count = light_positions.shape[1]
    pixel_count = image_height * image_width

    normals = normals.reshape(batch_size, -1, 3)
    alphas = alphas.reshape(batch_size, -1, 1)
    diffuse_colors = diffuse_colors.reshape(batch_size, -1, 3)
    if camera_position is not None:
        specular_colors = specular_colors.reshape(batch_size, -1, 3)

    # Ambient component.
    output_colors = jnp.zeros([batch_size, pixel_count, 3], jnp.float32)
    if ambient_color is not None:
        output_colors = output_colors + (
            ambient_color[:, None, :] * diffuse_colors)

    # Diffuse component.
    pixel_positions = pixel_positions.reshape(batch_size, -1, 3)
    directions_to_lights = normalize(
        light_positions[:, :, None, :] - pixel_positions[:, None, :, :],
        p=2, axis=3)  # [B, L, P, 3]
    # Clamp: light contributes only when facing the surface.
    normals_dot_lights = jnp.clip(
        jnp.sum(normals[:, None, :, :] * directions_to_lights, axis=3),
        0.0, 1.0)  # [B, L, P]
    diffuse_output = (
        diffuse_colors[:, None, :, :] * normals_dot_lights[..., None] *
        light_intensities[:, :, None, :])
    output_colors = output_colors + jnp.sum(diffuse_output, axis=1)

    # Specular component.
    if camera_position is not None:
        camera_position = camera_position.reshape(batch_size, 1, 3)
        mirror_reflection_direction = normalize(
            2.0 * normals_dot_lights[..., None] * normals[:, None, :, :] -
            directions_to_lights, p=2, axis=3)
        direction_to_camera = normalize(
            camera_position - pixel_positions, p=2, axis=2)
        reflection_dot_camera = jnp.sum(
            mirror_reflection_direction * direction_to_camera[:, None, :, :],
            axis=3)  # [B, L, P]
        # The reference L2-normalizes across the pixel axis before clamping
        # (render.py:342-348); preserved verbatim for output parity.
        reflection_dot_camera = jnp.clip(
            normalize(reflection_dot_camera, p=2, axis=2), 0.0, 1.0)
        # Specular only contributes where diffuse does (render.py:351-356).
        reflection_dot_camera = jnp.where(
            normals_dot_lights != 0.0, reflection_dot_camera, 0.0)
        reflection_dot_camera = reflection_dot_camera.reshape(
            batch_size, light_count, image_height, image_width)
        shininess = jnp.asarray(shininess_coefficients, jnp.float32)
        shininess = shininess[:, None] if shininess.ndim > 0 else shininess
        specularity = jnp.power(reflection_dot_camera, shininess).reshape(
            batch_size, light_count, pixel_count, 1)
        specular_output = (
            specular_colors[:, None, :, :] * specularity *
            light_intensities[:, :, None, :])
        output_colors = output_colors + jnp.sum(specular_output, axis=1)

    rgb_images = output_colors.reshape(
        batch_size, image_height, image_width, 3)
    alpha_images = alphas.reshape(batch_size, image_height, image_width, 1)
    valid_rgb = alpha_images > 0.5
    rgb_images = jnp.where(valid_rgb, rgb_images, 0.0)
    return jnp.flip(
        jnp.concatenate([rgb_images, alpha_images], axis=3), axis=1)


def tone_mapper(image, gamma):
    """Gamma correction with per-image max rescaling.

    Computes A * image**gamma with A chosen per image so the max value is
    ~1, then clips to [0, 1]. Parity: render.py:389-419, hardened: an
    all-black image (max 0, which would NaN under the reference's unguarded
    divide) passes through unscaled.
    """
    batch_size = image.shape[0]
    corrected_image = jnp.power(image, gamma)
    image_max = jnp.max(corrected_image.reshape(batch_size, -1), axis=1)
    safe_max = jnp.where(image_max > 0.0, image_max, 1.0)
    scaled_image = corrected_image / safe_max.reshape(batch_size, 1, 1, 1)
    return jnp.clip(scaled_image, 0.0, 1.0)
