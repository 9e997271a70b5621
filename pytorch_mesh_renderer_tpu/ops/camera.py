"""Camera and projective-geometry math.

TPU-native (jax.numpy) implementation of the scene math layer. Behavioral
parity with the reference library's camera utilities
(/root/reference/src/common/camera_utils.py:10-170): XYZ Tait-Bryan euler
rotation matrices, a gluLookAt-style view matrix, a gluPerspective-style
projection, and batched homogeneous transforms. Everything here is a pure
function over f32 arrays and is safe under jit/vmap/grad.

Unlike the reference (which raises on degenerate cameras via host asserts,
camera_utils.py:65-76), `look_at` performs the degeneracy checks eagerly
when called with concrete (non-traced) inputs; under `jit` the values are
tracers and no host assert can run, so by default a degenerate camera
silently produces NaNs downstream. Enabling debug checks
(config.set_debug_checks(True) or MESH_RENDERER_DEBUG=1) restores the
reference's guard semantics as TRACED runtime warnings inside jitted
steps (utils.debug.debug_warn_if).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_lib
from ..utils.debug import debug_warn_if
from .math_utils import normalize

_DEGENERACY_CUTOFF = 1e-6


def euler_matrices(angles: jnp.ndarray) -> jnp.ndarray:
    """XYZ Tait-Bryan (improper euler angle) rotation as 4x4 matrices.

    Args:
      angles: [batch_size, 3] tensor of X, Y, Z angles in radians.

    Returns:
      [batch_size, 4, 4] f32 rotation matrices.

    Parity: /root/reference/src/common/camera_utils.py:10-42.
    """
    angles = jnp.asarray(angles, jnp.float32)
    s = jnp.sin(angles)
    c = jnp.cos(angles)
    c0, c1, c2 = c[:, 0], c[:, 1], c[:, 2]
    s0, s1, s2 = s[:, 0], s[:, 1], s[:, 2]
    zeros = jnp.zeros_like(s0)
    ones = jnp.ones_like(s0)

    rows = [
        [c2 * c1, c2 * s1 * s0 - c0 * s2, s2 * s0 + c2 * c0 * s1, zeros],
        [c1 * s2, c2 * c0 + s2 * s1 * s0, c0 * s2 * s1 - c2 * s0, zeros],
        [-s1, c1 * s0, c1 * c0, zeros],
        [zeros, zeros, zeros, ones],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def look_at(eye: jnp.ndarray, center: jnp.ndarray,
            world_up: jnp.ndarray) -> jnp.ndarray:
    """Right-handed world->eye camera extrinsics (gluLookAt semantics).

    Args:
      eye, center, world_up: [batch_size, 3] f32 tensors.

    Returns:
      [batch_size, 4, 4] f32 view matrices.

    Parity: /root/reference/src/common/camera_utils.py:45-96.
    """
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    world_up = jnp.asarray(world_up, jnp.float32)
    batch_size = center.shape[0]

    # Norms are written as explicit sqrt(sum(x*x)) rather than
    # jnp.linalg.norm: on TPU, XLA mis-lowers the cross+norm fusion under
    # jit (observed: wrong/NaN values for some batch elements on v5e),
    # while the explicit form compiles correctly.
    forward = center - eye
    forward_norm = jnp.sqrt(
        jnp.sum(forward * forward, axis=1, keepdims=True))
    if _is_concrete(forward_norm):
        np.testing.assert_array_less(
            _DEGENERACY_CUTOFF, np.asarray(forward_norm),
            err_msg="Camera matrix is degenerate because eye and center are "
                    "close.")
    elif config_lib.debug_checks_enabled():
        debug_warn_if(
            forward_norm <= _DEGENERACY_CUTOFF,
            "Camera matrix is degenerate because eye and center are close.")
    forward = forward / forward_norm

    to_side = jnp.cross(forward, world_up)
    to_side_norm = jnp.sqrt(
        jnp.sum(to_side * to_side, axis=1, keepdims=True))
    if _is_concrete(to_side_norm):
        np.testing.assert_array_less(
            _DEGENERACY_CUTOFF, np.asarray(to_side_norm),
            err_msg="Camera matrix is degenerate because up and gaze are too "
                    "close or because up is degenerate.")
    elif config_lib.debug_checks_enabled():
        debug_warn_if(
            to_side_norm <= _DEGENERACY_CUTOFF,
            "Camera matrix is degenerate because up and gaze are too close "
            "or because up is degenerate.")
    to_side = to_side / to_side_norm
    cam_up = jnp.cross(to_side, forward)

    # Rotation part: rows are (to_side, cam_up, -forward).
    zeros_col = jnp.zeros([batch_size, 3, 1], jnp.float32)
    rotation = jnp.stack([to_side, cam_up, -forward], axis=1)  # [B, 3, 3]
    rotation = jnp.concatenate([rotation, zeros_col], axis=2)  # [B, 3, 4]
    w_row = jnp.tile(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], jnp.float32), [batch_size, 1, 1])
    view_rotation = jnp.concatenate([rotation, w_row], axis=1)  # [B, 4, 4]

    # Translation part: identity with -eye in the last column.
    identity = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], [batch_size, 1, 1])
    translation = jnp.concatenate([identity, -eye[:, :, None]], axis=2)
    view_translation = jnp.concatenate([translation, w_row], axis=1)

    # Tiny 4x4 matmuls: force full f32 precision so camera matrices agree
    # with the reference bit-for-bit even on TPU (default matmul is bf16).
    return jnp.matmul(view_rotation, view_translation,
                      precision=jax.lax.Precision.HIGHEST)


def perspective(aspect_ratio, fov_y, near_clip, far_clip) -> jnp.ndarray:
    """Perspective projection matrices (gluPerspective semantics).

    Args:
      aspect_ratio: float, image width / height.
      fov_y: [batch_size] f32 vertical field of view in degrees.
      near_clip, far_clip: [batch_size] f32 clip plane distances.

    Returns:
      [batch_size, 4, 4] f32 matrices mapping right-handed eye space to
      left-handed clip space.

    Parity: /root/reference/src/common/camera_utils.py:99-139.
    """
    fov_y = jnp.asarray(fov_y, jnp.float32)
    near_clip = jnp.asarray(near_clip, jnp.float32)
    far_clip = jnp.asarray(far_clip, jnp.float32)
    # pi/360 converts degrees to radians and halves the angle in one step.
    focal_y = 1.0 / jnp.tan(fov_y * (math.pi / 360.0))
    depth_range = far_clip - near_clip
    p_22 = -(far_clip + near_clip) / depth_range
    p_23 = -2.0 * (far_clip * near_clip / depth_range)

    zeros = jnp.zeros_like(p_23)
    rows = [
        [focal_y / aspect_ratio, zeros, zeros, zeros],
        [zeros, focal_y, zeros, zeros],
        [zeros, zeros, p_22, p_23],
        [zeros, zeros, -jnp.ones_like(p_23), zeros],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def transform_homogeneous(matrices: jnp.ndarray,
                          vertices: jnp.ndarray) -> jnp.ndarray:
    """Applies batched 4x4 homogeneous transforms to xyz vertices.

    Computes (M V^T)^T with vertices extended to xyzw, w=1.

    Args:
      matrices: [batch_size, 4, 4] f32.
      vertices: [batch_size, N, 3] f32.

    Returns:
      [batch_size, N, 4] f32 xyzw vertices.

    Parity: /root/reference/src/common/camera_utils.py:142-170.
    """
    matrices = jnp.asarray(matrices, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    if matrices.ndim != 3:
        raise ValueError(
            "matrices must have 3 dimensions (missing batch dimension?)")
    if vertices.ndim != 3:
        raise ValueError(
            "vertices must have 3 dimensions (missing batch dimension?)")
    homogeneous = jnp.concatenate(
        [vertices, jnp.ones(vertices.shape[:2] + (1,), vertices.dtype)],
        axis=2)
    # Full f32 precision: vertex projection feeds edge functions whose sign
    # decides pixel coverage; bf16 here would shift silhouettes by pixels.
    return jnp.matmul(homogeneous, jnp.swapaxes(matrices, 1, 2),
                      precision=jax.lax.Precision.HIGHEST)


def clip_space_transforms(camera_position, camera_lookat, camera_up,
                          fov_y, near_clip, far_clip,
                          image_width: int, image_height: int) -> jnp.ndarray:
    """Convenience: perspective(fov) @ look_at(eye, center, up)."""
    camera_matrices = look_at(camera_position, camera_lookat, camera_up)
    perspective_transforms = perspective(
        image_width / image_height, fov_y, near_clip, far_clip)
    return jnp.matmul(perspective_transforms, camera_matrices,
                      precision=jax.lax.Precision.HIGHEST)
