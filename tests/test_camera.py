"""Scene-math parity tests: camera utilities vs hand values and the
reference implementation (when importable)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops import camera

from conftest import import_reference, oracle_snapshot


def test_euler_matrices_identity():
    m = camera.euler_matrices(jnp.zeros([2, 3]))
    np.testing.assert_allclose(np.asarray(m),
                               np.tile(np.eye(4), [2, 1, 1]), atol=1e-6)


def test_euler_matrices_single_axis():
    # Rotation about Z only: angles = (0, 0, theta).
    theta = 0.3
    m = camera.euler_matrices(jnp.array([[0.0, 0.0, theta]]))[0]
    c, s = np.cos(theta), np.sin(theta)
    expected = np.array([
        [c, -s, 0, 0],
        [s, c, 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ])
    np.testing.assert_allclose(np.asarray(m), expected, atol=1e-6)


def test_look_at_axis_aligned():
    eye = jnp.array([[0.0, 0.0, 6.0]])
    center = jnp.array([[0.0, 0.0, 0.0]])
    up = jnp.array([[0.0, 1.0, 0.0]])
    m = np.asarray(camera.look_at(eye, center, up))[0]
    # Camera at +z looking at origin: x stays, z offsets by -6.
    p = m @ np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(p, [1.0, 2.0, -3.0, 1.0], atol=1e-6)


def test_look_at_degenerate_raises():
    eye = jnp.array([[0.0, 0.0, 0.0]])
    center = jnp.array([[0.0, 0.0, 0.0]])
    up = jnp.array([[0.0, 1.0, 0.0]])
    with pytest.raises(AssertionError):
        camera.look_at(eye, center, up)


def test_perspective_maps_near_far():
    m = np.asarray(camera.perspective(
        1.0, jnp.array([90.0]), jnp.array([1.0]), jnp.array([10.0])))[0]
    # Point on near plane maps to z/w = -1, far plane to +1.
    near = m @ np.array([0.0, 0.0, -1.0, 1.0])
    far = m @ np.array([0.0, 0.0, -10.0, 1.0])
    np.testing.assert_allclose(near[2] / near[3], -1.0, atol=1e-6)
    np.testing.assert_allclose(far[2] / far[3], 1.0, atol=1e-6)


def test_transform_homogeneous_validates_rank():
    with pytest.raises(ValueError):
        camera.transform_homogeneous(jnp.eye(4), jnp.zeros([1, 3, 3]))
    with pytest.raises(ValueError):
        camera.transform_homogeneous(jnp.eye(4)[None], jnp.zeros([3, 3]))


def test_camera_stack_matches_reference():
    """Oracle parity for the four camera ops (live reference or vendored
    tests/oracle snapshot — deterministic fixed-seed inputs)."""
    rng = np.random.RandomState(0)
    angles = rng.uniform(-np.pi, np.pi, size=[4, 3]).astype(np.float32)
    eye = rng.uniform(2, 4, size=[3, 3]).astype(np.float32)
    center = rng.uniform(-0.5, 0.5, size=[3, 3]).astype(np.float32)
    up = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), [3, 1])
    fov = np.array([30.0, 40.0, 70.0], np.float32)
    near = np.array([0.01, 0.1, 1.0], np.float32)
    far = np.array([10.0, 20.0, 5.0], np.float32)
    mats = rng.uniform(-1, 1, size=[3, 4, 4]).astype(np.float32)
    verts = rng.uniform(-1, 1, size=[3, 17, 3]).astype(np.float32)

    def compute():
        import torch
        import_reference()
        from src.common import camera_utils as ref_cam

        return {
            "euler": ref_cam.euler_matrices(torch.tensor(angles)).numpy(),
            "look_at": ref_cam.look_at(
                torch.tensor(eye), torch.tensor(center),
                torch.tensor(up)).numpy(),
            "perspective": ref_cam.perspective(
                640 / 480, torch.tensor(fov), torch.tensor(near),
                torch.tensor(far)).numpy(),
            "transform": ref_cam.transform_homogeneous(
                torch.tensor(mats), torch.tensor(verts)).numpy(),
        }

    ref = oracle_snapshot("camera_stack", compute)

    np.testing.assert_allclose(
        np.asarray(camera.euler_matrices(jnp.asarray(angles))),
        ref["euler"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(camera.look_at(eye, center, up)), ref["look_at"],
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(camera.perspective(
            640 / 480, jnp.asarray(fov), jnp.asarray(near),
            jnp.asarray(far))), ref["perspective"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(camera.transform_homogeneous(
            jnp.asarray(mats), jnp.asarray(verts))), ref["transform"],
        atol=1e-5)


def test_look_at_jit_matches_eager_batched():
    """Regression: jitted camera construction must match eager per batch
    element (an XLA:TPU fusion of cross+linalg.norm used to corrupt some
    batch elements; ops/camera.py now uses explicit norms)."""
    import jax

    batch = 4
    eye = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), [batch, 1])
    center = jnp.zeros([batch, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [batch, 1])

    def f():
        return camera.clip_space_transforms(
            eye, center, up, jnp.full([batch], 40.0),
            jnp.full([batch], 0.01), jnp.full([batch], 10.0), 32, 32)

    eager = np.asarray(f())
    jitted = np.asarray(jax.jit(f)())
    np.testing.assert_allclose(jitted, eager, atol=1e-6)
    # Identical batch elements must produce identical matrices.
    for i in range(1, batch):
        np.testing.assert_array_equal(jitted[i], jitted[0])
