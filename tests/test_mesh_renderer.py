"""Full hard-renderer tests: golden images, Jacobians, convergence.

Mirrors the reference's renderer-level suite
(src/mesh_renderer/mesh_renderer_test.py, SURVEY.md §4): golden-image
comparison of the Phong pipeline against the reference's checked-in PNGs,
full-pipeline Jacobian checks at tiny sizes, and the cube-rotation
optimization convergence test (run jitted with optax instead of eager SGD).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.models import mesh_renderer
from pytorch_mesh_renderer_tpu.ops import camera
from pytorch_mesh_renderer_tpu.utils import test_utils

from conftest import GOLDEN_DIR

TEST_DATA = GOLDEN_DIR  # vendored copies of the reference's golden PNGs

CUBE_VERTICES = jnp.asarray(
    [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1], [1, -1, 1],
     [1, -1, -1], [1, 1, -1], [1, 1, 1]], jnp.float32)
CUBE_NORMALS = CUBE_VERTICES / jnp.linalg.norm(
    CUBE_VERTICES, axis=1, keepdims=True)
CUBE_TRIANGLES = np.array(
    [[0, 1, 2], [2, 3, 0], [3, 2, 6], [6, 7, 3], [7, 6, 5], [5, 4, 7],
     [4, 5, 1], [1, 0, 4], [5, 6, 2], [2, 1, 5], [7, 4, 0], [0, 3, 7]],
    np.int32)


def _two_view_cube():
    """The reference suite's standard two-view rotated cube scene."""
    model_transforms = camera.euler_matrices(
        jnp.array([[-20.0, 0.0, 60.0], [45.0, 60.0, 0.0]]))[:, :3, :3]
    vertices = jnp.einsum(
        "bij,vj->bvi", model_transforms, CUBE_VERTICES)
    normals = jnp.einsum(
        "bij,vj->bvi", model_transforms, CUBE_NORMALS)
    return vertices, normals


def test_renders_simple_cube():
    vertices, normals = _two_view_cube()
    eye = jnp.tile(jnp.array([[0.0, 0.0, 6.0]]), [2, 1])
    center = jnp.zeros([2, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [2, 1])
    lights = jnp.tile(jnp.array([[[0.0, 0.0, 6.0]]]), [2, 1, 1])
    intensities = jnp.ones([2, 1, 3])
    diffuse = jnp.ones_like(vertices)

    images = mesh_renderer.render(
        vertices, CUBE_TRIANGLES, normals, diffuse, eye, center, up, lights,
        intensities, 640, 480)
    for i in range(2):
        test_utils.expect_image_file_and_render_are_near(
            None, os.path.join(TEST_DATA, "Gray_Cube_%i.png" % i),
            np.asarray(images[i]))


def test_complex_shading():
    """Specular highlights, per-vertex colors, multiple lights, tone map."""
    vertices, normals = _two_view_cube()
    eye = jnp.array([[0.0, 0.0, 6.0], [0.0, 0.2, 18.0]])
    center = jnp.array([[0.0, 0.0, 0.0], [0.1, -0.1, 0.1]])
    up = jnp.array([[0.0, 1.0, 0.0], [0.1, 1.0, 0.15]])
    fov_y = jnp.array([40.0, 13.3])
    lights = jnp.array([[[0.0, 0.0, 6.0], [1.0, 2.0, 6.0]],
                        [[0.0, -2.0, 4.0], [1.0, 3.0, 4.0]]])
    intensities = jnp.array([[[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]],
                             [[2.0, 0.0, 1.0], [0.0, 2.0, 1.0]]])
    diffuse = jnp.tile(jnp.array([[
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 1.0],
        [1.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0],
        [0.5, 0.5, 0.5]]]), [2, 1, 1])
    specular = jnp.tile(jnp.array([[
        [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 1.0], [1.0, 1.0, 0.0],
        [1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.5, 0.5, 0.5],
        [1.0, 0.0, 0.0]]]), [2, 1, 1])
    shininess = 6.0 * jnp.ones([2, 8])
    ambient = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.1, 0.2]])

    renders = mesh_renderer.render(
        vertices, CUBE_TRIANGLES, normals, diffuse, eye, center, up, lights,
        intensities, 640, 480, specular_colors=specular,
        shininess_coefficients=shininess, ambient_color=ambient,
        fov_y=fov_y, near_clip=0.1, far_clip=25.0)
    tonemapped = np.concatenate(
        [np.asarray(mesh_renderer.tone_mapper(renders[..., :3], 0.7)),
         np.asarray(renders[..., 3:4])], axis=3)

    # Scalar shininess broadcasting must produce the identical image.
    broadcast = mesh_renderer.render(
        vertices, CUBE_TRIANGLES, normals, diffuse, eye, center, up, lights,
        intensities, 640, 480, specular_colors=specular,
        shininess_coefficients=6.0, ambient_color=ambient,
        fov_y=fov_y, near_clip=0.1, far_clip=25.0)
    np.testing.assert_allclose(
        np.asarray(renders), np.asarray(broadcast), atol=1e-5)

    for i in range(2):
        test_utils.expect_image_file_and_render_are_near(
            None, os.path.join(TEST_DATA, "Colored_Cube_%i.png" % i),
            tonemapped[i])


def _render_cube_vertices(cube_vertices, image_width=28, image_height=21,
                          config=None):
    # HIGHEST-precision model transform: on TPU the default einsum is a
    # bf16 MXU dot whose ~2^-8 vertex quantization swallows the Jacobian
    # gate's eps=1e-3 central-difference perturbations (measured r5:
    # 6.5% relative outliers from this einsum alone). Same reasoning as
    # the always-HIGHEST camera matmuls in ops/camera.py.
    model_transforms = camera.euler_matrices(
        jnp.array([[-20.0, 0.0, 60.0], [45.0, 60.0, 0.0]]))[:, :3, :3]
    vertices = jnp.einsum("bij,vj->bvi", model_transforms, cube_vertices,
                          precision=jax.lax.Precision.HIGHEST)
    normals = jnp.einsum("bij,vj->bvi", model_transforms, CUBE_NORMALS,
                         precision=jax.lax.Precision.HIGHEST)
    eye = jnp.array([0.0, 0.0, 6.0])
    lights = jnp.tile(eye[None, None, :], [2, 1, 1])
    intensities = jnp.ones([2, 1, 3])
    diffuse = jnp.ones_like(vertices)
    return mesh_renderer.render(
        vertices, CUBE_TRIANGLES, normals, diffuse, eye,
        jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]), lights, intensities,
        image_width, image_height, config=config)


def test_full_render_gradient():
    """Full-pipeline Jacobian vs central differences at 28x21.

    Parity scenario: mesh_renderer_test.py:151-202 (tolerances 1% outliers
    at 1% relative error). Compiled on TPU this gate runs at
    dot_precision='highest' (bf16x6, the exact-parity mode): the shipped
    DEFAULT's documented ~0.5%-relative MXU-dot gradient noise
    (config.DOT_PRECISIONS) pushes ~6.5% of the tiny 28x21 Jacobian's
    entries past the reference's 1%-relative outlier budget (measured
    v5e, round 5: DEFAULT 6.49% / HIGHEST 0.49% outliers with the test
    transform itself at HIGHEST) without indicating any structural fault
    — the gate's job. The bare-kernel Jacobian gates
    (test_rasterize_hard.py) stay at the shipped DEFAULT precision.
    """
    from pytorch_mesh_renderer_tpu import config as config_lib

    cfg = None
    if jax.devices()[0].platform not in ("cpu",):
        cfg = config_lib.HardRasterizerConfig(dot_precision="highest")
    fn = jax.jit(lambda v: _render_cube_vertices(v, config=cfg))
    analytical = test_utils.get_analytical_jacobian(fn, CUBE_VERTICES)
    numerical = test_utils.get_numerical_jacobian(fn, CUBE_VERTICES, eps=1e-3)
    matched, message = test_utils.check_jacobians_are_nearly_equal(
        analytical, numerical, 0.01, 0.01)
    assert matched, message


def test_that_cube_rotates():
    """Recover a target rotation from pixels in 35 SGD steps.

    Parity scenario: mesh_renderer_test.py:204-271, jit-compiled end to end
    (render + L1 loss + backward + grad-clip + SGD momentum update in one
    XLA program).
    """
    import optax

    image_width, image_height = 640, 480

    def render_with_rotation(angles):
        rot = camera.euler_matrices(angles)[0, :3, :3]
        vertices = (CUBE_VERTICES @ rot.T)[None]
        normals = (CUBE_NORMALS @ rot.T)[None]
        eye = jnp.array([[0.0, 0.0, 6.0]])
        lights = eye[:, None, :]
        return mesh_renderer.render(
            vertices, CUBE_TRIANGLES, normals, jnp.ones_like(vertices), eye,
            jnp.zeros([1, 3]), jnp.array([[0.0, 1.0, 0.0]]), lights,
            jnp.ones([1, 1, 3]), image_width, image_height)[0]

    target_angles = jnp.array([[-20.0, 0.0, 60.0]])
    desired = render_with_rotation(target_angles)

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.sgd(0.7, momentum=0.1))
    angles = jnp.zeros([1, 3])
    opt_state = opt.init(angles)

    @jax.jit
    def step(angles, opt_state):
        def loss_fn(a):
            return jnp.mean(jnp.abs(render_with_rotation(a) - desired))
        loss, g = jax.value_and_grad(loss_fn)(angles)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(angles, updates), opt_state, loss

    for _ in range(35):
        angles, opt_state, _ = step(angles, opt_state)

    final = render_with_rotation(angles)
    golden = os.path.join(TEST_DATA, "Gray_Cube_0.png")
    test_utils.expect_image_file_and_render_are_near(
        None, golden, np.asarray(desired))
    test_utils.expect_image_file_and_render_are_near(
        None, golden, np.asarray(final), max_outlier_fraction=0.01,
        pixel_error_threshold=0.04)
