"""Soft (SoftRas) rasterizer tests.

Mirrors the reference test strategy (src/soft_mesh_renderer/test_rasterize.py,
SURVEY.md §4.3-4.4): geometry-helper unit tests, exact-value forward checks of
a single 10x10 triangle render in two blur/sigma regimes, a translation
recovery convergence test, and cross-checks against the reference rasterizer
run as an oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops.soft_rasterize import (
    edge_function, point_to_segment_nearest, rasterize_batch)

from conftest import import_reference, oracle_snapshot


def test_point_to_segment_nearest():
    # Closest to the middle of the segment.
    nearest, t = point_to_segment_nearest(
        jnp.array([1.0, -1.0]), jnp.array([1.0, 1.0]), jnp.array([-1.0, -1.0]))
    np.testing.assert_allclose(np.asarray(nearest), [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(t), 0.5, atol=1e-6)

    # Closest to the start.
    nearest, t = point_to_segment_nearest(
        jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]), jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(nearest), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(t), 0.0, atol=1e-6)

    # Closest to the end.
    nearest, t = point_to_segment_nearest(
        jnp.array([0.0, 1.0]), jnp.array([1.0, 0.0]), jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(nearest), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-6)


def test_edge_function_sign():
    p = jnp.array([1.0, 0.0])
    v0 = jnp.array([0.0, -1.0])
    v1 = jnp.array([0.0, 1.0])
    assert float(edge_function(p, v0, v1)) > 0.0  # p right of v0->v1
    assert float(edge_function(-p, v0, v1)) < 0.0


def _single_triangle_scene():
    # One right triangle covering the lower-right half of the NDC square,
    # hypotenuse along y = x (eye space z=-1, znear=0.5, zfar=2.5).
    clip = jnp.array([[1.0, -1.0, 0.25, 1.0],
                      [1.0, 1.0, 0.25, 1.0],
                      [-1.0, -1.0, 0.25, 1.0]], jnp.float32)
    tris = jnp.array([[0, 1, 2]], jnp.int32)
    world = jnp.array([[1.0, -1.0, 0.0],
                       [1.0, 1.0, 0.0],
                       [-1.0, -1.0, 0.0]], jnp.float32)
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), [3, 1])
    colors = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), [3, 1])
    lights = jnp.array([[0.0, 0.0, 1e5]], jnp.float32)
    intensities = jnp.array([1.0], jnp.float32)
    return clip, tris, world, normals, colors, lights, intensities


def _lower_right_matrix(diag, fill, above=0.0):
    """10x10 matrix: `above` strictly above the anti-diagonal band, `diag` on
    it, `fill` below — the shape of the test triangle's coverage."""
    m = np.full([10, 10], above, np.float32)
    for r in range(10):
        c = 9 - r
        m[r, c] = diag
        m[r, c + 1:] = fill
    return m


def test_single_triangle_forward_sharp():
    """Sub-pixel blur: hard-looking coverage with alpha 0.5 on the edge.

    Exact-value scenario of the reference's first regime
    (test_rasterize.py:46-158).
    """
    clip, tris, world, normals, colors, lights, intensities = (
        _single_triangle_scene())
    out = rasterize_batch(clip, tris, world, normals, colors, lights,
                          intensities, 10, 10, 1e-5, 1e-4, blur_radius=0.01)
    out = np.asarray(out)
    expected_red = _lower_right_matrix(1.0, 1.0)
    expected_alpha = _lower_right_matrix(0.5, 1.0)
    np.testing.assert_allclose(out[..., 0], expected_red, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 3], expected_alpha, atol=1e-5)


def test_single_triangle_forward_blurred():
    """Pixel-wide blur: one extra probabilistic band outside the triangle.

    Mirrors the reference's second regime (test_rasterize.py:160-215): a
    blur radius of one pixel diagonal and sigma chosen so coverage at
    exactly blur_radius distance is 1e-3.
    """
    clip, tris, world, normals, colors, lights, intensities = (
        _single_triangle_scene())
    blur_radius = 0.1 * np.sqrt(2.0) + 1e-6
    # logit(1e-3); sigma such that sigmoid(-r^2/sigma) == 1e-3.
    logit = np.log(1e-3 / (1 - 1e-3))
    sigma = -blur_radius ** 2 / logit
    out = np.asarray(
        rasterize_batch(clip, tris, world, normals, colors, lights,
                        intensities, 10, 10, float(sigma), 1e-4,
                        blur_radius=float(blur_radius)))

    np.testing.assert_allclose(out[..., 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 2], 0.0, atol=1e-6)
    # Alpha: 0.5 on the diagonal, ~1e-3 one band above, saturating below.
    alpha = out[..., 3]
    for r in range(9):
        c = 9 - r
        np.testing.assert_allclose(alpha[r, c], 0.5, atol=1e-4)
        if c - 1 >= 0:
            np.testing.assert_allclose(alpha[r, c - 1], 1e-3, atol=1e-4)
        if c + 1 <= 9:
            assert alpha[r, c + 1] > 0.96
    # Far outside: no coverage.
    np.testing.assert_allclose(alpha[0, :8], 0.0, atol=1e-6)


def test_matches_reference_soft_rasterizer():
    """Oracle test: bit-level scenario parity with the reference kernel on a
    two-triangle mesh with perspective and an off-axis light (live oracle or
    vendored tests/oracle snapshot)."""
    rng = np.random.RandomState(7)
    world = np.array([[-0.6, -0.5, 0.1], [0.7, -0.4, -0.2], [0.0, 0.8, 0.0],
                      [0.9, 0.6, 0.4]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), [4, 1])
    colors = rng.uniform(0.2, 1.0, [4, 3]).astype(np.float32)
    lights = np.array([[0.5, 1.0, 3.0]], np.float32)
    intens = np.array([1.3], np.float32)
    # Simple perspective-ish clip coords: w varies per vertex.
    w = np.array([1.0, 1.3, 0.9, 1.1], np.float32)
    clip = np.concatenate(
        [world * w[:, None], np.full([4, 1], 0.25, np.float32) * w[:, None]],
        axis=1)
    clip[:, 3] = w

    ours = np.asarray(rasterize_batch(
        jnp.asarray(clip), jnp.asarray(tris), jnp.asarray(world),
        jnp.asarray(normals), jnp.asarray(colors), jnp.asarray(lights),
        jnp.asarray(intens), 16, 16, 1e-4, 1e-3, blur_radius=0.05))

    def compute():
        import torch
        import_reference()
        from src.soft_mesh_renderer.rasterize import (
            rasterize_batch as ref_batch)

        theirs = ref_batch(
            torch.from_numpy(clip), torch.from_numpy(tris),
            torch.from_numpy(world), torch.from_numpy(normals),
            torch.from_numpy(colors), torch.from_numpy(lights),
            torch.from_numpy(intens), 16, 16, 1e-4, 1e-3, 0.05)
        return {"image": theirs.detach().numpy()}

    ref = oracle_snapshot("soft_two_triangle_16x16", compute)
    np.testing.assert_allclose(ours, ref["image"], atol=2e-4, rtol=1e-3)


def test_optimize_single_triangle_translation():
    """Gradients are useful: recover a 0.25-NDC x-translation by SGD.

    Convergence scenario of the reference (test_rasterize.py:217-326), run
    under jit with optax instead of eager SGD.
    """
    import optax

    clip, tris, world, normals, colors, lights, intensities = (
        _single_triangle_scene())
    clip = jnp.array([[-0.5, 0.0, 0.25, 1.0],
                      [0.5, 1.0, 0.25, 1.0],
                      [-0.5, 1.0, 0.25, 1.0]], jnp.float32)
    world = jnp.array([[-0.5, 0.0, 0.0],
                       [0.5, 1.0, 0.0],
                       [-0.5, 1.0, 0.0]], jnp.float32)
    target_tx = 0.25
    gamma = 1e-1

    target = rasterize_batch(
        clip + jnp.array([target_tx, 0.0, 0.0, 0.0]), tris,
        world + jnp.array([target_tx, 0.0, 0.0]), normals, colors, lights,
        intensities, 10, 10, 1e-5, gamma, blur_radius=0.01)

    sat_radius = 0.5
    logit = float(np.log(1e-5 / (1 - 1e-5)))
    sigma = -sat_radius ** 2 / logit

    def loss_fn(tx):
        out = rasterize_batch(
            clip + jnp.stack([tx, 0.0, 0.0, 0.0]), tris,
            world + jnp.stack([tx, 0.0, 0.0]), normals, colors, lights,
            intensities, 10, 10, sigma, gamma, blur_radius=0.0)
        return jnp.mean(jnp.abs(out - target))

    opt = optax.sgd(0.7, momentum=0.1)
    tx = jnp.zeros(())
    opt_state = opt.init(tx)

    @jax.jit
    def step(tx, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(tx)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(tx, updates), opt_state, loss

    for _ in range(50):
        tx, opt_state, loss = step(tx, opt_state)

    pixel_width = 0.2
    assert abs(float(tx) - target_tx) < pixel_width / 2, (
        f"translation {float(tx)} did not converge to {target_tx}")


def test_silhouette_matches_reference_alpha_oracle():
    """The silhouette-only entry reproduces the reference kernel's alpha
    channel on the vendored two-triangle oracle scenario."""
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize import (
        rasterize_silhouette_clip_space_batch)

    world = np.array([[-0.6, -0.5, 0.1], [0.7, -0.4, -0.2], [0.0, 0.8, 0.0],
                      [0.9, 0.6, 0.4]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    w = np.array([1.0, 1.3, 0.9, 1.1], np.float32)
    clip = np.concatenate(
        [world * w[:, None], np.full([4, 1], 0.25, np.float32) * w[:, None]],
        axis=1)
    clip[:, 3] = w

    ours = np.asarray(rasterize_silhouette_clip_space_batch(
        jnp.asarray(clip)[None], jnp.asarray(tris), 16, 16, 1e-4,
        blur_radius=0.05))[0]

    def compute():
        import torch
        import_reference()
        from src.soft_mesh_renderer.rasterize import (
            rasterize_batch as ref_batch)

        rng = np.random.RandomState(7)
        normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), [4, 1])
        colors = rng.uniform(0.2, 1.0, [4, 3]).astype(np.float32)
        lights = np.array([[0.5, 1.0, 3.0]], np.float32)
        intens = np.array([1.3], np.float32)
        theirs = ref_batch(
            torch.from_numpy(clip), torch.from_numpy(tris),
            torch.from_numpy(world), torch.from_numpy(normals),
            torch.from_numpy(colors), torch.from_numpy(lights),
            torch.from_numpy(intens), 16, 16, 1e-4, 1e-3, 0.05)
        return {"image": theirs.detach().numpy()}

    ref = oracle_snapshot("soft_two_triangle_16x16", compute)
    np.testing.assert_allclose(ours, ref["image"][..., 3], atol=2e-4,
                               rtol=1e-3)
