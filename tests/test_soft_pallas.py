"""Soft Pallas kernels: parity with the XLA semantic spec.

The tiled forward and the hand-derived backward kernel
(ops/soft_rasterize_pallas.py) must match the XLA scan implementation
(ops/soft_rasterize.py) and its JAX AD gradients. On CPU CI the kernels run
in interpreter mode; on TPU compiled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops import soft_rasterize as soft_xla
from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
    rasterize_batch_pallas)


def _scene():
    rng = np.random.RandomState(0)
    world = np.array(
        [[-0.6, -0.5, 0.1], [0.7, -0.4, -0.2], [0.0, 0.8, 0.0],
         [0.9, 0.6, 0.4]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    normals = np.tile(np.array([[0.0, 0.3, 1.0]], np.float32), [4, 1])
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    colors = rng.uniform(0.2, 1.0, [4, 3]).astype(np.float32)
    lights = np.array([[0.5, 1.0, 3.0], [-1.0, 0.5, 2.0]], np.float32)
    intens = np.array([1.3, 0.7], np.float32)
    w = np.array([1.0, 1.3, 0.9, 1.1], np.float32)
    clip = np.concatenate(
        [world * w[:, None],
         np.full([4, 1], 0.25, np.float32) * w[:, None]], axis=1)
    clip[:, 3] = w
    return tuple(jnp.asarray(a) for a in
                 (clip, world, normals, colors, lights, intens)), tris


SIGMA, GAMMA, BLUR = 1e-3, 1e-2, 0.08
SIZE = 16


def _pallas(tris, *args):
    clip, world, normals, colors, lights, intens = args
    return rasterize_batch_pallas(clip, tris, world, normals, colors,
                                  lights, intens, SIZE, SIZE, SIGMA, GAMMA,
                                  BLUR)


def _xla(tris, *args):
    clip, world, normals, colors, lights, intens = args
    return soft_xla.rasterize_batch(clip, tris, world, normals, colors,
                                    lights, intens, SIZE, SIZE, SIGMA,
                                    GAMMA, blur_radius=BLUR)


def test_soft_pallas_forward_matches_xla():
    args, tris = _scene()
    got = np.asarray(_pallas(tris, *args))
    want = np.asarray(_xla(tris, *args))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_soft_pallas_backward_matches_xla_ad():
    """The hand-derived backward kernel vs jax AD, all six input grads."""
    args, tris = _scene()
    cot = jax.random.normal(jax.random.PRNGKey(1), (SIZE, SIZE, 4))

    def lp(*a):
        return jnp.sum(_pallas(tris, *a) * cot)

    def lx(*a):
        return jnp.sum(_xla(tris, *a) * cot)

    gp = jax.grad(lp, argnums=tuple(range(6)))(*args)
    gx = jax.grad(lx, argnums=tuple(range(6)))(*args)
    # Compiled on TPU the backward's MXU column reductions run at bf16
    # (DEFAULT) precision (~0.5% noise, inside the reference's 1% gradient
    # gates); interpret/CPU is f32-exact.
    tol = 1e-2 if jax.devices()[0].platform == "tpu" else 1e-4
    for name, a, b in zip(
            ("clip", "world", "normals", "colors", "lights", "intens"),
            gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < tol, (
            f"{name} gradient mismatch: {np.abs(a - b).max()} "
            f"vs magnitude {scale}")


def test_soft_pallas_batched_matches_single():
    """Native batching (batch as a grid axis) equals per-item calls, and
    batched gradients are finite and consistent for identical elements."""
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
        soft_rasterize_pallas_batched)

    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args
    batch = 3
    scales = jnp.linspace(0.9, 1.1, batch)
    clips = clip[None] * scales[:, None, None]
    clips = clips.at[..., 3].set(clip[None, :, 3])
    worlds = jnp.tile(world[None], [batch, 1, 1])
    normals_b = jnp.tile(normals[None], [batch, 1, 1])
    colors_b = jnp.tile(colors[None], [batch, 1, 1])
    lights_b = jnp.tile(lights[None], [batch, 1, 1])
    intens_b = jnp.tile(intens[None], [batch, 1])

    batched = soft_rasterize_pallas_batched(
        clips, tris, worlds, normals_b, colors_b, lights_b, intens_b,
        SIZE, SIZE, SIGMA, GAMMA, BLUR)
    for i in range(batch):
        single = rasterize_batch_pallas(
            clips[i], tris, worlds[i], normals_b[i], colors_b[i],
            lights_b[i], intens_b[i], SIZE, SIZE, SIGMA, GAMMA, BLUR)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), atol=1e-5)

    def loss(c):
        out = soft_rasterize_pallas_batched(
            c, tris, worlds, normals_b, colors_b, lights_b, intens_b,
            SIZE, SIZE, SIGMA, GAMMA, BLUR)
        return jnp.mean(out[..., 3])

    g = jax.grad(loss)(jnp.tile(clip[None], [batch, 1, 1]))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0
    for i in range(1, batch):
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(g[0]),
                                   atol=1e-6)


def test_soft_pallas_traced_sigma_gamma_no_fallback():
    """A jitted sigma/gamma-annealing step stays on the Pallas kernel:
    sigma/gamma enter as traced SMEM params (one compile serves every
    annealed value) and outputs match the XLA path per value."""
    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args

    @jax.jit
    def render(sigma, gamma):
        return rasterize_batch_pallas(clip, tris, world, normals, colors,
                                      lights, intens, SIZE, SIZE, sigma,
                                      gamma, BLUR)

    for sigma, gamma in ((1e-3, 1e-2), (3e-3, 2e-2)):
        got = np.asarray(render(jnp.float32(sigma), jnp.float32(gamma)))
        want = np.asarray(soft_xla.rasterize_batch(
            clip, tris, world, normals, colors, lights, intens, SIZE, SIZE,
            sigma, gamma, blur_radius=BLUR))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_soft_pallas_sigma_gamma_gradients_match_xla_ad():
    """The analytic dsigma/dgamma accumulated in the backward kernel vs jax
    AD of the XLA scan path. The Pallas dgamma drops the background weight's
    own gamma dependence (O(EPS/gamma^2) relative), hence the loose rtol."""
    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args
    cot = jax.random.normal(jax.random.PRNGKey(2), (SIZE, SIZE, 4))

    def lp(sigma, gamma):
        out = rasterize_batch_pallas(clip, tris, world, normals, colors,
                                     lights, intens, SIZE, SIZE, sigma,
                                     gamma, BLUR)
        return jnp.sum(out * cot)

    def lx(sigma, gamma):
        out = soft_xla.rasterize_batch(clip, tris, world, normals, colors,
                                       lights, intens, SIZE, SIZE, sigma,
                                       gamma, blur_radius=BLUR)
        return jnp.sum(out * cot)

    sp, gp = jax.grad(lp, argnums=(0, 1))(jnp.float32(SIGMA),
                                          jnp.float32(GAMMA))
    sx, gx = jax.grad(lx, argnums=(0, 1))(jnp.float32(SIGMA),
                                          jnp.float32(GAMMA))
    # bf16 MXU reductions on the compiled TPU path (see above).
    wide = jax.devices()[0].platform == "tpu"
    np.testing.assert_allclose(float(sp), float(sx),
                               rtol=1e-2 if wide else 1e-3)
    np.testing.assert_allclose(float(gp), float(gx),
                               rtol=3e-2 if wide else 1e-2)


def test_soft_dispatch_traced_blur_warns_and_falls_back():
    """A traced blur_radius cannot run on the Pallas backend: the dispatch
    must warn LOUDLY and fall back to the XLA scan (never silently)."""
    import warnings

    from pytorch_mesh_renderer_tpu import config as config_lib

    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args
    cfg = config_lib.SoftRasterizerConfig(backend="pallas")

    @jax.jit
    def render(blur):
        return soft_xla.rasterize_batch(
            clip, tris, world, normals, colors, lights, intens, SIZE, SIZE,
            SIGMA, GAMMA, blur_radius=blur, config=cfg)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = render(jnp.float32(BLUR))
    assert any("blur_radius is a traced value" in str(w.message)
               for w in caught)
    want = np.asarray(soft_xla.rasterize_batch(
        clip, tris, world, normals, colors, lights, intens, SIZE, SIZE,
        SIGMA, GAMMA, blur_radius=BLUR))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_soft_zero_triangle_mesh_is_background():
    """An empty mesh must not crash the soft Pallas wrapper (ADVICE r2 #1)."""
    args, _ = _scene()
    empty = np.zeros([0, 3], np.int32)
    out = np.asarray(_pallas(empty, *args))
    np.testing.assert_array_equal(out[..., 3], 0.0)
    assert np.all(np.isfinite(out))


def test_soft_dot_precision_highest_matches_xla_ad():
    """SoftRasterizerConfig dot_precision='highest' keeps backward parity."""
    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args

    def loss_pallas(c):
        out = rasterize_batch_pallas(c, tris, world, normals, colors,
                                     lights, intens, SIZE, SIZE, SIGMA,
                                     GAMMA, BLUR, dot_precision="highest")
        return jnp.sum(out)

    def loss_xla(c):
        out = soft_xla.rasterize_batch(c, tris, world, normals, colors,
                                       lights, intens, SIZE, SIZE, SIGMA,
                                       GAMMA, blur_radius=BLUR)
        return jnp.sum(out)

    g_p = np.asarray(jax.grad(loss_pallas)(clip))
    g_x = np.asarray(jax.grad(loss_xla)(clip))
    scale = np.abs(g_x).max() + 1e-6
    np.testing.assert_allclose(g_p / scale, g_x / scale, atol=2e-4)


def test_silhouette_forward_matches_full_alpha():
    """Silhouette-only kernel == the full kernel's alpha channel."""
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
        soft_rasterize_pallas_batched,
        soft_rasterize_silhouette_pallas_batched)

    args, tris = _scene()
    clip, world, normals, colors, lights, intens = (a[None] for a in args)
    full = soft_rasterize_pallas_batched(
        clip, tris, world, normals, colors, lights, intens, SIZE, SIZE,
        SIGMA, GAMMA, BLUR)
    sil = soft_rasterize_silhouette_pallas_batched(
        clip, tris, SIZE, SIZE, SIGMA, BLUR)
    np.testing.assert_allclose(np.asarray(sil), np.asarray(full[..., 3]),
                               atol=1e-6)


def test_silhouette_gradients_match_full_alpha():
    """d(alpha loss)/d clip and d/d sigma match the full backward's."""
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
        soft_rasterize_pallas_batched,
        soft_rasterize_silhouette_pallas_batched)

    args, tris = _scene()
    clip, world, normals, colors, lights, intens = (a[None] for a in args)

    def loss_sil(c, s):
        out = soft_rasterize_silhouette_pallas_batched(
            c, tris, SIZE, SIZE, s, BLUR)
        return jnp.sum(out ** 2)

    def loss_full(c, s):
        out = soft_rasterize_pallas_batched(
            c, tris, world, normals, colors, lights, intens, SIZE, SIZE,
            s, GAMMA, BLUR)
        return jnp.sum(out[..., 3] ** 2)

    sig = jnp.float32(SIGMA)
    gc_s, gs_s = jax.grad(loss_sil, argnums=(0, 1))(clip, sig)
    gc_f, gs_f = jax.grad(loss_full, argnums=(0, 1))(clip, sig)
    scale = np.abs(np.asarray(gc_f)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gc_s) / scale,
                               np.asarray(gc_f) / scale, atol=2e-4)
    np.testing.assert_allclose(float(gs_s), float(gs_f),
                               rtol=2e-3, atol=1e-6)


def test_silhouette_multi_pass_matches_single(monkeypatch):
    """Per-pass alpha composes multiplicatively == one pass, grads too."""
    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp

    rng = np.random.RandomState(3)
    world = rng.uniform(-0.8, 0.8, [30, 3]).astype(np.float32)
    tris = rng.randint(0, 30, [40, 3]).astype(np.int32)
    w = rng.uniform(0.9, 1.2, [30]).astype(np.float32)
    clip = np.concatenate([world * w[:, None], w[:, None]], axis=1)
    clip = jnp.asarray(clip)[None]

    def alpha_sum(c):
        out = sp.soft_rasterize_silhouette_pallas_batched(
            c, tris, SIZE, SIZE, SIGMA, BLUR)
        return jnp.sum(out ** 2), out

    (one, alpha_one), g_one = jax.value_and_grad(
        alpha_sum, has_aux=True)(clip)
    monkeypatch.setattr(sp, "MAX_PALLAS_TRIANGLES", 16)
    monkeypatch.setattr(sp, "MAX_GATHERED_TRIANGLES", 16)
    (multi, alpha_multi), g_multi = jax.value_and_grad(
        alpha_sum, has_aux=True)(clip)
    np.testing.assert_allclose(np.asarray(alpha_multi),
                               np.asarray(alpha_one), atol=1e-6)
    scale = np.abs(np.asarray(g_one)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(g_multi) / scale,
                               np.asarray(g_one) / scale, atol=2e-4)


def test_render_silhouette_model_backends_agree():
    """models.render_silhouette: Pallas path == XLA fallback == full alpha."""
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.models import shapes, soft_mesh_renderer

    v, t, _ = shapes.cube(2.0)
    vb = jnp.asarray(v)[None]
    eye = jnp.array([[0.0, 0.0, 6.0]])
    center = jnp.zeros([1, 3])
    up = jnp.array([[0.0, 1.0, 0.0]])

    sil_pallas = soft_mesh_renderer.render_silhouette(
        vb, t, eye, center, up, 32, 32,
        config=config_lib.SoftRasterizerConfig(backend="pallas"))
    sil_xla = soft_mesh_renderer.render_silhouette(
        vb, t, eye, center, up, 32, 32,
        config=config_lib.SoftRasterizerConfig(backend="xla"))
    full = soft_mesh_renderer.render(
        vb, t, jnp.ones_like(vb), eye, center, up,
        jnp.array([[[0.0, 0.0, 6.0]]]), jnp.ones([1, 1]), 32, 32,
        config=config_lib.SoftRasterizerConfig(backend="pallas"))
    np.testing.assert_allclose(np.asarray(sil_pallas), np.asarray(sil_xla),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_pallas),
                               np.asarray(full[..., 3]), atol=1e-6)


def test_silhouette_traced_blur_warns_and_falls_back():
    """Traced blur on the silhouette entry: loud warning + XLA fallback
    whose alpha matches the static-blur Pallas result."""
    import warnings

    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize import (
        rasterize_silhouette_clip_space_batch)

    args, tris = _scene()
    clip = args[0][None]
    cfg = config_lib.SoftRasterizerConfig(backend="pallas")

    @jax.jit
    def render(blur):
        return rasterize_silhouette_clip_space_batch(
            clip, tris, SIZE, SIZE, SIGMA, blur_radius=blur, config=cfg)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = render(jnp.float32(BLUR))
    assert any("blur_radius is a traced value" in str(w.message)
               for w in caught)
    want = rasterize_silhouette_clip_space_batch(
        clip, tris, SIZE, SIZE, SIGMA, blur_radius=BLUR, config=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


# ---------------------------------------------------------------------------
# Gathered (triangle-granularity) binning — soft kernels
# ---------------------------------------------------------------------------


def _multi_tile_scene(seed=0, batch=2, vertex_count=24, tri_count=30):
    from pytorch_mesh_renderer_tpu.ops import camera

    rng = np.random.RandomState(seed)
    width, height = 48, 40
    world = jnp.asarray(rng.randn(batch, vertex_count, 3) * 0.5, jnp.float32)
    tris = jnp.asarray(rng.randint(0, vertex_count, (tri_count, 3)),
                       jnp.int32)
    normals = rng.randn(batch, vertex_count, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.asarray(normals)
    colors = jnp.asarray(rng.uniform(0.2, 1.0, (batch, vertex_count, 3)),
                         jnp.float32)
    lights = jnp.asarray(rng.randn(batch, 2, 3) * 2.0, jnp.float32)
    intens = jnp.asarray(rng.uniform(0.5, 1.5, (batch, 2)), jnp.float32)
    eye = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (batch, 1))
    cam = camera.clip_space_transforms(
        eye, jnp.zeros((batch, 3)), jnp.tile(jnp.array([[0.0, 1.0, 0.0]]),
                                             (batch, 1)),
        40.0, 0.01, 10.0, width, height)
    clip = camera.transform_homogeneous(cam, world)
    return (clip, world, normals, colors, lights, intens, tris, width,
            height)


def test_soft_gathered_matches_chunk_binning():
    """Soft gathered binning == chunk binning to f32 accumulation-order
    tolerance (the additive aggregation visits chunks in a different
    order), forward and all gradient paths."""
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
        soft_rasterize_pallas_batched)

    (clip, world, normals, colors, lights, intens, tris, width,
     height) = _multi_tile_scene()

    outs = {}
    grads = {}
    for binning in ("gathered", "chunk"):
        outs[binning] = np.asarray(soft_rasterize_pallas_batched(
            clip, tris, world, normals, colors, lights, intens, width,
            height, SIGMA, GAMMA, BLUR, binning=binning))

        def loss(cv, wv, nn, cc, lp, li, sigma, gamma, binning=binning):
            rgba = soft_rasterize_pallas_batched(
                cv, tris, wv, nn, cc, lp, li, width, height, sigma, gamma,
                BLUR, binning=binning)
            return jnp.sum(jnp.sin(rgba))

        grads[binning] = jax.grad(loss, argnums=tuple(range(8)))(
            clip, world, normals, colors, lights, intens,
            jnp.float32(SIGMA), jnp.float32(GAMMA))

    np.testing.assert_allclose(outs["gathered"], outs["chunk"],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(grads["gathered"], grads["chunk"]):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-4, atol=1e-5)


def test_soft_gathered_cap_fallback_is_exact_partition(monkeypatch):
    """With a tile cap of 1 the scene splits across the gathered and
    legacy loops; the additive aggregation must neither drop nor
    double-count any triangle (values match the unrestricted plan)."""
    from pytorch_mesh_renderer_tpu.ops import binning
    from pytorch_mesh_renderer_tpu.ops.soft_rasterize_pallas import (
        soft_rasterize_pallas_batched)

    (clip, world, normals, colors, lights, intens, tris, width,
     height) = _multi_tile_scene()

    def render():
        return np.asarray(soft_rasterize_pallas_batched(
            clip, tris, world, normals, colors, lights, intens, width,
            height, SIGMA, GAMMA, BLUR))

    want = render()
    monkeypatch.setattr(binning, "GATHER_TILE_CAP", 1)
    np.testing.assert_allclose(render(), want, rtol=1e-5, atol=1e-6)
    monkeypatch.undo()
    monkeypatch.setattr(binning, "_gather_budget_rows",
                        lambda t_pad, n_tiles, chunk: 2 * chunk)
    np.testing.assert_allclose(render(), want, rtol=1e-5, atol=1e-6)
