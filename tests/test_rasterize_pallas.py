"""Pallas hard-rasterizer backend: parity with the XLA semantic spec.

The tiled Pallas kernel (ops/rasterize_pallas.py) must agree bit-for-bit
with the dense XLA backend (the semantic reference, mirroring how the
reference keeps its python kernel as the spec for its C++ kernel,
src/mesh_renderer/rasterize.py:14-25). On CPU CI this runs the kernel in
interpreter mode; on TPU it runs compiled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mesh_renderer_tpu.ops import camera
from pytorch_mesh_renderer_tpu.ops.rasterize_xla import (
    rasterize_barycentric_xla)
from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
    rasterize_barycentric_pallas)

CUBE_VERTICES = np.array(
    [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1], [1, -1, 1],
     [1, -1, -1], [1, 1, -1], [1, 1, 1]], np.float32)
CUBE_TRIANGLES = np.array(
    [[0, 1, 2], [2, 3, 0], [3, 2, 6], [6, 7, 3], [7, 6, 5], [5, 4, 7],
     [4, 5, 1], [1, 0, 4], [5, 6, 2], [2, 1, 5], [7, 4, 0], [0, 3, 7]],
    np.int32)


def _cube_clip(width, height, eye=(2.0, 3.0, 6.0)):
    perspective = camera.perspective(
        width / height, jnp.array([40.0]), jnp.array([0.01]),
        jnp.array([10.0]))
    look = camera.look_at(jnp.array([list(eye)]), jnp.zeros([1, 3]),
                          jnp.array([[0.0, 1.0, 0.0]]))
    proj = jnp.matmul(perspective, look, precision=jax.lax.Precision.HIGHEST)
    return camera.transform_homogeneous(
        proj, jnp.asarray(CUBE_VERTICES)[None])[0]


def test_pallas_matches_xla_forward():
    width, height = 64, 48
    clip = _cube_clip(width, height)
    ids_x, bc_x, z_x = rasterize_barycentric_xla(
        clip, CUBE_TRIANGLES, width, height)
    ids_p, bc_p, z_p = rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, height)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(bc_p), np.asarray(bc_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x), atol=1e-6)


def test_pallas_matches_xla_gradient():
    width, height = 64, 48
    clip = _cube_clip(width, height)

    def loss(rast):
        def f(c):
            _, bc, _ = rast(c, CUBE_TRIANGLES, width, height)
            return jnp.sum(bc ** 2) + jnp.sum(bc[..., 0] * bc[..., 1])
        return f

    g_x = jax.grad(loss(rasterize_barycentric_xla))(clip)
    g_p = jax.grad(loss(rasterize_barycentric_pallas))(clip)
    # Compiled on TPU, the backward reduction dots run at MXU bf16
    # (DEFAULT) precision — ~0.5% relative gradient noise (see
    # _BWD_DOT_PRECISION); interpret/CPU mode is f32-exact.
    on_tpu = jax.devices()[0].platform == "tpu"
    rtol, atol = (1e-2, 1e-2) if on_tpu else (1e-5, 1e-4)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=rtol,
                               atol=atol)
    # No gradient to vertex z in either backend (cpp:232-269 property).
    np.testing.assert_array_equal(np.asarray(g_p[:, 2]), 0.0)


def test_pallas_row_sharding_strips_match_full():
    """Strips rendered with row_offset reassemble to the full image."""
    width, height = 64, 48
    clip = _cube_clip(width, height)
    full_ids, full_bc, full_z = rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, height)
    strip_h = height // 2
    parts = [rasterize_barycentric_pallas(
        clip, CUBE_TRIANGLES, width, strip_h,
        row_offset=jnp.asarray(i * strip_h), full_height=height)
        for i in range(2)]
    ids = jnp.concatenate([p[0] for p in parts], axis=0)
    bc = jnp.concatenate([p[1] for p in parts], axis=0)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(full_ids))
    np.testing.assert_allclose(np.asarray(bc), np.asarray(full_bc),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Fused rasterization + attribute interpolation
# ---------------------------------------------------------------------------

def _random_scene(seed=0, batch=2, vertex_count=24, tri_count=30,
                  attr_count=9, width=48, height=40):
    rng = np.random.RandomState(seed)
    verts = jnp.asarray(rng.randn(batch, vertex_count, 3) * 0.5, jnp.float32)
    tris = jnp.asarray(rng.randint(0, vertex_count, (tri_count, 3)),
                       jnp.int32)
    attrs = jnp.asarray(rng.randn(batch, vertex_count, attr_count),
                        jnp.float32)
    eye = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (batch, 1))
    center = jnp.zeros((batch, 3))
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (batch, 1))
    cam = camera.clip_space_transforms(eye, center, up, 40.0, 0.01, 10.0,
                                       width, height)
    bg = jnp.asarray(rng.randn(attr_count), jnp.float32)
    return verts, tris, attrs, cam, bg


@pytest.mark.parametrize("attr_count", [3, 9, 16])
def test_fused_interpolation_matches_xla(attr_count):
    """Fused Pallas interp == XLA gather interp, fwd and both gradients."""
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.ops import rasterize

    width, height = 48, 40
    verts, tris, attrs, cam, bg = _random_scene(attr_count=attr_count,
                                                width=width, height=height)
    cfg_x = config_lib.HardRasterizerConfig(backend="xla")
    cfg_p = config_lib.HardRasterizerConfig(backend="pallas")

    out_x = rasterize.rasterize(verts, attrs, tris, cam, width, height, bg,
                                config=cfg_x)
    out_p = rasterize.rasterize(verts, attrs, tris, cam, width, height, bg,
                                config=cfg_p)
    # Compiled on TPU, the fused interpolation/backward matmuls run at MXU
    # bf16 (dot_precision='default') precision: ~0.5% relative noise,
    # inside every reference image/gradient gate (see the DOT_PRECISIONS
    # rationale in rasterize_pallas.py). Interpret/CPU mode is f32-exact.
    on_tpu = jax.devices()[0].platform == "tpu"
    fwd_atol, grad_atol = (2e-2, 2e-2) if on_tpu else (2e-5, 1e-5)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=fwd_atol)

    def loss(v, a, cfg):
        img = rasterize.rasterize(v, a, tris, cam, width, height, bg,
                                  config=cfg)
        return jnp.sum(jnp.sin(img))

    g_x = jax.grad(loss, argnums=(0, 1))(verts, attrs, cfg_x)
    g_p = jax.grad(loss, argnums=(0, 1))(verts, attrs, cfg_p)
    scale_v = float(jnp.max(jnp.abs(g_x[0]))) + 1e-6
    scale_a = float(jnp.max(jnp.abs(g_x[1]))) + 1e-6
    np.testing.assert_allclose(np.asarray(g_p[0]) / scale_v,
                               np.asarray(g_x[0]) / scale_v, atol=grad_atol)
    np.testing.assert_allclose(np.asarray(g_p[1]) / scale_a,
                               np.asarray(g_x[1]) / scale_a, atol=grad_atol)


def test_fused_interpolation_row_sharded_strips():
    """Fused path with row_offset strips reassembles the full image."""
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.ops import rasterize

    width, height = 48, 40
    verts, tris, attrs, cam, bg = _random_scene(width=width, height=height)
    cfg_p = config_lib.HardRasterizerConfig(backend="pallas")
    full = rasterize.rasterize(verts, attrs, tris, cam, width, height, bg,
                               config=cfg_p)
    strip_h = height // 2
    parts = [rasterize.rasterize(
        verts, attrs, tris, cam, width, strip_h, bg, config=cfg_p,
        row_offset=jnp.asarray(i * strip_h), full_height=height)
        for i in range(2)]
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(parts, axis=1)), np.asarray(full),
        atol=1e-6)


def test_fused_interpolation_uncovered_pixels_are_background():
    """Pixels no triangle covers take exactly the background value."""
    from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
        rasterize_interpolate_pallas_batched)

    width, height = 32, 24
    verts, tris, attrs, cam, bg = _random_scene(width=width, height=height)
    clip = camera.transform_homogeneous(cam, verts)
    ids, bc, attr_img = rasterize_interpolate_pallas_batched(
        clip, attrs, tris, width, height)
    uncovered = np.asarray(jnp.sum(jnp.abs(bc), axis=-1)) == 0.0
    assert uncovered.any(), "test scene should leave background pixels"
    np.testing.assert_array_equal(
        np.asarray(attr_img)[uncovered], 0.0)


def test_multi_pass_large_mesh_matches_single_pass(monkeypatch):
    """Meshes beyond MAX_PALLAS_TRIANGLES render in depth-merged passes that
    match the single-pass output exactly — forward (ids/bc/z and fused
    attribute images) and gradients. Exercised by shrinking the per-pass
    cap so a 30-triangle scene takes 3 passes."""
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    verts, tris, attrs, cam, bg = _random_scene(tri_count=30)
    width, height = 48, 40
    clip = camera.transform_homogeneous(cam, verts)

    want = rp.rasterize_barycentric_pallas_batched(clip, tris, width, height)
    want_fused = rp.rasterize_interpolate_pallas_batched(
        clip, attrs, tris, width, height)

    def fused_loss(v, a):
        _, bc, ai = rp.rasterize_interpolate_pallas_batched(
            camera.transform_homogeneous(cam, v), a, tris, width, height)
        return jnp.sum(jnp.sin(ai)) + jnp.sum(bc ** 2)

    want_g = jax.grad(fused_loss, argnums=(0, 1))(verts, attrs)

    monkeypatch.setattr(rp, "MAX_PALLAS_TRIANGLES", 11)  # -> 3 passes
    monkeypatch.setattr(rp, "MAX_GATHERED_TRIANGLES", 11)
    got = rp.rasterize_barycentric_pallas_batched(clip, tris, width, height)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               atol=1e-5)

    got_fused = rp.rasterize_interpolate_pallas_batched(
        clip, attrs, tris, width, height)
    np.testing.assert_array_equal(np.asarray(got_fused[0]),
                                  np.asarray(want_fused[0]))
    np.testing.assert_allclose(np.asarray(got_fused[1]),
                               np.asarray(want_fused[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fused[2]),
                               np.asarray(want_fused[2]), atol=1e-5)

    got_g = jax.grad(fused_loss, argnums=(0, 1))(verts, attrs)
    for a, b in zip(got_g, want_g):
        # per-slice accumulation reorders f32 sums; compare relative to the
        # gradient magnitude.
        scale = float(np.abs(np.asarray(b)).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-6)


def test_soft_multi_pass_large_mesh_matches_single_pass(monkeypatch):
    """Soft meshes beyond MAX_PALLAS_TRIANGLES render in merged
    online-softmax passes that match the single pass: forward rgba and all
    gradients (scene inputs AND sigma/gamma). Exercised by shrinking the
    per-pass cap so a 2-triangle scene takes 2 passes."""
    from test_soft_pallas import _scene, SIZE, BLUR

    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp

    args, tris = _scene()
    clip, world, normals, colors, lights, intens = args
    sigma, gamma = jnp.float32(1e-3), jnp.float32(1e-2)

    def render():
        return sp.rasterize_batch_pallas(
            clip, tris, world, normals, colors, lights, intens, SIZE, SIZE,
            sigma, gamma, BLUR)

    def loss(c, w, n, col, li, inten, sg, gm):
        out = sp.rasterize_batch_pallas(
            c, tris, w, n, col, li, inten, SIZE, SIZE, sg, gm, BLUR)
        return jnp.sum(out * jnp.linspace(0.3, 1.1, out.size).reshape(
            out.shape))

    want = np.asarray(render())
    want_g = jax.grad(loss, argnums=tuple(range(8)))(
        clip, world, normals, colors, lights, intens, sigma, gamma)

    monkeypatch.setattr(sp, "MAX_PALLAS_TRIANGLES", 1)  # -> 2 passes
    monkeypatch.setattr(sp, "MAX_GATHERED_TRIANGLES", 1)
    got = np.asarray(render())
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

    got_g = jax.grad(loss, argnums=tuple(range(8)))(
        clip, world, normals, colors, lights, intens, sigma, gamma)
    for name, a, b in zip(
            ("clip", "world", "normals", "colors", "lights", "intens",
             "sigma", "gamma"), got_g, want_g):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-6)
        # gamma: the merge's AD includes the background weight's gamma
        # dependence (exp(EPS/gamma - m) terms) that the in-kernel dgamma
        # deliberately drops as O(EPS/gamma^2); the two estimates differ by
        # ~0.1% here (the multi-pass one is the more complete of the two).
        # Compiled on TPU the single- and multi-pass programs fuse
        # differently (measured ~1.2e-5 rel on dsigma, v5e), so the
        # f32-tight interpret tolerance widens there.
        on_tpu = jax.devices()[0].platform == "tpu"
        atol = 5e-3 if name == "gamma" else (1e-4 if on_tpu else 1e-5)
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=f"{name} gradient mismatch")


def test_zero_triangle_mesh_renders_background():
    """An empty mesh must not crash either Pallas wrapper (ADVICE r2 #1)."""
    from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
        rasterize_barycentric_pallas_batched,
        rasterize_interpolate_pallas_batched)

    width, height = 32, 16
    clip = _cube_clip(width, height)[None]
    empty = np.zeros([0, 3], np.int32)
    ids, bc, z = rasterize_barycentric_pallas_batched(
        clip, empty, width, height)
    np.testing.assert_array_equal(np.asarray(ids), 0)
    np.testing.assert_array_equal(np.asarray(bc), 0.0)
    np.testing.assert_array_equal(np.asarray(z), 1.0)

    attrs = jnp.ones([1, clip.shape[1], 5], jnp.float32)
    ids, bc, attr_img = rasterize_interpolate_pallas_batched(
        clip, attrs, empty, width, height)
    np.testing.assert_array_equal(np.asarray(ids), 0)
    np.testing.assert_array_equal(np.asarray(attr_img), 0.0)


def test_dot_precision_highest_restores_tight_parity():
    """HardRasterizerConfig(dot_precision='highest') ~= f32 XLA parity.

    On TPU the 'default' MXU dots are plain bf16 (~0.5% gradient noise);
    'highest' (bf16x6) must bring the Pallas backend back within tight
    tolerances of the XLA spec WITHOUT any library source edit (VERDICT r2
    weak #4). On CPU interpret mode both settings are f32-exact.
    """
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.ops import rasterize

    width, height = 48, 40
    verts, tris, attrs, cam, bg = _random_scene(width=width, height=height)
    cfg_x = config_lib.HardRasterizerConfig(backend="xla")
    cfg_p = config_lib.HardRasterizerConfig(backend="pallas",
                                            dot_precision="highest")

    out_x = rasterize.rasterize(verts, attrs, tris, cam, width, height, bg,
                                config=cfg_x)
    out_p = rasterize.rasterize(verts, attrs, tris, cam, width, height, bg,
                                config=cfg_p)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-5)

    def loss(v, a, cfg):
        img = rasterize.rasterize(v, a, tris, cam, width, height, bg,
                                  config=cfg)
        return jnp.sum(jnp.sin(img))

    g_x = jax.grad(loss, argnums=(0, 1))(verts, attrs, cfg_x)
    g_p = jax.grad(loss, argnums=(0, 1))(verts, attrs, cfg_p)
    for got, want in zip(g_p, g_x):
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=2e-4)


def test_dot_precision_validation():
    """Unknown dot_precision values fail loudly at dispatch time."""
    from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
        rasterize_interpolate_pallas_batched)

    width, height = 32, 16
    verts, tris, attrs, cam, bg = _random_scene(width=width, height=height)
    with pytest.raises(ValueError, match="dot_precision"):
        rasterize_interpolate_pallas_batched(
            verts, attrs, tris, width, height, dot_precision="high")


def test_spatial_sort_matches_unsorted():
    """The screen-space triangle sort must not change rendered values.

    Hard rasterization is a pure z-arg-min selection, so reordering
    triangles changes outputs only at bit-exact z ties; on these scenes the
    sorted and unsorted fused paths must agree to float noise, and the ids
    output must index the caller's triangle array in both cases.
    """
    from pytorch_mesh_renderer_tpu.ops.rasterize_pallas import (
        rasterize_interpolate_pallas_batched)

    width, height = 48, 40
    verts, tris, attrs, cam, bg = _random_scene(width=width, height=height)
    clip = camera.transform_homogeneous(cam, verts)
    ids_u, bc_u, ai_u = rasterize_interpolate_pallas_batched(
        clip, attrs, tris, width, height, spatial_sort=False)
    ids_s, bc_s, ai_s = rasterize_interpolate_pallas_batched(
        clip, attrs, tris, width, height, spatial_sort=True)
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_u))
    np.testing.assert_allclose(np.asarray(bc_s), np.asarray(bc_u),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ai_s), np.asarray(ai_u),
                               atol=1e-5)

    def loss(v, a, sort):
        _, bc, ai = rasterize_interpolate_pallas_batched(
            camera.transform_homogeneous(cam, v), a, tris, width, height,
            spatial_sort=sort)
        return jnp.sum(jnp.sin(ai)) + jnp.sum(bc * 0.3)

    g_u = jax.grad(loss, argnums=(0, 1))(verts, attrs, False)
    g_s = jax.grad(loss, argnums=(0, 1))(verts, attrs, True)
    for got, want in zip(g_s, g_u):
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=1e-5)


# ---------------------------------------------------------------------------
# Gathered (triangle-granularity) binning
# ---------------------------------------------------------------------------


def test_gather_plan_invariants():
    """Per-tile gathered segments contain exactly the kept triangles whose
    bbox overlaps the tile, in ascending original-id order, chunk-aligned,
    and agreeing with the per-triangle `_bin_hits` overlap test."""
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    width, height = 48, 40
    verts, tris, _, cam, _ = _random_scene(tri_count=37, width=width,
                                           height=height)
    clip = camera.transform_homogeneous(cam, verts)
    chunk = rp.TRI_CHUNK
    tri_data = rp._pack_batched(clip, tris, chunk)
    batch, t_pad, _ = tri_data.shape
    n_rows = -(-height // rp.TILE_H)
    n_cols = -(-width // rp.TILE_W)
    budget = rp._gather_budget_rows(t_pad, n_rows * n_cols, chunk)
    g, keep, start_c, n_c = [np.asarray(x) for x in rp._gather_plan(
        tri_data[:, :, 15:20], chunk, width, height, 0, height, budget)]
    hit1 = np.asarray(rp._bin_hits(tri_data[:, :, 15:20], 1, width, height,
                                   0, height))  # [B, R, C, T_pad]
    assert g.shape == (batch, budget)
    for b in range(batch):
        seen = np.zeros(t_pad, np.int64)
        for r in range(n_rows):
            for c in range(n_cols):
                s = start_c[b, r, c, 0] * chunk
                n = n_c[b, r, c, 0] * chunk
                seg = g[b, s:s + n]
                ids = seg[seg < t_pad]
                assert np.all(np.diff(ids) > 0)  # ascending original ids
                want = np.nonzero(hit1[b, r, c] & keep[b])[0]
                np.testing.assert_array_equal(ids, want)
                seen[ids] += 1
        # every kept triangle appears once per overlapped tile, and
        # non-kept triangles never appear in the gathered section
        per_tri = hit1[b].reshape(-1, t_pad).sum(axis=0)
        np.testing.assert_array_equal(seen,
                                      np.where(keep[b], per_tri, 0))


def test_gathered_matches_chunk_binning():
    """binning='gathered' reproduces the legacy chunk prepass bit-for-bit
    on the forward outputs (winner selection is order-independent) and to
    f32 reassociation tolerance on the gradients."""
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    width, height = 48, 40
    verts, tris, attrs, cam, _ = _random_scene(tri_count=30)
    clip = camera.transform_homogeneous(cam, verts)

    outs = {}
    grads = {}
    for binning in ("gathered", "chunk"):
        outs[binning] = [
            np.asarray(x) for x in rp.rasterize_barycentric_pallas_batched(
                clip, tris, width, height, binning=binning)]
        outs[binning] += [
            np.asarray(x) for x in rp.rasterize_interpolate_pallas_batched(
                clip, attrs, tris, width, height, spatial_sort=False,
                binning=binning)]

        def loss(v, a, binning=binning):
            _, bc, ai = rp.rasterize_interpolate_pallas_batched(
                camera.transform_homogeneous(cam, v), a, tris, width,
                height, spatial_sort=False, binning=binning)
            return jnp.sum(jnp.sin(ai)) + jnp.sum(bc ** 2)

        grads[binning] = jax.grad(loss, argnums=(0, 1))(verts, attrs)

    for a, b in zip(outs["gathered"], outs["chunk"]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(grads["gathered"], grads["chunk"]):
        # gathered-section gradients reduce via segment-sum (different f32
        # accumulation order than the legacy in-kernel RMW)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gathered_cap_and_budget_fallback(monkeypatch):
    """Triangles spanning more tiles than GATHER_TILE_CAP — or dropped by
    the static row budget — are exactly partitioned onto the in-kernel
    legacy loop: mixed scenes stay bit-identical to the default plan."""
    from pytorch_mesh_renderer_tpu.ops import binning
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    width, height = 48, 40
    verts, tris, attrs, cam, _ = _random_scene(tri_count=30)
    clip = camera.transform_homogeneous(cam, verts)

    def render():
        out = [np.asarray(x) for x in rp.rasterize_barycentric_pallas_batched(
            clip, tris, width, height)]
        out += [np.asarray(x) for x in rp.rasterize_interpolate_pallas_batched(
            clip, attrs, tris, width, height)]
        return out

    def grad():
        def loss(v, a):
            _, bc, ai = rp.rasterize_interpolate_pallas_batched(
                camera.transform_homogeneous(cam, v), a, tris, width,
                height)
            return jnp.sum(jnp.sin(ai)) + jnp.sum(bc ** 2)
        return jax.grad(loss, argnums=(0, 1))(verts, attrs)

    want = render()
    want_g = grad()

    # cap=1: multi-tile triangles fall back to the legacy loop (mixed).
    # (The knob lives on ops.binning; both kernel modules read it there.)
    monkeypatch.setattr(binning, "GATHER_TILE_CAP", 1)
    for a, b in zip(render(), want):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(grad(), want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    monkeypatch.undo()

    # Tiny row budget: tiles overflow, everything routes to the legacy
    # loop (keep must go fully False, not half-place triangles).
    monkeypatch.setattr(binning, "_gather_budget_rows",
                        lambda t_pad, n_tiles, chunk: 2 * chunk)
    for a, b in zip(render(), want):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(grad(), want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_winner_plan_invariants():
    """Backward winner segments contain exactly each tile's unique active
    winner ids, ascending, chunk-aligned; fallback tiles are flagged."""
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    width, height = 48, 40
    verts, tris, _, cam, _ = _random_scene(tri_count=37, width=width,
                                           height=height)
    clip = camera.transform_homogeneous(cam, verts)
    ids, bc, _ = rp.rasterize_barycentric_pallas_batched(clip, tris, width,
                                                         height)
    chunk = rp.TRI_CHUNK
    batch = ids.shape[0]
    t_pad = -(-tris.shape[0] // chunk) * chunk
    n_rows = -(-height // rp.TILE_H)
    n_cols = -(-width // rp.TILE_W)
    budget = rp._gather_budget_rows(t_pad, n_rows * n_cols, chunk)
    g, start_c, n_c, fits = [np.asarray(x) for x in rp._winner_plan(
        ids, bc, chunk, budget)]

    ids_np = np.asarray(ids)
    active = ~((ids_np == 0) & (np.asarray(bc).sum(-1)
                                < rp.DEGENERATE_BARYCENTRIC_CUTOFF))
    for b in range(batch):
        for r in range(n_rows):
            for c in range(n_cols):
                s = start_c[b, r, c, 0] * chunk
                n = n_c[b, r, c, 0] * chunk
                seg = g[b, s:s + n]
                got = seg[seg >= 0]
                assert np.all(np.diff(got) > 0)
                t = ids_np[b, r*rp.TILE_H:(r+1)*rp.TILE_H,
                           c*rp.TILE_W:(c+1)*rp.TILE_W]
                a = active[b, r*rp.TILE_H:(r+1)*rp.TILE_H,
                           c*rp.TILE_W:(c+1)*rp.TILE_W]
                want = np.unique(t[a])
                if fits[b, r, c, 0]:
                    np.testing.assert_array_equal(got, want)
                else:
                    assert n == 0


def test_gathered_unbounded_bbox_vertex_behind_camera():
    """A vertex at w <= eps makes the packed bbox full-screen (the
    conservative fallback, cpp:338-341 semantics): under gathered binning
    such triangles exceed the tile cap and must route through the legacy
    loop — forward and gradients still match the XLA spec exactly."""
    # Irregular coordinates keep pixel centers off exact triangle edges
    # (edge pixels flip on 1-ulp cross-compilation differences — the same
    # sensitivity the reference's golden tests absorb with an outlier
    # budget).
    clip = jnp.asarray(np.array([
        # behind-camera vertex (negative w) + two in front
        [[-0.5137, -0.5071, 0.0, 1.0], [0.8093, -0.4039, 0.0, -0.7],
         [0.0171, 0.8117, 0.0, 1.2],
         # a small fully-visible triangle (stays on the gathered path)
         [-0.2059, -0.2133, 0.2, 1.0], [0.2071, -0.2087, 0.2, 1.0],
         [0.0143, 0.2059, 0.2, 1.0]],
    ], np.float32))
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    # 2 x 5 = 10 tiles > GATHER_TILE_CAP, so the full-screen fallback bbox
    # really exceeds the cap (smaller test images fit 8 tiles and would
    # keep the triangle on the gathered path, pinning nothing).
    width, height = 256, 80

    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp
    from pytorch_mesh_renderer_tpu.ops.rasterize_xla import (
        rasterize_barycentric_xla)

    # Pin the routing itself: the behind-camera triangle must be a legacy
    # (keep=False) fallback, the regular one gathered.
    tri_data = rp._pack_batched(clip, tris, rp.TRI_CHUNK)
    n_tiles = (height // rp.TILE_H) * (-(-width // rp.TILE_W))
    _, keep, _, _ = rp._gather_plan(
        tri_data[:, :, 15:20], rp.TRI_CHUNK, width, height, 0, height,
        rp._gather_budget_rows(tri_data.shape[1], n_tiles, rp.TRI_CHUNK))
    assert not bool(keep[0, 0]) and bool(keep[0, 1])

    ids_p, bc_p, z_p = rp.rasterize_barycentric_pallas_batched(
        clip, tris, width, height)
    ids_x, bc_x, z_x = rasterize_barycentric_xla(clip[0], tris, width,
                                                 height)
    np.testing.assert_array_equal(np.asarray(ids_p[0]), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(bc_p[0]), np.asarray(bc_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_p[0]), np.asarray(z_x),
                               atol=1e-6)

    def loss(rast, c):
        _, bc, _ = rast(c)
        return jnp.sum(bc ** 2)

    g_p = jax.grad(lambda c: loss(
        lambda cc: rp.rasterize_barycentric_pallas_batched(
            cc, tris, width, height), c))(clip)
    g_x = jax.grad(lambda c: loss(
        lambda cc: jax.vmap(lambda one: rasterize_barycentric_xla(
            one, tris, width, height))(cc), c))(clip)
    # Compiled on TPU the Pallas analytic backward and the XLA-AD backward
    # reduce in different orders (measured 8.6e-5 max rel, v5e); interpret
    # mode keeps the f32-tight bound.
    on_tpu = jax.devices()[0].platform == "tpu"
    rtol, atol = (1e-3, 1e-2) if on_tpu else (1e-5, 1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("seed,width,height", [
    (1, 48, 40),     # boundary-padded rows
    (2, 144, 24),    # two tile columns, padded both dims
    (3, 128, 32),    # exact tile multiples
])
def test_gathered_matches_chunk_fuzz(seed, width, height):
    """Forward bit-parity gathered vs chunk across geometry seeds and
    tile-divisible / non-divisible image shapes."""
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    verts, tris, attrs, cam, _ = _random_scene(seed=seed, tri_count=40,
                                               width=width, height=height)
    clip = camera.transform_homogeneous(cam, verts)
    outs = {}
    for binning in ("gathered", "chunk"):
        outs[binning] = (
            [np.asarray(x) for x in rp.rasterize_barycentric_pallas_batched(
                clip, tris, width, height, binning=binning)]
            + [np.asarray(x) for x in rp.rasterize_interpolate_pallas_batched(
                clip, attrs, tris, width, height, spatial_sort=False,
                binning=binning)])
    for a, b in zip(outs["gathered"], outs["chunk"]):
        np.testing.assert_array_equal(a, b)
