"""Soft (SoftRas, Liu 2019) probabilistic rasterizer — XLA backend.

Parity target: /root/reference/src/soft_mesh_renderer/rasterize.py:14-424.
The reference is a per-pixel Python loop with a quadtree candidate index
(quadtree.py:37-101) and an explicitly stabilized softmax accumulated over
candidate triangles. The TPU-native formulation replaces all of it with a
single `lax.scan` over fixed-size triangle chunks carrying an **online
softmax** (running max + rescaled partial sums — the same trick used by
flash attention) plus a running silhouette product, evaluated for every
pixel of the image in parallel:

  * quadtree culling -> the blur-inflated bbox test each quadtree hit is
    re-checked against anyway (rasterize.py:341-342) — evaluated densely and
    folded into the validity mask (a pointer tree is TPU-hostile;
    SURVEY.md §5);
  * `continue` culls (back-face, degenerate, distance, z-range) -> validity
    masks with NaN-safe guarded arithmetic so gradients of culled lanes are
    exactly zero;
  * sequential softmax accumulation (rasterize.py:397-405) -> online
    rescaling with running max m, initialized to EPS/gamma so the final m
    equals the reference's `max_soft_weight`;
  * silhouette = 1 - prod(1 - coverage) (rasterize.py:410-414) -> running
    product.

Per-triangle Phong diffuse shading (compute_shaded_color,
rasterize.py:183-208) is fused into the aggregation, as in the reference.
The backward pass is JAX AD through this graph (smooth everywhere the
reference's autograd is), with the scan rematerialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as config_lib
from . import camera
from .math_utils import normalize

EPS = 1e-10  # background-probability floor (reference rasterize.py:211)


def edge_function(p, v0, v1):
    """Signed parallelogram area of (p - v0) x (v1 - v0), 2D inputs [..., 2+].

    Positive when p is right of segment v0->v1 (clockwise [p, v0, v1]).
    Parity: rasterize.py:112-123.
    """
    v0p = p - v0
    v01 = v1 - v0
    return v0p[..., 0] * v01[..., 1] - v0p[..., 1] * v01[..., 0]


def point_to_segment_nearest(p, a, b):
    """Nearest point on 2D segment [a, b] to p, and its normalized offset t.

    Broadcasts over leading dims; last dim is xy. Parity:
    rasterize.py:159-176 (including the 1e-12 degenerate-segment clamp).
    """
    ab = b - a
    len_ab = jnp.sqrt(jnp.sum(ab * ab, axis=-1))
    n = ab / jnp.maximum(len_ab, 1e-12)[..., None]
    t = jnp.sum((p - a) * n, axis=-1) / jnp.maximum(len_ab, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    x = a + t[..., None] * ab
    return x, t


def _safe_div(num, den):
    return num / jnp.where(den != 0.0, den, 1.0)


def _select_backend(cfg):
    backend = cfg.backend
    if backend == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no devices at all
            platform = "cpu"
        backend = "pallas" if platform == "tpu" else "xla"
    return backend


def _pallas_usable(blur_radius, backend, triangles=None):
    """True when the Pallas soft backend can take these arguments.

    Only blur_radius must be static (it shapes the packed bboxes);
    sigma/gamma are traced SMEM params and meshes beyond the VMEM table
    budget render in multiple merged passes. A traced blur falls back to
    the XLA scan with a LOUD warning (it is ~100x slower on TPU) — real
    bugs in the Pallas path propagate instead of silently switching
    backends.
    """
    del triangles  # any size: the Pallas wrapper multi-passes large meshes
    if not isinstance(blur_radius, jax.core.Tracer):
        return True
    import warnings

    warnings.warn(
        "soft rasterizer: blur_radius is a traced value, which the Pallas "
        "backend cannot take (it shapes the packed triangle bboxes); "
        f"falling back from backend='{backend}' to the ~100x-slower XLA "
        "scan. Pass blur_radius as a static float to stay on the TPU "
        "kernel.", RuntimeWarning, stacklevel=3)
    return False


def rasterize_batch(clip_space_vertices, triangles, world_space_vertices,
                    normals, diffuse_colors, light_positions,
                    light_intensities, image_width, image_height, sigma_val,
                    gamma_val, blur_radius=0.01, config=None, row_offset=None,
                    full_height=None, silhouette_only=False):
    """Soft-rasterize one mesh already transformed to clip space.

    Args / returns match the reference's rasterize_batch
    (rasterize.py:212-276): clip xyzw [V,4], triangles [T,3] (CCW winding),
    world positions / unit normals / diffuse colors [V,3], lights [L,3] with
    scalar intensities [L]; returns a lit RGBA image [H, W, 4] whose RGB is
    the softmax-depth aggregation and alpha the silhouette probability.

    Backend: on TPU the tiled Pallas forward kernel
    (soft_rasterize_pallas.py) runs by default (~100x faster than the scan
    formulation below; traced sigma/gamma stay on it without recompiles);
    elsewhere, or when blur_radius is traced, the XLA scan path runs.
    """
    cfg = config or config_lib.SOFT_CONFIG
    backend = _select_backend(cfg)
    if backend == "pallas" and _pallas_usable(blur_radius, backend,
                                               triangles):
        from .soft_rasterize_pallas import rasterize_batch_pallas
        return rasterize_batch_pallas(
            clip_space_vertices, triangles, world_space_vertices,
            normals, diffuse_colors, light_positions, light_intensities,
            image_width, image_height, sigma_val, gamma_val,
            blur_radius=blur_radius, row_offset=row_offset,
            full_height=full_height, interpret=cfg.interpret,
            dot_precision=cfg.dot_precision, binning=cfg.binning)
    tris = jnp.asarray(triangles, jnp.int32)
    tri_count = tris.shape[0]
    sq_blur = blur_radius ** 2

    tv = clip_space_vertices[tris]  # [T, 3, 4]
    w = tv[..., 3]  # [T, 3]
    ndc = _safe_div(tv[..., :3], w[..., None])  # [T, 3(corner), 3(xyz)]
    vx, vy, vz = ndc[..., 0], ndc[..., 1], ndc[..., 2]

    # Back-face cull (CCW front faces have negative signed area) and
    # degenerate cull (rasterize.py:331-336, 294-299).
    area = ((vx[:, 0] - vx[:, 1]) * (vy[:, 2] - vy[:, 1]) -
            (vy[:, 0] - vy[:, 1]) * (vx[:, 2] - vx[:, 1]))
    det = (vx[:, 0] * (vy[:, 1] - vy[:, 2]) -
           vx[:, 1] * (vy[:, 0] - vy[:, 2]) +
           vx[:, 2] * (vy[:, 0] - vy[:, 1]))
    keep = (area < 0.0) & (det != 0.0)

    # True (normalized) inverse of [[x0,x1,x2],[y0,y1,y2],[1,1,1]]; rows are
    # the screen-space barycentric coefficients (rasterize.py:292-300).
    inv_det = _safe_div(jnp.ones_like(det), det)
    adj = jnp.stack([
        jnp.stack([vy[:, 1] - vy[:, 2], vx[:, 2] - vx[:, 1],
                   vx[:, 1] * vy[:, 2] - vx[:, 2] * vy[:, 1]], axis=-1),
        jnp.stack([vy[:, 2] - vy[:, 0], vx[:, 0] - vx[:, 2],
                   vx[:, 2] * vy[:, 0] - vx[:, 0] * vy[:, 2]], axis=-1),
        jnp.stack([vy[:, 0] - vy[:, 1], vx[:, 1] - vx[:, 0],
                   vx[:, 0] * vy[:, 1] - vx[:, 1] * vy[:, 0]], axis=-1),
    ], axis=-2)  # [T, 3, 3]
    m2_inv = adj * inv_det[:, None, None]

    # Blur-inflated bbox (quadtree-equivalent cull, rasterize.py:302-306).
    bbox_min_x = jnp.min(vx, axis=1) - blur_radius
    bbox_max_x = jnp.max(vx, axis=1) + blur_radius
    bbox_min_y = jnp.min(vy, axis=1) - blur_radius
    bbox_max_y = jnp.max(vy, axis=1) + blur_radius

    tri_world = world_space_vertices[tris]  # [T, 3, 3]
    tri_normals = normals[tris]
    tri_colors = diffuse_colors[tris]

    chunk = int(min(cfg.triangle_chunk, tri_count))
    pad = (-tri_count) % chunk
    n_chunks = (tri_count + pad) // chunk

    def pad0(a, value=0.0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=value)

    def chunked(a, value=0.0):
        return pad0(a, value).reshape((n_chunks, chunk) + a.shape[1:])

    scan_data = dict(
        keep=chunked(keep, False),
        m2_inv=chunked(m2_inv),
        vxy=chunked(jnp.stack([vx, vy], axis=-1)),  # [.., 3(corner), 2]
        vz=chunked(vz),
        w=chunked(w, 1.0),
        bbox=chunked(jnp.stack(
            [bbox_min_x, bbox_max_x, bbox_min_y, bbox_max_y], axis=-1)),
        world=chunked(tri_world),
        normal=chunked(tri_normals),
        color=chunked(tri_colors),
    )

    # Pixel-center NDC grid; the soft renderer addresses rows top-down
    # (rasterize.py:315-316), so no final flip is needed. When image rows are
    # sharded over a mesh axis, row_offset/full_height address this strip's
    # rows inside the full image (parallel/sharded.py).
    if full_height is None:
        full_height = image_height
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    px = (2.0 * (jnp.arange(image_width, dtype=jnp.float32) + 0.5) /
          image_width - 1.0)
    rows = jnp.arange(image_height, dtype=jnp.float32) + jnp.asarray(
        row_offset, jnp.float32)
    py = -2.0 * (rows + 0.5) / full_height + 1.0
    pxg = px[None, :, None]  # [1, W, 1]
    pyg = py[:, None, None]  # [H, 1, 1]

    def step(carry, data):
        running_max, sum_w, sum_c, sil_prod = carry
        # Screen-space barycentrics: linear in (px, py, 1). [H, W, C, 3]
        bc_screen = (data["m2_inv"][None, None, :, :, 0] * pxg[..., None] +
                     data["m2_inv"][None, None, :, :, 1] * pyg[..., None] +
                     data["m2_inv"][None, None, :, :, 2])
        is_inside = jnp.all(bc_screen >= 0.0, axis=-1)  # [H, W, C]

        # Nearest point on each edge (v0v1, v1v2, v2v0) and its distance.
        p2 = jnp.stack(
            [jnp.broadcast_to(pxg, (image_height, image_width, 1)),
             jnp.broadcast_to(pyg, (image_height, image_width, 1))],
            axis=-1)  # [H, W, 1, 2]
        vxy = data["vxy"]  # [C, 3, 2]
        dists = []
        ts = []
        for e0, e1 in ((0, 1), (1, 2), (2, 0)):
            a = vxy[None, None, :, e0]
            b = vxy[None, None, :, e1]
            nearest, t = point_to_segment_nearest(p2, a, b)
            d = nearest - p2
            dists.append(jnp.sum(d * d, axis=-1))
            ts.append(t)
        dists = jnp.stack(dists, axis=-1)  # [H, W, C, 3]
        sq_dist = jnp.min(dists, axis=-1)
        nearest_edge = jnp.argmin(dists, axis=-1)  # first minimum, like torch
        t01, t12, t20 = ts
        zeros = jnp.zeros_like(t01)
        bc_edges = jnp.stack([
            jnp.stack([1.0 - t01, t01, zeros], axis=-1),
            jnp.stack([zeros, 1.0 - t12, t12], axis=-1),
            jnp.stack([t20, zeros, 1.0 - t20], axis=-1),
        ], axis=-2)  # [H, W, C, 3(edge), 3(bc)]
        bc_edge = jnp.take_along_axis(
            bc_edges, nearest_edge[..., None, None], axis=-2)[..., 0, :]

        chosen_bc = jnp.where(is_inside[..., None], bc_screen, bc_edge)
        # Perspective-correct sample barycentrics: L1-normalize bc/w
        # (rasterize.py:359-365).
        bc_over_w = _safe_div(chosen_bc, data["w"][None, None])
        sample_bc = normalize(bc_over_w, p=1, axis=-1)

        # Depth: NDC z in [-1, 1] -> (0, 1] with 1 at the near plane
        # (rasterize.py:368-374).
        z_ndc = jnp.sum(sample_bc * data["vz"][None, None], axis=-1)
        z = 0.5 - z_ndc / 2.0
        z_ok = (z >= 0.0) & (z <= 1.0)

        in_bbox = ((pxg >= data["bbox"][None, None, :, 0]) &
                   (pxg <= data["bbox"][None, None, :, 1]) &
                   (pyg >= data["bbox"][None, None, :, 2]) &
                   (pyg <= data["bbox"][None, None, :, 3]))
        valid = (data["keep"][None, None] & in_bbox &
                 (is_inside | (sq_dist <= sq_blur)) & z_ok)

        if silhouette_only:
            # Alpha needs no shading; skipping it entirely (not feeding
            # dummies) also avoids NaN AD through normalize() at zero
            # vectors when callers have no real normals/lights to give.
            shade = jnp.zeros(sample_bc.shape[:-1] + (3,), jnp.float32)
        else:
            # Fused per-sample Phong diffuse shading (rasterize.py:183-208).
            # Full f32 precision: on TPU the default einsum/matmul is bf16,
            # which visibly shifts shaded colors (~1e-3) off the reference.
            hi = jax.lax.Precision.HIGHEST
            p3 = jnp.einsum("hwck,ckx->hwcx", sample_bc, data["world"],
                            precision=hi)
            n3 = normalize(
                jnp.einsum("hwck,ckx->hwcx", sample_bc, data["normal"],
                           precision=hi),
                p=2, axis=-1)
            dcol = jnp.einsum("hwck,ckx->hwcx", sample_bc, data["color"],
                              precision=hi)
            dirs = normalize(
                light_positions[None, None, None, :, :] - p3[..., None, :],
                p=2, axis=-1)  # [H, W, C, L, 3]
            ndl = jnp.clip(
                jnp.sum(dirs * n3[..., None, :], axis=-1), 0.0,
                1.0)  # [H, W, C, L]
            shade = dcol * jnp.sum(
                ndl * light_intensities[None, None, None, :], axis=-1,
                keepdims=True)  # [H, W, C, 3]

        # Sigmoid coverage and softmax-depth logits (rasterize.py:388-394).
        sgn = jnp.where(is_inside, 1.0, -1.0)
        coverage = jax.nn.sigmoid(sgn * sq_dist / sigma_val)
        coverage = jnp.where(valid, coverage, 0.0)
        logit = jnp.where(valid, z / gamma_val, -jnp.inf)

        # Online softmax merge.
        chunk_max = jnp.max(logit, axis=-1)  # [H, W]
        new_max = jnp.maximum(running_max, chunk_max)
        scale = jnp.exp(running_max - new_max)
        expw = coverage * jnp.exp(
            jnp.where(valid, logit - new_max[..., None], -jnp.inf))
        sum_w = sum_w * scale + jnp.sum(expw, axis=-1)
        sum_c = sum_c * scale[..., None] + jnp.sum(
            expw[..., None] * shade, axis=-2)
        sil_prod = sil_prod * jnp.prod(1.0 - coverage, axis=-1)
        return (new_max, sum_w, sum_c, sil_prod), None

    shape_hw = (image_height, image_width)
    init = (
        jnp.full(shape_hw, EPS / gamma_val, jnp.float32),  # running max
        jnp.zeros(shape_hw, jnp.float32),  # sum of weights
        jnp.zeros(shape_hw + (3,), jnp.float32),  # weighted color sum
        jnp.ones(shape_hw, jnp.float32),  # prod(1 - coverage)
    )
    (running_max, sum_w, sum_c, sil_prod), _ = jax.lax.scan(
        step, init, scan_data)

    # Background weight never reaches zero (rasterize.py:397-405).
    bg_weight = jnp.maximum(jnp.exp(EPS / gamma_val - running_max), EPS)
    total = sum_w + bg_weight
    rgb = sum_c / total[..., None]
    alpha = 1.0 - sil_prod
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def rasterize(world_space_vertices, triangles, normals, diffuse_colors,
              light_positions, light_intensities, camera_matrices,
              image_width, image_height, sigma_val, gamma_val,
              blur_radius=0.01, config=None, row_offset=None,
              full_height=None):
    """Soft-rasterize a batch of meshes (vmapped over the batch axis).

    Parity: rasterize.py:14-110, with the reference's Python batch loop
    (rasterize.py:91-108) replaced by `jax.vmap`.
    """
    clip_space_vertices = camera.transform_homogeneous(
        camera_matrices, world_space_vertices)
    return rasterize_clip_space_batch(
        clip_space_vertices, triangles, world_space_vertices, normals,
        diffuse_colors, light_positions, light_intensities, image_width,
        image_height, sigma_val, gamma_val, blur_radius=blur_radius,
        config=config, row_offset=row_offset, full_height=full_height)


def rasterize_clip_space_batch(clip_space_vertices, triangles,
                               world_space_vertices, normals, diffuse_colors,
                               light_positions, light_intensities,
                               image_width, image_height, sigma_val,
                               gamma_val, blur_radius=0.01, config=None,
                               row_offset=None, full_height=None):
    """Batched soft rasterization of already-projected meshes.

    All scene inputs carry a leading batch dimension. On the Pallas backend
    the batch is a native grid dimension (one pallas_call, vmap-free); the
    XLA backend vmaps the per-mesh kernel.
    """
    cfg = config or config_lib.SOFT_CONFIG
    backend = _select_backend(cfg)
    if backend == "pallas" and _pallas_usable(blur_radius, backend,
                                               triangles):
        from .soft_rasterize_pallas import soft_rasterize_pallas_batched
        return soft_rasterize_pallas_batched(
            clip_space_vertices, triangles, world_space_vertices,
            normals, diffuse_colors, light_positions, light_intensities,
            image_width, image_height, sigma_val, gamma_val,
            blur_radius=blur_radius, row_offset=row_offset,
            full_height=full_height, interpret=cfg.interpret,
            dot_precision=cfg.dot_precision, binning=cfg.binning)

    def one(clip_v, world_v, norms, colors, lights, intensities):
        return rasterize_batch(
            clip_v, triangles, world_v, norms, colors, lights, intensities,
            image_width, image_height, sigma_val, gamma_val,
            blur_radius=blur_radius, config=config, row_offset=row_offset,
            full_height=full_height)

    return jax.vmap(one)(clip_space_vertices, world_space_vertices, normals,
                         diffuse_colors, light_positions, light_intensities)


def rasterize_silhouette_clip_space_batch(clip_space_vertices, triangles,
                                          image_width, image_height,
                                          sigma_val, blur_radius=0.01,
                                          config=None, row_offset=None,
                                          full_height=None):
    """Silhouette-only (alpha channel) batched rasterization: [B, H, W].

    Bit-identical to ``rasterize_clip_space_batch(...)[..., 3]`` but needs
    no lights/normals/colors; on the Pallas backend it runs the dedicated
    silhouette kernels (~2x the full render — soft_rasterize_pallas.py).
    Off-TPU / traced blur the XLA spec runs with silhouette_only=True —
    the shading block is skipped outright (alpha never depends on it), so
    no dummy normals/lights enter AD. Supports row sharding via
    row_offset/full_height like the full entry point.
    """
    cfg = config or config_lib.SOFT_CONFIG
    backend = _select_backend(cfg)
    if backend == "pallas" and _pallas_usable(blur_radius, backend,
                                               triangles):
        from .soft_rasterize_pallas import (
            soft_rasterize_silhouette_pallas_batched)
        return soft_rasterize_silhouette_pallas_batched(
            clip_space_vertices, triangles, image_width, image_height,
            sigma_val, blur_radius=blur_radius, row_offset=row_offset,
            full_height=full_height, interpret=cfg.interpret,
            dot_precision=cfg.dot_precision, binning=cfg.binning)

    zeros3 = jnp.zeros(clip_space_vertices.shape[1:-1] + (3,), jnp.float32)
    dummy_lights = jnp.zeros([1, 3], jnp.float32)
    dummy_intensities = jnp.zeros([1], jnp.float32)

    def one(clip_v):
        return rasterize_batch(
            clip_v, triangles, zeros3, zeros3, zeros3, dummy_lights,
            dummy_intensities, image_width, image_height, sigma_val, 1e-4,
            blur_radius=blur_radius, config=config, row_offset=row_offset,
            full_height=full_height, silhouette_only=True)[..., 3]

    return jax.vmap(one)(clip_space_vertices)
