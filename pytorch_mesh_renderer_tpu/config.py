"""Framework configuration.

The reference scatters its knobs across hardcoded module globals
(USE_CPP_RASTERIZER in rasterize.py:14, SHOW_DEBUG_LOGS/EPS in the soft
rasterizer, MAX_DEPTH in quadtree.py). Here all knobs live in small
dataclasses with a module-level default that call sites may override
per-invocation.
"""

from __future__ import annotations

import dataclasses
import os

import jax

# In-kernel dot precision, the `dot_precision` knob on both rasterizer
# configs. These dots feed rendered images and analytic gradients, so
# precision was checked explicitly on TPU v5e:
#   * forward interpolation dots: DEFAULT (plain bf16 MXU) measures 4.2e-6
#     max abs fwd error vs the XLA spec — identical to HIGHEST (the
#     contractions select one winner row, so low-order mantissa bits of the
#     f32 decomposition don't accumulate);
#   * backward reduction dots ([C, P] x [P, 3] / [C, P] x [P, A]): DEFAULT
#     adds ~0.5% relative noise to the vertex/attribute gradients (measured
#     compiled-vs-XLA on v5e, 64x48 cube) — inside every reference gradient
#     gate (1% relative outlier budget) and immaterial to SGD.
# "highest" (bf16x6 passes) removes the noise but costs ~29% end-to-end
# (567 -> 401 renders/s at the 256^2 headline; Mosaic rejects HIGH, so
# there is no bf16x3 middle ground). DEFAULT is therefore the default;
# select dot_precision="highest" on the config for exact-parity debugging
# (pinned on TPU by tests/test_rasterize_pallas.py).
DOT_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_dot_precision(name):
    try:
        return DOT_PRECISIONS[name]
    except KeyError:
        raise ValueError(
            f"dot_precision must be one of {sorted(DOT_PRECISIONS)}, got "
            f"{name!r} (Mosaic supports no other dot precisions).") from None

# Default binning mode for both rasterizers. 'auto' resolves per kernel
# path from the round-4 v5e measurements (BENCH.md): hard -> chunk, soft
# full render -> gathered while the mesh fits one gathered pass, soft
# silhouette -> chunk. The env override forces ONE concrete mode
# everywhere so benchmark sweeps can compare 'gathered' vs 'chunk' on
# identical trees without editing code.
_DEFAULT_BINNING = os.environ.get("MESH_RENDERER_BINNING", "auto")
if _DEFAULT_BINNING not in ("auto", "gathered", "chunk"):
    raise ValueError(
        f"MESH_RENDERER_BINNING={_DEFAULT_BINNING!r} "
        "(want 'auto', 'gathered' or 'chunk')")


@dataclasses.dataclass(frozen=True)
class HardRasterizerConfig:
    """Configuration for the hard (Genova-style barycentric) rasterizer.

    Attributes:
      backend: 'xla' (dense chunked jnp kernel — the semantic spec, mirrors
        the reference's pure-python kernel role), 'pallas' (tiled TPU kernel)
        or 'auto' (pallas on TPU, xla elsewhere).
      triangle_chunk: triangles processed per scan step in the XLA backend;
        bounds peak memory at H*W*chunk intermediates.
      dot_precision: 'default' (plain bf16 MXU dots — ~0.5%-relative
        gradient noise on TPU, measured inside every parity gate) or
        'highest' (bf16x6 — exact f32 parity with the XLA spec at ~29%
        end-to-end cost). Affects only the Pallas backend's in-kernel
        matmuls; see DOT_PRECISIONS above.
      spatial_sort: chunk-binning mode only — let the fused Pallas kernel
        re-bin triangles in a batch-shared screen-space order when that
        culls tighter than the caller's order (decided per call under
        jit). Values are unchanged (pure selection); only bit-exact z
        ties between coplanar triangles may resolve differently. The
        gathered binning mode ignores this (its per-triangle tile lists
        are already exact and its ties use original ids).
      interpret: Pallas backend only — None (default) compiles on TPU and
        interprets elsewhere, resolved from the *default* backend (or, in
        the parallel.sharded_* wrappers, from the mesh's own devices so a
        CPU dry-run mesh never attempts a Mosaic compile even when a TPU
        default backend exists). True/False force the mode.
      binning: 'auto' (default) — resolved per kernel path from measured
        v5e tradeoffs (hard -> 'chunk': the gathered plan prepass costs
        more than its culled visits save on every hard config, BENCH.md
        round 4). 'gathered' — triangle-granularity per-tile binning: an
        XLA prepass scatters each triangle's packed row into per-tile
        chunk-aligned segments, so kernels visit only true
        (triangle, tile) bbox overlaps (~1.5-2.4x fewer visits than
        chunk-granularity unions on the bench scenes); triangles spanning
        many tiles fall back to the in-kernel legacy loop. 'chunk' — the
        chunk-granularity prepass alone. Outputs are bit-identical across
        modes.
    """
    backend: str = "auto"
    triangle_chunk: int = 64
    dot_precision: str = "default"
    spatial_sort: bool = True
    binning: str = _DEFAULT_BINNING
    interpret: bool | None = None


@dataclasses.dataclass(frozen=True)
class SoftRasterizerConfig:
    """Configuration for the soft (SoftRas-style) rasterizer.

    Attributes:
      backend: 'xla' or 'pallas' or 'auto'.
      triangle_chunk: triangles per online-aggregation scan step.
      eps: background-probability floor (reference EPS=1e-10,
        soft_mesh_renderer/rasterize.py:211).
      binning: 'auto' (default) — full render resolves to 'gathered'
        (triangle-granularity binning over the blur-inflated bboxes; the
        one path where it measures faster, +5-12% on v5e) while the mesh
        fits one gathered pass, else 'chunk'; the silhouette kernels
        always resolve to 'chunk' (BENCH.md round 4). 'gathered'/'chunk'
        force a mode. See HardRasterizerConfig.binning.
      interpret: see HardRasterizerConfig.interpret.
    """
    backend: str = "auto"
    triangle_chunk: int = 64
    eps: float = 1e-10
    dot_precision: str = "default"
    binning: str = _DEFAULT_BINNING
    interpret: bool | None = None


HARD_CONFIG = HardRasterizerConfig()
SOFT_CONFIG = SoftRasterizerConfig()

# --- Debug checks -----------------------------------------------------------
#
# The reference guards degenerate cameras with ALWAYS-ON host asserts
# (/root/reference/src/common/camera_utils.py:65-76). Under jit those
# asserts cannot run (values are tracers), so by default this framework
# checks only concrete inputs (ops/camera.py) and a degenerate camera
# inside a jitted train loop silently produces NaNs. Enabling debug
# checks restores the reference's guard semantics as TRACED checks:
# `camera.look_at` emits a runtime warning (jax.debug.print under
# lax.cond — compiled steps are never invalidated) when a camera is
# degenerate, and `models/*.render` checks its output images for
# NaN/Inf. Cost: a few scalar reductions + a host callback that fires
# only on failure; off (the default) the compiled program is unchanged.
#
# The flag is read at TRACE time: flip it before building/jitting a step
# (already-compiled functions keep the behavior they were traced with).
_DEBUG_CHECKS = os.environ.get("MESH_RENDERER_DEBUG", "0") not in (
    "0", "", "false", "False")


def set_debug_checks(enabled: bool) -> None:
    """Enable/disable traced debug checks (see module comment above)."""
    global _DEBUG_CHECKS
    _DEBUG_CHECKS = bool(enabled)


def debug_checks_enabled() -> bool:
    return _DEBUG_CHECKS
