"""Small numeric helpers shared across the framework.

These mirror the semantics of the torch primitives the reference relies on
(`torch.nn.functional.normalize`, clamped norms) so that forward renders are
numerically comparable with the reference implementation
(/root/reference/src/common/*.py), while being pure jax.numpy functions that
are safe under `jit`/`vmap`/`grad`.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray, p: int = 2, axis: int = -1,
              eps: float = 1e-12) -> jnp.ndarray:
    """Lp-normalize `x` along `axis` with a clamped denominator.

    Matches torch.nn.functional.normalize: x / max(||x||_p, eps), where the
    norm is computed along `axis` and broadcast back.
    """
    if p == 2:
        norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    elif p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        norm = jnp.sum(jnp.abs(x) ** p, axis=axis, keepdims=True) ** (1.0 / p)
    return x / jnp.maximum(norm, eps)


def dot_last(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product along the last axis (no keepdims)."""
    return jnp.sum(a * b, axis=-1)
