"""Debug & observability helpers.

Parity target: /root/reference/src/common/debug_utils.py:3-11 (full-tensor
printing, NaN/Inf assertion), upgraded for the JAX execution model: the
host-side checks work on concrete arrays, and `jit`-safe variants are
provided via jax.debug so the numeric guards survive tracing (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def debug_tensor(tensor, msg: str = "") -> None:
    """Pretty-print a full tensor (host-side)."""
    with np.printoptions(threshold=np.inf, linewidth=200):
        print("[debug tensor] {}".format(msg))
        print(np.asarray(tensor))


def check_isnan_isinf(tensor, msg: str = "") -> None:
    """Raise ValueError if the (concrete) tensor contains NaN or Inf."""
    arr = np.asarray(tensor)
    if np.isnan(arr).any() or np.isinf(arr).any():
        raise ValueError(msg)


def debug_warn_if(bad, msg: str = "") -> None:
    """jit-safe predicate warning: prints `msg` from compiled code when the
    traced boolean `bad` is True at runtime; no-op (and free) otherwise.

    The traced analogue of the reference's host asserts
    (camera_utils.py:65-76): `jax.debug.print` under `lax.cond` rather
    than raising, so compiled training steps are never invalidated.

    Requires a PJRT backend with host send/recv callbacks — standard
    CPU/GPU/TPU runtimes have them; some experimental tunneled backends
    (e.g. axon) raise UNIMPLEMENTED at dispatch, in which case leave
    debug checks off (the default) on that backend.
    """
    bad = jnp.asarray(bad).any()

    def _warn(_):
        jax.debug.print("[mesh_renderer debug] {msg}", msg=msg)

    jax.lax.cond(bad, _warn, lambda _: None, 0)


def debug_check_finite(tensor, msg: str = "") -> None:
    """jit-safe NaN/Inf check: warns from inside compiled code ONLY on
    failure.

    Usable under jit/vmap where `check_isnan_isinf` cannot run; silent on
    finite tensors so it can stay always-on in training loops (SURVEY §5).
    Uses `jax.debug.print` under `lax.cond` rather than raising so compiled
    training steps are never invalidated.
    """
    bad = jnp.logical_or(jnp.isnan(tensor).any(), jnp.isinf(tensor).any())
    debug_warn_if(bad, "{}: NON-FINITE values detected".format(msg))
