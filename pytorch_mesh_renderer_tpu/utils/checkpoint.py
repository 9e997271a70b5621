"""Checkpoint / resume for optimization state.

The reference has no checkpointing at all — its longest-running example only
dumps preview OBJ/PNG artifacts (example7b.py:261-277, SURVEY.md §5). Here
optimization state (params + optimizer state + step counter, any pytree) is
saved with orbax when available, else via numpy-pickled flattened pytrees, so
long fitting runs survive preemption — table stakes for TPU jobs.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save(path: str, state) -> None:
    """Saves a pytree of arrays to `path` (a directory for orbax, a file
    otherwise)."""
    state = jax.tree_util.tree_map(np.asarray, state)
    if ocp is not None:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), state, force=True)
        ckpt.wait_until_finished()
        return
    leaves, treedef = jax.tree_util.tree_flatten(state)
    with open(path, "wb") as f:
        pickle.dump({"leaves": leaves, "treedef": treedef}, f)


def restore(path: str, like):
    """Restores a pytree saved by `save`. `like` provides the structure (and,
    for orbax, the dtypes/shapes) of the expected state."""
    if ocp is not None and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        target = jax.tree_util.tree_map(np.asarray, like)
        return ckpt.restore(os.path.abspath(path), target)
    with open(path, "rb") as f:
        data = pickle.load(f)
    return jax.tree_util.tree_unflatten(data["treedef"], data["leaves"])


def exists(path: str) -> bool:
    return os.path.isdir(path) or os.path.isfile(path)
