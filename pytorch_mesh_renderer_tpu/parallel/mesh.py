"""Device meshes for SPMD rendering.

The reference is single-process / single-device with Python `for` loops over
the batch (src/mesh_renderer/rasterize.py:112-121,
src/soft_mesh_renderer/rasterize.py:91-108) and no distributed backend of any
kind (SURVEY.md §2 "Parallelism"). The TPU-native framework scales the same
batched API over a 2D logical mesh instead:

  * axis "data"  — shards the mesh batch (data parallelism). Rendering is
    batch-independent, so the forward pass needs no collectives at all;
    training reduces loss/grads with `psum` over this axis.
  * axis "space" — shards pixel *rows* of each image (spatial parallelism,
    the renderer analogue of sequence parallelism). Both rasterizers take a
    `row_offset`/`full_height` so each shard rasterizes only its strip;
    vertex gradients from the strip are partial sums combined by `psum`.

Collectives ride ICI when the mesh is built over one slice; no
NCCL/MPI-style backend exists or is needed — XLA inserts everything.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(data: int | None = None, space: int = 1, devices=None) -> Mesh:
    """Builds a (data, space) logical mesh over the available devices.

    Args:
      data: size of the batch-sharding axis. Defaults to
        n_devices // space.
      space: size of the image-row-sharding axis.
      devices: optional explicit device list (defaults to jax.devices()).

    Returns:
      a jax.sharding.Mesh with axes ("data", "space").
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % space != 0:
            raise ValueError(
                f"{n} devices are not divisible by space={space}.")
        data = n // space
    if data * space > n:
        raise ValueError(
            f"Mesh {data}x{space} needs {data * space} devices, have {n}.")
    grid = np.asarray(devices[:data * space]).reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def single_device_mesh() -> Mesh:
    """A trivial 1x1 mesh (useful so the sharded API also runs on one chip)."""
    return make_mesh(data=1, space=1, devices=jax.devices()[:1])
