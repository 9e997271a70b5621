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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Opt-in multi-host (multi-process) initialization.

    Wraps `jax.distributed.initialize`: on TPU pods/multi-slice deployments
    with one process per host, call this once at program start (before any
    jax computation) and `jax.devices()` becomes the GLOBAL device list, so
    `make_mesh`/`make_multihost_mesh` span every host. On managed TPU
    runtimes (GKE, Cloud TPU VM with metadata) all arguments are
    auto-detected and may be omitted; otherwise pass the coordinator's
    address plus this process's rank.

    Safe to call when already initialized (no-op) and in single-process
    runs (initialize with num_processes=1 is valid).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Already initialized ("should only be called once"): keep it.
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def order_devices_for_dcn(devices, space: int):
    """Orders devices so `space` stays intra-host and `data` spans hosts.

    In a multi-host mesh the (data, space) grid is filled row-major, so
    consecutive devices share a data row (the `space` axis). Collectives on
    `space` run every rasterized strip (per-strip gradient psum), while
    `data` only reduces loss/grads once per step — so `space` must map to
    intra-host ICI links and `data` may cross the slower DCN. This sorts
    devices by (process_index, id) and checks each host contributes a
    multiple of `space` devices, guaranteeing no space group straddles a
    process boundary.
    """
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    counts: dict[int, int] = {}
    for d in devs:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    for proc, count in counts.items():
        if count % space != 0:
            raise ValueError(
                f"space={space} does not divide process {proc}'s "
                f"{count} local devices; a space group would span DCN. "
                "Choose space to divide the per-host device count.")
    return devs


def make_multihost_mesh(space: int = 1, devices=None) -> Mesh:
    """A (data, space) mesh over ALL processes' devices, DCN-aware.

    Call `init_distributed()` first in each process. The `space` axis is
    kept within a host (ICI); the `data` axis spans hosts (DCN) — see
    order_devices_for_dcn. Verified against virtual multi-process device
    lists in tests/test_parallel.py; real multi-host runs require a pod
    deployment (out of scope for the single-chip CI environment, see
    docs/parallel.md).
    """
    if devices is None:
        devices = jax.devices()
    devs = order_devices_for_dcn(devices, space)
    return make_mesh(space=space, devices=devs)
