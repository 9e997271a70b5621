"""SPMD rendering and training over a TPU device mesh.

Net-new capability vs the reference, which renders its batch in a Python
loop on one device (src/mesh_renderer/rasterize.py:112-121) and has no
distributed backend at all (SURVEY.md §2, §5). Scaling strategy:

  * **Data parallelism** — the batch axis of the `[batch, V, 3]` scene API
    shards over the mesh "data" axis. Rendering is batch-independent, so the
    forward pass needs zero collectives; `jax.grad` through the shard_map
    inserts the psums training needs automatically.
  * **Spatial parallelism** — pixel *rows* shard over the "space" axis (the
    renderer's analogue of sequence parallelism). Each device rasterizes a
    horizontal strip via the kernels' `row_offset`/`full_height` arguments;
    the analytic backward pass produces per-strip partial vertex gradients
    whose combination is, again, an automatic psum.

Only the hot rasterization kernel runs under `shard_map` (where the strip
offsets need manual control). Shading, losses and optimizer steps stay under
plain `jit` on the global (sharded) arrays, so XLA keeps per-pixel math local
and inserts collectives only where semantics demand them (e.g. the specular
shader's cross-pixel normalization, ops/shading.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config as config_lib
from ..ops import rasterize as rasterize_lib
from ..ops import soft_rasterize as soft_rasterize_lib
from ..ops import camera
from .mesh import DATA_AXIS, SPACE_AXIS

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None


def _axis_in_mesh(mesh, name):
    return name in mesh.axis_names and mesh.shape[name] > 1


def _resolve_config(mesh, config, default):
    """Pins the config's backend/interpret choices to the MESH's platform.

    The kernel-level defaults ('auto' backend, interpret=None) resolve from
    the process's *default* jax backend — wrong under shard_map when the
    mesh targets a different platform (e.g. the driver's virtual-CPU dry-run
    mesh while a TPU plugin is the default backend: the Pallas kernels would
    attempt a Mosaic compile on CPU devices and crash). Here both resolve
    from `mesh.devices` instead, which is always the platform the shards
    actually run on. Explicit (non-auto / non-None) values pass through.
    """
    cfg = config or default
    on_tpu = mesh.devices.flat[0].platform == "tpu"
    updates = {}
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if on_tpu else "xla"
        updates["backend"] = backend
    if backend == "pallas" and cfg.interpret is None:
        updates["interpret"] = not on_tpu
    return dataclasses.replace(cfg, **updates) if updates else cfg


def shard_batch(mesh, tree):
    """Places a pytree of batched arrays with axis 0 sharded over "data"."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    """Replicates a pytree (e.g. trainable params) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def sharded_rasterize(mesh, world_space_vertices, attributes, triangles,
                      camera_matrices, image_width, image_height,
                      background_value, config=None):
    """`ops.rasterize.rasterize` distributed over a (data, space) mesh.

    The batch shards over "data"; pixel rows shard over "space", each shard
    rasterizing rows [i*H/s, (i+1)*H/s) of the kernel's bottom-up row order.
    Output is the globally-assembled [batch, H, W, A] attribute image
    (sharded on (batch, rows)); semantics are identical to the unsharded op.
    """
    n_space = mesh.shape[SPACE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if image_height % n_space != 0:
        raise ValueError(
            f"image_height={image_height} must divide over the space axis "
            f"({n_space}).")
    batch = world_space_vertices.shape[0]
    if batch % n_data != 0:
        raise ValueError(
            f"batch={batch} must divide over the data axis ({n_data}).")
    local_h = image_height // n_space
    tris = np.asarray(triangles, np.int32)
    background_value = np.asarray(background_value, np.float32)
    config = _resolve_config(mesh, config, config_lib.HARD_CONFIG)

    clip_space_vertices = camera.transform_homogeneous(
        camera_matrices, world_space_vertices)

    def strip(clip_verts, attrs):
        row_offset = jax.lax.axis_index(SPACE_AXIS) * local_h
        return rasterize_lib.rasterize_clip_space(
            clip_verts, attrs, tris, image_width, local_h, background_value,
            config=config, row_offset=row_offset, full_height=image_height)

    fn = jax.shard_map(
        strip, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, SPACE_AXIS),
        check_vma=False)
    return fn(clip_space_vertices, attributes)


def sharded_soft_rasterize(mesh, world_space_vertices, triangles, normals,
                           diffuse_colors, light_positions,
                           light_intensities, camera_matrices, image_width,
                           image_height, sigma_val, gamma_val,
                           blur_radius=0.01, config=None):
    """`ops.soft_rasterize.rasterize` distributed over a (data, space) mesh.

    Same layout as `sharded_rasterize`; the soft kernel's rows are top-down,
    so strip i covers top-down rows [i*H/s, (i+1)*H/s) and the assembled
    output equals the unsharded render exactly.
    """
    n_space = mesh.shape[SPACE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if image_height % n_space != 0:
        raise ValueError(
            f"image_height={image_height} must divide over the space axis "
            f"({n_space}).")
    if world_space_vertices.shape[0] % n_data != 0:
        raise ValueError("batch must divide over the data axis.")
    local_h = image_height // n_space
    tris = np.asarray(triangles, np.int32)
    config = _resolve_config(mesh, config, config_lib.SOFT_CONFIG)

    clip_space_vertices = camera.transform_homogeneous(
        camera_matrices, world_space_vertices)

    def strip(clip_v, world_v, norms, colors, lights, intensities):
        row_offset = jax.lax.axis_index(SPACE_AXIS) * local_h
        return soft_rasterize_lib.rasterize_clip_space_batch(
            clip_v, tris, world_v, norms, colors, lights, intensities,
            image_width, local_h, sigma_val, gamma_val,
            blur_radius=blur_radius, config=config, row_offset=row_offset,
            full_height=image_height)

    fn = jax.shard_map(
        strip, mesh=mesh,
        in_specs=(P(DATA_AXIS),) * 6,
        out_specs=P(DATA_AXIS, SPACE_AXIS),
        check_vma=False)
    return fn(clip_space_vertices, world_space_vertices, normals,
              diffuse_colors, light_positions, light_intensities)


def sharded_soft_silhouette(mesh, world_space_vertices, triangles,
                            camera_matrices, image_width, image_height,
                            sigma_val, blur_radius=0.01, config=None):
    """Silhouette-only soft render distributed over a (data, space) mesh.

    The row-sharded counterpart of `soft_mesh_renderer.render_silhouette`
    (~2x the full render on the Pallas backend): each space-axis strip
    renders top-down rows [i*H/s, (i+1)*H/s) of the [B, H, W] alpha image;
    the assembled output equals the unsharded silhouette exactly.
    """
    n_space = mesh.shape[SPACE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if image_height % n_space != 0:
        raise ValueError(
            f"image_height={image_height} must divide over the space axis "
            f"({n_space}).")
    if world_space_vertices.shape[0] % n_data != 0:
        raise ValueError("batch must divide over the data axis.")
    local_h = image_height // n_space
    tris = np.asarray(triangles, np.int32)
    config = _resolve_config(mesh, config, config_lib.SOFT_CONFIG)

    clip_space_vertices = camera.transform_homogeneous(
        camera_matrices, world_space_vertices)

    def strip(clip_v):
        row_offset = jax.lax.axis_index(SPACE_AXIS) * local_h
        return soft_rasterize_lib.rasterize_silhouette_clip_space_batch(
            clip_v, tris, image_width, local_h, sigma_val,
            blur_radius=blur_radius, config=config, row_offset=row_offset,
            full_height=image_height)

    fn = jax.shard_map(
        strip, mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(DATA_AXIS, SPACE_AXIS),
        check_vma=False)
    return fn(clip_space_vertices)


def make_train_step(loss_fn, optimizer, donate=True):
    """Builds a jitted SPMD train step: grad -> optimizer update.

    Args:
      loss_fn: (params, batch) -> scalar loss. Render calls inside may use
        the sharded rasterizers above; jax.grad transposes the shard_map and
        inserts the data/space psums automatically.
      optimizer: an optax GradientTransformation.
      donate: donate params/opt_state buffers (in-place update on device).

    Returns:
      step(params, opt_state, batch) -> (params, opt_state, loss), jitted.
      Place `params` with `replicate(mesh, ...)` and `batch` with
      `shard_batch(mesh, ...)` before the first call; jit then compiles one
      SPMD program for the whole mesh.

    This replaces the reference's eager per-step optimizer loops
    (src/examples/example5.py:60-90, mesh_renderer_test.py:246-256) with a
    single compiled fwd+bwd+update program.
    """
    if optimizer is None:
        raise ValueError("optimizer is required (e.g. optax.adam(1e-2)).")

    donate_argnums = (0, 1) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_argnums)
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_train_loop(loss_fn, optimizer, steps_per_call, donate=True):
    """Like `make_train_step`, but runs `steps_per_call` optimizer steps in
    ONE dispatch via `lax.scan`.

    Why: a jitted no-op round-trip costs ~0.5 ms on this host (BENCH.md
    step-time breakdown), so per-step Python loops bound small-scene
    optimization at ~2k steps/s no matter how fast the kernels are. Scanning
    K steps inside one executable amortizes that floor K-fold — the
    TPU-idiomatic training loop (vs the reference's eager per-step loops,
    src/examples/example5.py:60-90). Host-side logging granularity becomes
    one loss vector per call, which is why K is a caller knob rather than
    the whole schedule: call the loop in chunks and log between chunks.

    Returns:
      loop(params, opt_state, batch) -> (params, opt_state, losses) where
      `losses` has shape [steps_per_call] (per-step, in order). Semantics
      are exactly `steps_per_call` applications of `make_train_step`'s step
      with a fixed batch.
    """
    if optimizer is None:
        raise ValueError("optimizer is required (e.g. optax.adam(1e-2)).")
    if steps_per_call < 1:
        raise ValueError("steps_per_call must be >= 1")

    donate_argnums = (0, 1) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_argnums)
    def loop(params, opt_state, batch):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps_per_call)
        return params, opt_state, losses

    return loop
