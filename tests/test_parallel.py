"""SPMD scale-out tests on a virtual 8-device CPU mesh.

The reference has no distributed capability to mirror (SURVEY.md §2
"Parallelism"); these tests pin down the net-new contract: sharded rendering
over (data, space) meshes is bit-identical to the single-device path, and
gradients flow through shard_map with the right implicit psums.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pytorch_mesh_renderer_tpu import parallel
from pytorch_mesh_renderer_tpu.models import shapes
from pytorch_mesh_renderer_tpu.ops import camera, mesh as mesh_ops
from pytorch_mesh_renderer_tpu.ops.rasterize import rasterize
from pytorch_mesh_renderer_tpu.ops import soft_rasterize

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _cube_scene(batch=4):
    verts, tris, _ = shapes.cube(2.0)
    verts = jnp.tile(verts[None], [batch, 1, 1])
    # Distinct per-batch rotations.
    angles = jnp.stack(
        [jnp.linspace(0.1, 0.5, batch),
         jnp.linspace(-0.3, 0.4, batch),
         jnp.zeros(batch)], axis=-1)
    rot = camera.euler_matrices(angles)[:, :3, :3]
    verts = jnp.einsum("bij,bvj->bvi", rot, verts)
    eye = jnp.tile(jnp.array([[0.0, 0.0, 6.0]]), [batch, 1])
    center = jnp.zeros([batch, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [batch, 1])
    cams = camera.clip_space_transforms(
        eye, center, up, jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), 16, 16)
    attrs = jnp.tile(
        jnp.linspace(0.0, 1.0, verts.shape[1] * 3).reshape(
            1, verts.shape[1], 3), [batch, 1, 1])
    return verts, tris, attrs, cams


@needs_8_devices
def test_make_mesh_shapes():
    m = parallel.make_mesh(data=4, space=2)
    assert m.shape["data"] == 4 and m.shape["space"] == 2
    m = parallel.make_mesh()
    assert m.shape["data"] == 8 and m.shape["space"] == 1


@needs_8_devices
@pytest.mark.parametrize("data,space", [(4, 2), (2, 4), (8, 1)])
def test_sharded_rasterize_matches_single_device(data, space):
    verts, tris, attrs, cams = _cube_scene(batch=max(4, data))
    background = np.zeros([3], np.float32)
    expected = rasterize(verts, attrs, tris, cams, 16, 16, background)

    m = parallel.make_mesh(data=data, space=space)
    got = jax.jit(lambda v, a, c: parallel.sharded_rasterize(
        m, v, a, tris, c, 16, 16, background))(verts, attrs, cams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


@needs_8_devices
def test_sharded_rasterize_gradients_match():
    verts, tris, attrs, cams = _cube_scene(batch=4)
    background = np.zeros([3], np.float32)
    m = parallel.make_mesh(data=2, space=4)

    def loss_single(v):
        img = rasterize(v, attrs, tris, cams, 16, 16, background)
        return jnp.mean(img ** 2)

    def loss_sharded(v):
        img = parallel.sharded_rasterize(
            m, v, attrs, tris, cams, 16, 16, background)
        return jnp.mean(img ** 2)

    g_single = jax.grad(loss_single)(verts)
    g_sharded = jax.jit(jax.grad(loss_sharded))(verts)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-4, atol=1e-6)


@needs_8_devices
def test_sharded_soft_rasterize_matches_single_device():
    batch = 2
    verts, tris, _ = shapes.sphere(1.0, resolution=6)
    verts = jnp.tile(verts[None], [batch, 1, 1])
    normals = mesh_ops.compute_vertex_normals(verts, tris)
    colors = jnp.ones_like(verts) * 0.7
    lights = jnp.tile(jnp.array([[[0.0, 3.0, 3.0]]]), [batch, 1, 1])
    intensities = jnp.ones([batch, 1])
    eye = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), [batch, 1])
    center = jnp.zeros([batch, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [batch, 1])
    cams = camera.clip_space_transforms(
        eye, center, up, jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), 16, 16)

    expected = soft_rasterize.rasterize(
        verts, tris, normals, colors, lights, intensities, cams, 16, 16,
        1e-4, 1e-4)

    m = parallel.make_mesh(data=2, space=4)
    got = jax.jit(lambda v, n, c, l, i, cam: parallel.sharded_soft_rasterize(
        m, v, tris, n, c, l, i, cam, 16, 16, 1e-4, 1e-4))(
            verts, normals, colors, lights, intensities, cams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@needs_8_devices
def test_spmd_train_step_reduces_loss():
    import optax

    verts, tris, attrs, cams = _cube_scene(batch=4)
    background = np.zeros([3], np.float32)
    m = parallel.make_mesh(data=4, space=2)
    target = rasterize(verts, attrs, tris, cams, 16, 16, background)

    def loss_fn(params, batch):
        v = batch["verts"] + params["offset"]
        img = parallel.sharded_rasterize(
            m, v, attrs, tris, batch["cams"], 16, 16, background)
        return jnp.mean(jnp.abs(img - batch["target"]))

    opt = optax.adam(5e-3)
    params = parallel.replicate(m, {"offset": jnp.full([1, 1, 3], 0.05)})
    opt_state = opt.init(params)
    batch = parallel.shard_batch(
        m, {"verts": verts, "cams": cams, "target": target})
    step = parallel.make_train_step(loss_fn, opt)

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_spmd_train_loop_matches_steps():
    """make_train_loop(K) == K applications of make_train_step (one
    dispatch instead of K — the ~0.5 ms/step host-floor amortization)."""
    import optax

    verts, tris, attrs, cams = _cube_scene(batch=4)
    background = np.zeros([3], np.float32)
    m = parallel.make_mesh(data=4, space=2)
    target = rasterize(verts, attrs, tris, cams, 16, 16, background)

    def loss_fn(params, batch):
        v = batch["verts"] + params["offset"]
        img = parallel.sharded_rasterize(
            m, v, attrs, tris, batch["cams"], 16, 16, background)
        return jnp.mean(jnp.abs(img - batch["target"]))

    opt = optax.adam(5e-3)
    batch = parallel.shard_batch(
        m, {"verts": verts, "cams": cams, "target": target})

    def init():
        params = parallel.replicate(m, {"offset": jnp.full([1, 1, 3], 0.05)})
        return params, opt.init(params)

    step = parallel.make_train_step(loss_fn, opt)
    params_a, state_a = init()
    step_losses = []
    for _ in range(5):
        params_a, state_a, loss = step(params_a, state_a, batch)
        step_losses.append(float(loss))

    loop = parallel.make_train_loop(loss_fn, opt, steps_per_call=5)
    params_b, state_b = init()
    params_b, state_b, losses = loop(params_b, state_b, batch)

    assert losses.shape == (5,)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(step_losses),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params_b["offset"]),
                               np.asarray(params_a["offset"]),
                               rtol=1e-6, atol=1e-7)
    # A second call continues from the donated carry without retracing.
    params_b, state_b, losses2 = loop(params_b, state_b, batch)
    assert float(losses2[-1]) < float(losses[0])


@needs_8_devices
def test_sharded_soft_rasterize_gradients_match():
    """Soft sharded gradients (batch + pixel-row psums through shard_map)
    equal the single-device gradients."""
    batch = 2
    verts, tris, _ = shapes.sphere(1.0, resolution=6)
    verts = jnp.tile(verts[None], [batch, 1, 1])
    colors = jnp.ones_like(verts) * 0.7
    lights = jnp.tile(jnp.array([[[0.0, 3.0, 3.0]]]), [batch, 1, 1])
    intensities = jnp.ones([batch, 1])
    eye = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), [batch, 1])
    center = jnp.zeros([batch, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [batch, 1])
    cams = camera.clip_space_transforms(
        eye, center, up, jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), 16, 16)

    def loss_single(v):
        normals = mesh_ops.compute_vertex_normals(v, tris)
        img = soft_rasterize.rasterize(
            v, tris, normals, colors, lights, intensities, cams, 16, 16,
            1e-4, 1e-4)
        return jnp.mean(img[..., 3] ** 2)

    m = parallel.make_mesh(data=2, space=4)

    def loss_sharded(v):
        normals = mesh_ops.compute_vertex_normals(v, tris)
        img = parallel.sharded_soft_rasterize(
            m, v, tris, normals, colors, lights, intensities, cams, 16, 16,
            1e-4, 1e-4)
        return jnp.mean(img[..., 3] ** 2)

    g_single = jax.grad(loss_single)(verts)
    g_sharded = jax.jit(jax.grad(loss_sharded))(verts)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-4, atol=1e-6)


@needs_8_devices
def test_sharded_rasterize_multi_pass_large_mesh(monkeypatch):
    """Multi-pass triangle slicing composes with (data, space) sharding:
    shrinking the per-pass cap inside the shard_mapped kernel still
    reproduces the single-device render."""
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp

    cfg = config_lib.HardRasterizerConfig(backend="pallas")
    verts, tris, attrs, cams = _cube_scene(batch=4)
    background = np.zeros([3], np.float32)
    expected = rasterize(verts, attrs, tris, cams, 16, 16, background,
                         config=cfg)

    monkeypatch.setattr(rp, "MAX_PALLAS_TRIANGLES", 5)  # 12 tris -> 3 passes
    monkeypatch.setattr(rp, "MAX_GATHERED_TRIANGLES", 5)
    m = parallel.make_mesh(data=2, space=4)
    got = jax.jit(lambda v, a, c: parallel.sharded_rasterize(
        m, v, a, tris, c, 16, 16, background, config=cfg))(verts, attrs,
                                                           cams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-host readiness (unit-level: explicit/synthetic device lists)
# ---------------------------------------------------------------------------

class _FakeDevice:
    """Stand-in with the attributes order_devices_for_dcn consumes."""

    def __init__(self, process_index, dev_id):
        self.process_index = process_index
        self.id = dev_id

    def __repr__(self):
        return f"d{self.process_index}:{self.id}"


def test_multihost_device_order_keeps_space_intra_host():
    # 2 hosts x 4 devices, interleaved and shuffled on input.
    devs = [_FakeDevice(p, i) for p in (1, 0) for i in (3, 1, 2, 0)]
    ordered = parallel.order_devices_for_dcn(devs, space=2)
    assert [(d.process_index, d.id) for d in ordered] == [
        (0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1), (1, 2), (1, 3)]
    # Row-major (data, space) fill: every space pair shares a host.
    grid = np.asarray(ordered, dtype=object).reshape(4, 2)
    for row in grid:
        assert len({d.process_index for d in row}) == 1


def test_multihost_device_order_rejects_dcn_spanning_space():
    devs = [_FakeDevice(0, 0), _FakeDevice(0, 1), _FakeDevice(0, 2),
            _FakeDevice(1, 0), _FakeDevice(1, 1), _FakeDevice(1, 2)]
    with pytest.raises(ValueError, match="space group would span DCN"):
        parallel.order_devices_for_dcn(devs, space=4)


def test_multihost_mesh_from_explicit_subset():
    # All virtual CPU devices share process 0, so any subset is one "host";
    # the mesh must still build over an explicit device subset.
    devs = jax.devices()[:4]
    mesh = parallel.make_multihost_mesh(space=2, devices=devs)
    assert mesh.shape == {"data": 2, "space": 2}
    assert list(mesh.axis_names) == ["data", "space"]
    # And rendering over it matches the default-mesh result.
    assert set(np.asarray(mesh.devices).ravel()) == set(devs)


def test_init_distributed_single_process_subprocess():
    """init_distributed must run before any jax computation, so exercise it
    in a fresh process: single-process initialize, idempotent second call,
    then a multihost mesh over the (global == local) device list."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # Run with -S (no sitecustomize): the environment's sitecustomize may
    # register a TPU PJRT plugin whose client creation blocks when the
    # device tunnel is down, hanging jax.distributed.initialize's backend
    # discovery even under JAX_PLATFORMS=cpu. This test is about the
    # distributed-init API on CPU, so bypass site hooks deterministically.
    # -S drops site-packages from sys.path; restore it via PYTHONPATH.
    import sysconfig
    purelib = sysconfig.get_paths()["purelib"]
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, purelib] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    code = (
        "from pytorch_mesh_renderer_tpu import parallel\n"
        "parallel.init_distributed(coordinator_address='localhost:12321',"
        " num_processes=1, process_id=0)\n"
        "parallel.init_distributed(coordinator_address='localhost:12321',"
        " num_processes=1, process_id=0)\n"  # idempotent
        "import jax\n"
        "assert jax.process_count() == 1, jax.process_count()\n"
        "n = len(jax.devices())\n"
        "mesh = parallel.make_multihost_mesh(space=1)\n"
        "assert mesh.shape == {'data': n, 'space': 1}, mesh.shape\n"
        "print('DIST_OK')\n")
    result = subprocess.run(
        [sys.executable, "-S", "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=300)
    assert result.returncode == 0, (
        f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}")
    assert "DIST_OK" in result.stdout


@needs_8_devices
def test_sharded_soft_silhouette_matches_single_device():
    """Row-sharded silhouette fast path == unsharded alpha, grads too."""
    batch = 2
    verts, tris, _ = shapes.sphere(1.0, resolution=6)
    verts = jnp.tile(verts[None], [batch, 1, 1])
    eye = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), [batch, 1])
    center = jnp.zeros([batch, 3])
    up = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), [batch, 1])
    cams = camera.clip_space_transforms(
        eye, center, up, jnp.full([batch], 40.0), jnp.full([batch], 0.01),
        jnp.full([batch], 10.0), 16, 16)

    def single_alpha(v):
        normals = mesh_ops.compute_vertex_normals(v, tris)
        colors = jnp.ones_like(v)
        lights = jnp.zeros([batch, 1, 3])
        intens = jnp.zeros([batch, 1])
        return soft_rasterize.rasterize(
            v, tris, normals, colors, lights, intens, cams, 16, 16,
            1e-4, 1e-4)[..., 3]

    m = parallel.make_mesh(data=2, space=4)

    def sharded_alpha(v):
        return parallel.sharded_soft_silhouette(
            m, v, tris, cams, 16, 16, 1e-4)

    got = jax.jit(sharded_alpha)(verts)
    expected = single_alpha(verts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)

    g_single = jax.grad(lambda v: jnp.mean(single_alpha(v) ** 2))(verts)
    g_sharded = jax.jit(
        jax.grad(lambda v: jnp.mean(sharded_alpha(v) ** 2)))(verts)
    scale = np.abs(np.asarray(g_single)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(g_sharded) / scale,
                               np.asarray(g_single) / scale, atol=2e-4)


@needs_8_devices
def test_resolve_config_pins_interpret_to_mesh_platform():
    """ADVICE r3: a CPU mesh must never let the Pallas kernels attempt a
    Mosaic compile, even if the process's default backend were a TPU. The
    sharded wrappers resolve backend='auto'/interpret=None from the mesh's
    own devices, not from jax.devices()."""
    from pytorch_mesh_renderer_tpu import config as config_lib
    from pytorch_mesh_renderer_tpu.parallel.sharded import _resolve_config

    mesh = parallel.make_mesh(data=4, space=2)
    assert mesh.devices.flat[0].platform == "cpu"

    # Explicit pallas backend + unset interpret -> interpreted on CPU mesh.
    cfg = _resolve_config(
        mesh, config_lib.HardRasterizerConfig(backend="pallas"),
        config_lib.HARD_CONFIG)
    assert cfg.interpret is True

    # auto backend resolves from the mesh platform (cpu -> xla).
    cfg = _resolve_config(mesh, None, config_lib.HARD_CONFIG)
    assert cfg.backend == "xla"

    # Explicit interpret=False passes through untouched (caller's call).
    cfg = _resolve_config(
        mesh,
        config_lib.SoftRasterizerConfig(backend="pallas", interpret=False),
        config_lib.SOFT_CONFIG)
    assert cfg.interpret is False and cfg.backend == "pallas"
