"""Pins the driver contract of __graft_entry__.py.

The driver (a) compile-checks `entry()` on one chip and (b) runs
`dryrun_multichip(N)` in an environment with N *virtual CPU devices*
(`--xla_force_host_platform_device_count=N`) where the default backend may be
broken — so the dry run must never touch it. Both are exercised here: once
in-process on the test suite's virtual 8-device CPU mesh, and once in a fresh
subprocess that mirrors the driver environment (JAX_PLATFORMS unset).
"""

import os
import subprocess
import sys

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 64, 64, 4)
    assert out.dtype == jax.numpy.float32


needs_8_cpu_devices = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8,
    reason="needs 8 virtual CPU devices (native-platform runs skip the "
           "xla_force_host_platform_device_count forcing)")


@needs_8_cpu_devices
def test_dryrun_multichip_in_process():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@needs_8_cpu_devices
def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as ge

    ge.dryrun_multichip(7)  # exercises the space=1 fallback


@needs_8_cpu_devices
def test_dryrun_exercises_pallas_backend(monkeypatch):
    """The driver's multichip signal must run the production Pallas kernels
    (interpret mode on CPU), not just the XLA spec (VERDICT r2 weak #3)."""
    import __graft_entry__ as ge
    from pytorch_mesh_renderer_tpu.ops import rasterize_pallas as rp
    from pytorch_mesh_renderer_tpu.ops import soft_rasterize_pallas as sp

    calls = set()
    orig_hard = rp.rasterize_interpolate_pallas_batched
    orig_soft = sp.soft_rasterize_pallas_batched

    def spy_hard(*a, **k):
        calls.add("hard")
        return orig_hard(*a, **k)

    def spy_soft(*a, **k):
        calls.add("soft")
        return orig_soft(*a, **k)

    monkeypatch.setattr(rp, "rasterize_interpolate_pallas_batched", spy_hard)
    monkeypatch.setattr(sp, "soft_rasterize_pallas_batched", spy_soft)
    ge.dryrun_multichip(8)
    assert calls == {"hard", "soft"}


def test_dryrun_multichip_clear_error_when_too_few_devices():
    import __graft_entry__ as ge

    with pytest.raises(RuntimeError, match="virtual CPU devices"):
        ge.dryrun_multichip(10_000)


def test_dryrun_multichip_hermetic_subprocess():
    """Fresh process, JAX_PLATFORMS unset — the driver's exact setup.

    dryrun_multichip must force the CPU platform itself before any backend
    (e.g. a TPU plugin) initializes; round 1 failed exactly here
    (MULTICHIP_r01.json ok=false).
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = ("import __graft_entry__ as ge; "
            "ge.dryrun_multichip(8); "
            "print('DRYRUN_OK')")
    result = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, (
        f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}")
    assert "DRYRUN_OK" in result.stdout
