"""Test environment setup.

Tests run on CPU with a virtual 8-device mesh so the multi-chip sharding
path compiles and executes without TPU hardware (the driver benches on real
TPU separately). Must run before jax is imported anywhere.
"""

import os
import sys

# Set MESH_RENDERER_TEST_PLATFORM=native to skip the CPU forcing and run the
# suite compiled on the host's real backend (e.g. TPU: Pallas kernels compile
# through Mosaic instead of the interpreter). Tests that need 8 devices skip
# themselves when fewer exist.
_NATIVE = os.environ.get("MESH_RENDERER_TEST_PLATFORM", "") == "native"
if not _NATIVE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Persistent compilation cache: this box has ONE cpu core, so Mosaic/XLA
# compiles dominate native-platform suite time; reruns of unchanged kernels
# hit the disk cache instead.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

if not _NATIVE:
    # Some environments register an external TPU plugin that wins the
    # default-backend choice even when JAX_PLATFORMS=cpu is set; the config
    # update below forces the CPU backend regardless.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = os.environ.get("MESH_RENDERER_REFERENCE", "/root/reference")

# Vendored test data: golden PNGs (copied once from the reference's
# src/mesh_renderer/test_data) and .npz snapshots of reference-oracle
# outputs, so a standalone clone runs the full suite with zero skips.
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")
ORACLE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "oracle")
ASSETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def reference_available() -> bool:
    """True if the upstream PyTorch reference can be imported as an oracle."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def import_reference():
    """Import the reference package (as `src`) for oracle comparisons."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src  # noqa: F401
    return src


def oracle_snapshot(name, compute):
    """Reference-oracle outputs with a vendored fallback.

    When the reference checkout is importable, `compute()` runs it live
    (dict of numpy arrays) and the result is (re)vendored to
    tests/oracle/<name>.npz; otherwise the snapshot is loaded so standalone
    clones still execute every oracle assertion — a missing snapshot is a
    hard failure, never a skip.
    """
    import numpy as np

    path = os.path.join(ORACLE_DIR, name + ".npz")
    if reference_available():
        arrays = {k: np.asarray(v) for k, v in compute().items()}
        os.makedirs(ORACLE_DIR, exist_ok=True)
        np.savez_compressed(path, **arrays)
        return arrays
    if not os.path.exists(path):
        raise AssertionError(
            f"oracle snapshot {path} is missing and the reference checkout "
            "is unavailable; regenerate it by running the suite once with "
            "MESH_RENDERER_REFERENCE set.")
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
