"""Test environment setup.

Tests run on CPU with a virtual 8-device mesh so the multi-chip sharding
path compiles and executes without TPU hardware (the driver benches on real
TPU separately). Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments register an external TPU plugin that wins the default-
# backend choice even when JAX_PLATFORMS=cpu is set; the config update below
# forces the CPU backend regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = os.environ.get("MESH_RENDERER_REFERENCE", "/root/reference")


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
