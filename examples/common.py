"""Shared helpers for the example CLIs.

The reference ships eight argparse scripts (src/examples/example*.py,
SURVEY.md §2 #16-21); these helpers centralize their common glue: teapot
loading, PNG/mp4 artifact output, and target-image handling so each example
stays focused on its optimization loop.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TEAPOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "teapot.obj")

# Vendored optimization targets (the reference's example*_target*.png,
# /root/reference/src/examples — cow silhouettes etc.), so a standalone
# clone fits the reference's actual targets instead of procedural stand-ins.
EXAMPLE_TARGETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "example_targets")

# Optional location of the upstream reference's example assets; only used as
# a fallback when a vendored target is missing.
REFERENCE_EXAMPLES = os.environ.get(
    "MESH_RENDERER_REFERENCE_EXAMPLES", "/root/reference/src/examples")


def target_path(name):
    """Path of an example target PNG: vendored asset, else reference checkout.

    Returns the vendored assets/example_targets path when it exists (the
    normal case), otherwise the corresponding path under the reference
    checkout; callers fall back to synthesizing a target when neither
    exists.
    """
    vendored = os.path.join(EXAMPLE_TARGETS, name)
    if os.path.exists(vendored):
        return vendored
    return os.path.join(REFERENCE_EXAMPLES, name)


def load_teapot(path=None, normalize=True):
    """Teapot OBJ (vendored asset) or a procedural sphere fallback."""
    from pytorch_mesh_renderer_tpu.utils import obj_io
    from pytorch_mesh_renderer_tpu.models import shapes

    path = path or DEFAULT_TEAPOT
    if os.path.exists(path):
        return obj_io.load_obj(path, normalize=normalize)
    print(f"[examples] {path} not found; using a procedural sphere",
          file=sys.stderr)
    return shapes.sphere(1.0, resolution=24)


def save_png(path, image):
    """Writes an [H, W, C] float image in [0, 1] as PNG."""
    import imageio.v2 as imageio

    image = np.clip(np.asarray(image, np.float64), 0.0, 1.0)
    imageio.imwrite(path, (image * 255.0).astype(np.uint8))
    print(f"wrote {path}")


def load_png(path):
    import imageio.v2 as imageio

    return imageio.imread(path).astype(np.float32) / 255.0


class VideoWriter:
    """Appends frames to an mp4 (like the reference examples' imageio use);
    silently degrades to PNG frame dumps if ffmpeg is unavailable."""

    def __init__(self, path, fps=20):
        self.path = path
        self._writer = None
        try:
            import imageio.v2 as imageio
            self._writer = imageio.get_writer(path, fps=fps)
        except Exception as e:  # noqa: BLE001
            print(f"[examples] mp4 writer unavailable ({e}); skipping video",
                  file=sys.stderr)

    def append(self, image):
        if self._writer is None:
            return
        image = np.clip(np.asarray(image, np.float64), 0.0, 1.0)
        self._writer.append_data((image * 255.0).astype(np.uint8))

    def close(self):
        if self._writer is not None:
            self._writer.close()
            print(f"wrote {self.path}")


def save_loss_plot(path, losses):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("[examples] matplotlib unavailable; skipping loss plot",
              file=sys.stderr)
        return
    plt.figure()
    plt.plot(losses)
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.savefig(path)
    plt.close()
    print(f"wrote {path}")
