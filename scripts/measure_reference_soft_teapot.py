"""Measure the reference soft renderer on the BENCH soft-teapot config.

The shipped soft anchor (bench.py BASELINE_MEASURED, 0.0318 renders/sec)
was measured on a 12-triangle cube because the reference's python-loop
soft renderer is minutes/step on real meshes. This script measures the
actual apples-to-apples config — 128^2 teapot silhouette loss, fwd+bwd —
with ONE timed step (batch 1; the python loop scales linearly in batch,
and renders/sec is per render). Writes/updates BASELINE_MEASURED.json
with soft_teapot_128_fwdbwd_renders_per_sec.

Usage: python scripts/measure_reference_soft_teapot.py  (CPU, ~tens of
minutes — run in the background; does not touch the TPU)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MESH_RENDERER_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")


def main():
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch

    from src.common import obj_utils
    from src.soft_mesh_renderer import render as ref_render

    teapot = os.path.join(REFERENCE, "src", "examples", "teapot.obj")
    vertices, triangles, _ = obj_utils.load_obj(teapot)
    vertices = torch.as_tensor(np.asarray(vertices), dtype=torch.float32)

    # Mirror bench.build_scene batch element 0 (angle 0 => no rotation),
    # soft path: CCW triangles as loaded, silhouette (alpha) MSE loss.
    batch = 1
    size = 128
    verts = vertices[None].repeat(batch, 1, 1).requires_grad_(True)
    diffuse = torch.ones_like(verts) * torch.tensor([[[0.8, 0.6, 0.4]]])
    eye = torch.tensor([[0.0, 1.0, 4.0]])
    center = torch.zeros(batch, 3)
    up = torch.tensor([[0.0, 1.0, 0.0]])
    lights = torch.tensor([[[-2.0, 2.0, 4.0], [3.0, -1.0, 4.0]]])
    intensities = torch.ones(batch, 2)

    t0 = time.perf_counter()
    images = ref_render(
        verts, torch.as_tensor(np.asarray(triangles)), diffuse, eye, center,
        up, lights, intensities, size, size)
    loss = (images[..., 3] ** 2).mean()
    loss.backward()
    dt = time.perf_counter() - t0
    result = batch / dt
    print(f"one fwd+bwd step: {dt:.1f} s -> {result:.6f} renders/sec",
          flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data["soft_teapot_128_fwdbwd_renders_per_sec"] = round(result, 6)
    data["soft_teapot_128_provenance"] = (
        "reference python soft renderer, 1-core CPU, batch-1 128^2 teapot "
        f"silhouette MSE fwd+bwd, one step ({dt:.1f} s), 2026-08-17")
    with open(OUT, "w") as f:
        json.dump(data, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
