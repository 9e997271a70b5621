"""Measure the reference implementation's CPU throughput (baseline anchor).

Writes BASELINE_MEASURED.json at the repo root with fwd+bwd renders/sec for
the reference (andrewkchan/pytorch_mesh_renderer) on this machine's CPU:

  * hard renderer, batch-4 256^2 Phong-lit teapot, loss.backward() per step,
    using the fastest available backend — the C++ CppExtension kernel if it
    builds (src/mesh_renderer/kernels/rasterize_triangles.cpp), else the
    pure-Python kernel (with a proportionally smaller measurement config,
    scaled by measured per-pixel cost).

The reference publishes no numbers of its own (BASELINE.md), so this
measured anchor is what bench.py's `vs_baseline` divides by.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MESH_RENDERER_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")


def build_cpp_kernel():
    """Builds the reference C++ kernel out-of-tree (never writes to the
    read-only reference checkout). Returns the module or None."""
    try:
        import torch  # noqa: F401
        from torch.utils import cpp_extension
    except ImportError:
        return None
    src = os.path.join(REFERENCE, "src", "mesh_renderer", "kernels",
                       "rasterize_triangles.cpp")
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(REPO, ".ref_build")
    os.makedirs(build_dir, exist_ok=True)
    try:
        return cpp_extension.load(
            name="rasterize_triangles_cpp", sources=[src],
            build_directory=build_dir, verbose=False)
    except Exception as e:  # noqa: BLE001
        print(f"C++ kernel build failed ({e}); falling back to python kernel",
              file=sys.stderr)
        return None


def main():
    sys.path.insert(0, REFERENCE)
    import torch

    cpp_mod = build_cpp_kernel()
    if cpp_mod is not None:
        # Install the module so the reference's extension wrapper finds it,
        # then flip its backend switch.
        sys.modules["rasterize_triangles_cpp"] = cpp_mod
        from src.mesh_renderer import rasterize as ref_rasterize
        ref_rasterize.USE_CPP_RASTERIZER = True
        backend = "cpp"
    else:
        from src.mesh_renderer import rasterize as ref_rasterize
        ref_rasterize.USE_CPP_RASTERIZER = False
        backend = "python"

    import src.mesh_renderer as ref_mr
    from src.common import obj_utils

    size = 256 if backend == "cpp" else 64
    batch = 4 if backend == "cpp" else 1
    iters = 5 if backend == "cpp" else 1

    teapot = os.path.join(REFERENCE, "src", "examples", "teapot.obj")
    vertices, triangles, normals = obj_utils.load_obj(teapot)
    triangles = torch.flip(triangles, [1])  # hard renderer wants CW
    vertices = vertices.unsqueeze(0).repeat(batch, 1, 1)
    normals = normals.unsqueeze(0).repeat(batch, 1, 1)
    vertices.requires_grad_(True)
    diffuse = torch.ones_like(normals) * torch.tensor([0.8, 0.6, 0.4])
    eye = torch.tensor([[0.0, 1.0, 4.0]]).repeat(batch, 1)
    center = torch.zeros(batch, 3)
    up = torch.tensor([[0.0, 1.0, 0.0]]).repeat(batch, 1)
    lights = torch.tensor(
        [[[-2.0, 2.0, 4.0], [3.0, -1.0, 4.0]]]).repeat(batch, 1, 1)
    intensities = torch.ones(batch, 2, 3)

    def step():
        images = ref_mr.render(
            vertices, triangles, normals, diffuse, eye, center, up, lights,
            intensities, size, size)
        loss = (images[..., :3] ** 2).mean()
        loss.backward()
        vertices.grad = None
        return loss

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    renders_per_sec = batch * iters / dt

    # The python-kernel fallback measures a different (64^2 batch-1) config;
    # writing it under the 256^2 key would silently corrupt every
    # vs_baseline bench.py computes. Use a config-specific key instead so
    # bench.py (which only reads the 256^2 key) never divides by a
    # mismatched anchor.
    key = ("hard_teapot_256_fwdbwd_renders_per_sec" if backend == "cpp"
           else "hard_teapot_64_b1_python_fwdbwd_renders_per_sec")
    result = {
        key: renders_per_sec,
        "backend": backend,
        "config": {"size": size, "batch": batch, "iters": iters},
        "note": ("measured on this image's CPU; python-kernel fallback "
                 "measures a 64^2 batch-1 config under its own key — it is "
                 "NOT comparable to the 256^2 C++ anchor"
                 if backend == "python" else
                 "reference fastest path (C++ CppExtension kernel)"),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
