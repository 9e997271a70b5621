"""Public API surface contract (docs/migration.md).

A user migrating from the reference must find every mapped entry point at
the documented import path with the documented signature defaults. This
pins the table so a rename/refactor can't silently break the migration
story. (Reference entry points: src/mesh_renderer/render.py:16,
src/soft_mesh_renderer/render.py:15, src/common/*.py.)
"""

import inspect

import pytorch_mesh_renderer_tpu as pmr
from pytorch_mesh_renderer_tpu.ops import rasterize as rasterize_mod
from pytorch_mesh_renderer_tpu.ops import soft_rasterize as soft_rast_mod
from pytorch_mesh_renderer_tpu.utils import test_utils


def _params(fn):
    return inspect.signature(fn).parameters


def test_hard_render_signature_matches_reference():
    p = _params(pmr.mesh_renderer.render)
    ref_order = [
        "vertices", "triangles", "normals", "diffuse_colors",
        "camera_position", "camera_lookat", "camera_up", "light_positions",
        "light_intensities", "image_width", "image_height",
        "specular_colors", "shininess_coefficients", "ambient_color",
        "fov_y", "near_clip", "far_clip"]
    assert list(p)[:len(ref_order)] == ref_order
    assert p["fov_y"].default == 40.0
    assert p["near_clip"].default == 0.01
    assert p["far_clip"].default == 10.0
    assert p["specular_colors"].default is None


def test_soft_render_signature_matches_reference():
    p = _params(pmr.soft_mesh_renderer.render)
    ref_order = [
        "vertices", "triangles", "diffuse_colors", "camera_position",
        "camera_lookat", "camera_up", "light_positions",
        "light_intensities", "image_width", "image_height", "sigma_val",
        "gamma_val", "blur_radius", "fov_y", "near_clip", "far_clip"]
    assert list(p)[:len(ref_order)] == ref_order
    assert p["sigma_val"].default == 1e-5
    assert p["gamma_val"].default == 1e-4
    assert p["blur_radius"].default == 0.01


def test_mapped_entry_points_exist():
    # camera_utils.py:10-170
    for name in ("euler_matrices", "look_at", "perspective",
                 "transform_homogeneous", "clip_space_transforms"):
        assert callable(getattr(pmr.camera, name))
    # meshes.py:3
    assert callable(pmr.mesh.compute_vertex_normals)
    # shapes.py:4/:83
    assert callable(pmr.shapes.sphere) and callable(pmr.shapes.cube)
    assert _params(pmr.shapes.sphere)["resolution"].default == 25
    # obj_utils.py:6/:78
    assert _params(pmr.obj_io.load_obj)["normalize"].default is True
    assert callable(pmr.obj_io.save_obj)
    # debug_utils.py:3-11 + jit-safe additions
    for name in ("debug_tensor", "check_isnan_isinf", "debug_check_finite",
                 "debug_warn_if"):
        assert callable(getattr(pmr.debug, name))
    # render.py:231/:389
    assert callable(pmr.mesh_renderer.phong_shader)
    assert callable(pmr.mesh_renderer.tone_mapper)
    # rasterize.py:15-99
    for name in ("rasterize", "rasterize_clip_space",
                 "rasterize_barycentric"):
        assert callable(getattr(rasterize_mod, name))
    assert callable(soft_rast_mod.rasterize)
    # silhouette fast path + scale-out + config knobs (no ref analogue)
    assert callable(pmr.soft_mesh_renderer.render_silhouette)
    assert callable(pmr.parallel.make_train_step)
    assert callable(pmr.parallel.make_train_loop)
    assert callable(pmr.config.set_debug_checks)
    assert pmr.config.HardRasterizerConfig().backend == "auto"
    # test-harness budgets (test_utils.py)
    assert callable(test_utils.check_jacobians_are_nearly_equal)
    assert callable(test_utils.expect_image_file_and_render_are_near)
