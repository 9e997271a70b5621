"""Test harness utilities: golden-image and Jacobian comparison.

Parity target: /root/reference/src/mesh_renderer/test_utils.py:12-160 —
soft golden-image comparison (outlier-pixel budget, diff artifacts written on
failure) and analytical-vs-numerical Jacobian checks with an outlier-entry
budget. The analytical Jacobian uses `jax.jacrev` (one reverse pass per
output, like the reference's repeated `autograd.grad` one-hot loop); the
numerical Jacobian uses central differences with the same layout
(inputs x outputs).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def images_are_near(baseline_image, result_image,
                    max_outlier_fraction=0.001,
                    pixel_error_threshold=0.01):
    """Soft image comparison.

    Images match when at most `max_outlier_fraction` of pixels have any
    channel differing by more than `pixel_error_threshold` (both images in
    [0, 1]). Returns (matched: bool, outlier_fraction: float).
    """
    baseline_image = np.asarray(baseline_image, np.float64)
    result_image = np.asarray(result_image, np.float64)
    assert baseline_image.shape == result_image.shape, (
        "Image shapes {} and {} do not match.".format(
            baseline_image.shape, result_image.shape))
    diff_image = np.abs(baseline_image - result_image)
    outlier_channels = diff_image > pixel_error_threshold
    outlier_pixels = np.any(outlier_channels, axis=-1)
    outlier_fraction = (
        np.count_nonzero(outlier_pixels) / np.prod(baseline_image.shape[:2]))
    return outlier_fraction <= max_outlier_fraction, outlier_fraction


def expect_image_file_and_render_are_near(test_instance, baseline_path,
                                          result_image,
                                          max_outlier_fraction=0.001,
                                          pixel_error_threshold=0.01):
    """Compare a rendered image to a PNG on disk (reference tolerances).

    The render is clipped to [0, 1] before comparison. On failure, the
    result and diff are written to /tmp for inspection, as in the reference
    (test_utils.py:144-158). `test_instance` may be a unittest.TestCase or
    None (plain assert).
    """
    import imageio.v2 as imageio

    baseline_image = imageio.imread(baseline_path).astype(np.float64) / 255.0
    result_image = np.clip(np.asarray(result_image, np.float64), 0.0, 1.0)
    matched, outlier_fraction = images_are_near(
        baseline_image, result_image, max_outlier_fraction,
        pixel_error_threshold)

    base_prefix = os.path.splitext(os.path.basename(baseline_path))[0]
    result_output_path = os.path.join("/tmp", base_prefix + "_result.png")
    diff_output_path = os.path.join("/tmp", base_prefix + "_diff.png")
    message = ("{} does not match. ({} of pixels are outliers, {} is "
               "allowed.) Result written to {}, diff to {}".format(
                   baseline_path, outlier_fraction, max_outlier_fraction,
                   result_output_path, diff_output_path))
    if not matched:
        imageio.imwrite(result_output_path,
                        (result_image * 255.0).astype(np.uint8))
        diff = np.abs(baseline_image - result_image)
        if diff.shape[-1] == 4:
            diff[..., 3] = 1.0
        imageio.imwrite(diff_output_path, (diff * 255.0).astype(np.uint8))
    if test_instance is not None and hasattr(test_instance, "assertTrue"):
        test_instance.assertTrue(matched, msg=message)
    else:
        assert matched, message


def get_analytical_jacobian(fn, x):
    """Jacobian of fn at x via reverse-mode AD, laid out [x.size, out.size].

    Matches the layout of the reference's autograd-based helper
    (test_utils.py:54-77).
    """
    jac = jax.jacrev(lambda v: fn(v).reshape(-1))(x)
    out_size = jac.shape[0]
    return np.asarray(jac.reshape(out_size, -1)).T


def get_numerical_jacobian(fn, x, eps=1e-3):
    """Central-difference Jacobian, laid out [x.size, out.size].

    Matches the reference helper (test_utils.py:80-102).
    """
    x = np.asarray(x, np.float64).copy()
    out0 = np.asarray(fn(jnp.asarray(x, jnp.float32))).reshape(-1)
    jacobian = np.zeros([x.size, out0.size], np.float64)
    flat = x.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig - eps
        outa = np.asarray(
            fn(jnp.asarray(x, jnp.float32)), np.float64).reshape(-1)
        flat[i] = orig + eps
        outb = np.asarray(
            fn(jnp.asarray(x, jnp.float32)), np.float64).reshape(-1)
        flat[i] = orig
        jacobian[i] = (outb - outa) / (2 * eps)
    return jacobian


def check_jacobians_are_nearly_equal(theoretical, numerical,
                                     outlier_relative_error_threshold,
                                     max_outlier_fraction):
    """Compare Jacobians allowing a fraction of relative-error outliers.

    Parity: test_utils.py:12-51 (entries where the numerical Jacobian is
    zero but the theoretical is not count as outliers via the inf relative
    error). Strictly stronger than the reference: the denominator is
    |numerical| — the reference divides by the *signed* value
    (test_utils.py:27), which lets sign-flipped analytic entries at negative
    numerical values produce a negative "relative error" that never trips
    the threshold.
    """
    theoretical = np.asarray(theoretical, np.float64)
    numerical = np.asarray(numerical, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(numerical - theoretical) / np.abs(numerical)
    outliers = rel > outlier_relative_error_threshold
    outlier_fraction = (
        np.count_nonzero(outliers) / np.prod(numerical.shape[:2]))
    matched = outlier_fraction <= max_outlier_fraction
    message = ("%f of gradients are relative outliers, max allowed %f" %
               (outlier_fraction, max_outlier_fraction))
    return matched, message
