"""Vendored example target assets (SURVEY §2 #27).

The reference ships its optimization targets as PNGs
(/root/reference/src/examples/example*_target*.png); a standalone clone must
fit those actual targets, so they are vendored under assets/example_targets
and examples/common.target_path prefers them over the reference checkout.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

TARGETS = [
    "example4_target.png", "example5b_target.png", "example6_target.png",
    "example6b_target.png", "example7b_target1.png", "example7b_target2.png",
    "example7b_target3.png", "example7b_target4.png",
]


def test_all_targets_vendored():
    for name in TARGETS:
        path = os.path.join(REPO, "assets", "example_targets", name)
        assert os.path.exists(path), f"missing vendored target {name}"
        assert os.path.getsize(path) > 500  # a real PNG, not a placeholder


def test_target_path_prefers_vendored():
    import common

    for name in TARGETS:
        assert common.target_path(name) == os.path.join(
            common.EXAMPLE_TARGETS, name)


def test_fit_shape_targets_load_from_vendored(monkeypatch):
    import common
    import fit_shape_multiview

    # Even with the reference checkout absent, the vendored assets serve.
    monkeypatch.setattr(common, "REFERENCE_EXAMPLES", "/nonexistent")
    targets, from_file = fit_shape_multiview.load_targets(32)
    assert from_file
    assert targets.shape == (4, 32, 32)
