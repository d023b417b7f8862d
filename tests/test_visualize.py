"""Smoke tests for the attention visualization helpers (reference
Utils.py:370-432 equivalents) — headless Agg backend, tiny arrays."""
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from simpleimagecaptionzoo_tpu.utils.visualize import (visualize_att,
                                                       visualize_att_bboxes)


def test_visualize_att_saves(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(
        np.uint8)
    alphas = np.random.default_rng(1).random((3, 49)).astype(np.float32)
    out = tmp_path / "att.png"
    visualize_att(img, alphas, ["a", "dog", "runs"], save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_visualize_att_bboxes_with_and_without_alphas(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    bboxes = np.array([[1, 1, 10, 10], [5, 5, 20, 20]], np.float32)
    alphas = rng.random((2, 2)).astype(np.float32)
    out = tmp_path / "b1.png"
    visualize_att_bboxes(img, alphas, bboxes, ["a", "dog"],
                         save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    # alphas=None (greedy decode without attention capture) must not crash
    out2 = tmp_path / "b2.png"
    visualize_att_bboxes(img, None, bboxes, ["a", "dog"],
                         save_path=str(out2))
    assert out2.exists() and out2.stat().st_size > 0
