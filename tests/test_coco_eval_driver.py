"""Direct tests for the COCO eval driver (evalcap/coco_eval.py) and the
device-side image normalization (ops/image.py) — previously covered only
transitively through the e2e pipeline."""
import json
import os

import numpy as np
import pytest


def _tiny_annotations(tmp_path):
    """Minimal modified-annotations json: 2 images x 2 refs."""
    anns, imgs = [], []
    refs = {1: ["a dog runs on the beach", "the dog runs fast"],
            2: ["a man rides a horse", "the man rides slowly"]}
    k = 0
    for img_id, sents in refs.items():
        imgs.append({"id": img_id, "file_name": f"i{img_id}.jpg",
                     "sentids": [], "sentences": [
                         {"tokens": s.split(), "raw": s} for s in sents]})
        for s in sents:
            anns.append({"image_id": img_id, "id": k, "caption": s,
                         "tokens": s.split(), "file_name": f"i{img_id}.jpg"})
            k += 1
    path = tmp_path / "captions_val.json"
    with open(path, "w") as f:
        json.dump({"dataset": "tiny", "images": imgs, "annotations": anns}, f)
    return str(path)


def test_coco_eval_scores_and_result_file(tmp_path, monkeypatch):
    from simpleimagecaptionzoo_tpu.evalcap.coco_eval import coco_eval
    ann = _tiny_annotations(tmp_path)
    monkeypatch.chdir(tmp_path)
    results = [{"image_id": 1, "caption": "a dog runs on the beach"},
               {"image_id": 2, "caption": "a man rides a horse"}]
    cider = coco_eval(results, ann)
    assert cider > 1.0          # near-verbatim captions score high
    out = tmp_path / "coco_caption" / "results" / "captions-generate.json"
    assert out.exists()
    with open(out) as f:
        assert json.load(f) == results
    # a wrong caption scores strictly lower
    worse = coco_eval([{"image_id": 1, "caption": "a cat sleeps"},
                       {"image_id": 2, "caption": "a man rides a horse"}],
                      ann)
    assert worse < cider


def test_coco_eval_specific_writes_statics(tmp_path, monkeypatch):
    from simpleimagecaptionzoo_tpu.evalcap.coco_eval import coco_eval_specific
    ann = _tiny_annotations(tmp_path)
    monkeypatch.chdir(tmp_path)
    results = [{"image_id": 1, "caption": "a dog runs on the beach"},
               {"image_id": 2, "caption": "something else entirely"}]
    statics = tmp_path / "statics"
    cider = coco_eval_specific(results, ann, statics_dir=str(statics))
    assert np.isfinite(cider)
    txt = statics / "CIDEr_Result.txt"
    assert txt.exists()
    body = txt.read_text()
    assert "best samples:" in body and "worst samples:" in body
    # per-image ranking: the verbatim caption's image ranks best
    lines = body.splitlines()
    best_line = lines[lines.index("best samples:") + 1]
    assert best_line.split()[0] == "1"


def test_device_normalization_matches_torchvision_math():
    import jax.numpy as jnp

    from simpleimagecaptionzoo_tpu.ops.image import (IMAGENET_MEAN,
                                                     IMAGENET_STD,
                                                     maybe_normalize,
                                                     normalize)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(normalize(jnp.asarray(img)))
    want = (img.astype(np.float32) / 255.0
            - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
                IMAGENET_STD, np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # maybe_normalize: uint8 -> normalized; float input passes through
    np.testing.assert_allclose(
        np.asarray(maybe_normalize(jnp.asarray(img))), want, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(maybe_normalize(jnp.asarray(want))), want)
