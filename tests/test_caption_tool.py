"""Smoke test for tools/caption_images.py — the batch-inference surface:
directory of raw JPEGs + a saved checkpoint -> captions json, through the
real CLI (checkpoint load, threaded image ingest, batched greedy decode
from pixels through the full CNN)."""
import json
import os
import pickle
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_caption_images_cli(tmp_path, monkeypatch):
    from PIL import Image
    from simpleimagecaptionzoo_tpu.config import DataConfig, ModelConfig
    from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
    from simpleimagecaptionzoo_tpu.models.base import get_captioner
    from simpleimagecaptionzoo_tpu.vocab import SPECIALS, Vocabulary
    import jax

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "photos"
    img_dir.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, size=(48, 56, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"photo_{i}.jpg")
    # one corrupt file must be skipped with a warning, not abort the run
    (img_dir / "corrupt.jpg").write_bytes(b"\xff\xd8\xff\xe0 not a jpeg")

    vocab = Vocabulary()
    for w in SPECIALS + ("a", "dog", "cat", "runs"):
        vocab.add_word(w)
    vocab_path = tmp_path / "caption_vocab.pkl"
    with open(vocab_path, "wb") as f:
        pickle.dump(vocab, f)

    # config files the tool resolves, mirroring the real layout
    ds_root = tmp_path / "Configs" / "Datasets"
    md_root = tmp_path / "Configs" / "Models"
    ds_root.mkdir(parents=True)
    md_root.mkdir(parents=True)
    (ds_root / "TinyDS.data").write_text(
        "image_root=/photos/\ndata_dir=/\n"
        "caption_vocab_path=/caption_vocab.pkl\n")
    (md_root / "NIC.json").write_text(json.dumps(
        {"model_type": "NIC", "embed_dim": 16, "hidden_dim": 16}))

    # a checkpoint to serve from (params as trained weights stand-in)
    cfg = ModelConfig(model_type="NIC", vocab_size=len(vocab),
                      embed_dim=16, hidden_dim=16)
    model = get_captioner(cfg)
    tree = {"params": model.init_params(jax.random.PRNGKey(0)),
            "model_state": model.init_model_state()}
    ck = CheckpointManager("NIC", "TinyDS",
                           root=str(tmp_path / "CheckPoints"))
    ck.save_best(tree, cider=0.0)

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "caps.json"
    monkeypatch.setattr(sys, "argv", [
        "caption_images.py", "--image_dir", str(img_dir),
        "--dataset", "TinyDS", "--model_type", "NIC",
        "--dataset_config_root", str(ds_root) + "/",
        "--model_config_root", str(md_root) + "/",
        "--checkpoint_root", str(tmp_path / "CheckPoints"),
        "--beam", "-1", "--batch", "4", "--img_size", "64",
        "--dtype", "float32", "--out", str(out)])
    from tools import caption_images
    assert caption_images.main() == 0

    with open(out) as f:
        results = json.load(f)
    assert len(results) == 5            # corrupt.jpg excluded, not fatal
    names = {r["file_name"] for r in results}
    assert names == {f"photo_{i}.jpg" for i in range(5)}
    for r in results:
        assert isinstance(r["caption"], str)

    # invalid beam sizes fail with a clear argument error, not a trace error
    monkeypatch.setattr(sys, "argv", [
        "caption_images.py", "--image_dir", str(img_dir),
        "--dataset", "TinyDS", "--model_type", "NIC",
        "--dataset_config_root", str(ds_root) + "/",
        "--model_config_root", str(md_root) + "/",
        "--checkpoint_root", str(tmp_path / "CheckPoints"),
        "--beam", "0", "--batch", "4", "--img_size", "64",
        "--dtype", "float32", "--out", str(out)])
    with pytest.raises(SystemExit, match="--beam"):
        caption_images.main()
