"""CLI-level tests: flag parsing (incl. real boolean semantics) and a tiny
train->eval->sample run through ``simpleimagecaptionzoo_tpu.main`` with
reference-format config files on disk."""
import json
import os

import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.main import build_argparser, main as cli_main

pytestmark = pytest.mark.slow


def test_bool_flags_parse_correctly():
    p = build_argparser()
    a = p.parse_args(["--eval_scst", "False", "--eval_best", "True",
                      "--tqdm_visible", "0"])
    assert a.eval_scst is False and a.eval_best is True
    assert a.tqdm_visible is False
    with pytest.raises(SystemExit):
        p.parse_args(["--eval_scst", "maybe"])


def test_defaults_match_reference():
    a = build_argparser().parse_args([])
    assert (a.num_epochs, a.train_batch_size, a.label_smoothing) == (30, 128, 0.1)
    assert (a.scst_num_epochs, a.scst_train_batch_size) == (50, 128)
    assert (a.eval_batch_size, a.eval_beam_size) == (64, 3)
    assert (a.learning_rate, a.cnn_finetune_learning_rate) == (4e-4, 1e-4)
    assert a.cnn_finetune_start == 8 and a.learning_rate_decay_every == 3


def _write_dataset(root):
    """Tiny detection-style Flickr dataset + reference-format configs."""
    rng = np.random.default_rng(0)
    words = ["a", "dog", "cat", "runs", "sits", "on", "grass", "mat"]
    os.makedirs(root / "modified_annotations")
    for split, n0, n1 in (("train", 0, 8), ("val", 8, 10), ("test", 10, 12)):
        images, anns = [], []
        for i in range(n0, n1):
            sents, sentids = [], []
            for s in range(5):
                toks = [words[int(j)]
                        for j in rng.integers(0, len(words),
                                              rng.integers(3, 6))]
                anns.append({"image_id": i, "id": i * 5 + s,
                             "caption": " ".join(toks), "tokens": toks,
                             "file_name": f"img_{i}.jpg"})
                sents.append({"tokens": toks, "raw": " ".join(toks)})
                sentids.append(i * 5 + s)
            images.append({"id": i, "file_name": f"img_{i}.jpg",
                           "sentids": sentids, "sentences": sents})
        with open(root / "modified_annotations" /
                  f"captions_{split}.json", "w") as f:
            json.dump({"images": images, "annotations": anns}, f)
    (root / "Data" / "fixed_bu_feat").mkdir(parents=True)
    for i in range(12):
        np.savez(root / "Data" / "fixed_bu_feat" / f"{i}.npz",
                 feat=rng.normal(size=(5, 8)).astype(np.float32))
    from simpleimagecaptionzoo_tpu.vocab import build_vocab, save_vocab
    vocab = build_vocab([words], threshold=1)
    save_vocab(vocab, str(root / "Data" / "caption_vocab.pkl"))
    (root / "Configs" / "Datasets").mkdir(parents=True)
    with open(root / "Configs" / "Datasets" / "Flickr8K.data", "w") as f:
        f.write("image_root=/images/\n"
                "train_caption_path=/modified_annotations/captions_train.json\n"
                "val_caption_path=/modified_annotations/captions_val.json\n"
                "test_caption_path=/modified_annotations/captions_test.json\n"
                "data_dir=/Data/\n"
                "caption_vocab_path=/Data/caption_vocab.pkl\n")
    (root / "Configs" / "Models").mkdir()
    with open(root / "Configs" / "Models" / "BUTDDetection.json", "w") as f:
        json.dump({"model_type": "BUTDDetection", "embed_dim": 16,
                   "hidden_dim": 16, "atten_dim": 12, "optimizer": "Adam",
                   "lr": 4e-3}, f)


def test_cli_train_eval_sample(tmp_path, monkeypatch):
    _write_dataset(tmp_path)
    monkeypatch.chdir(tmp_path)
    base = ["--dataset", "Flickr8K", "--model_type", "BUTDDetection",
            "--use_bu", "fixed", "--train_batch_size", "8",
            "--eval_batch_size", "8", "--scst_train_batch_size", "8",
            "--tqdm_visible", "False"]
    # enc_dim must match the synthetic features: patch the model json dim
    import simpleimagecaptionzoo_tpu.main as M
    orig = M.load_model_config
    monkeypatch.setattr(M, "load_model_config",
                        lambda *a, **k: orig(*a, **dict(k, enc_dim=8,
                                                        max_bu_len=5)))
    rc = cli_main(build_argparser().parse_args(
        base + ["--operation", "train", "--num_epochs", "1"]))
    assert rc == 0
    assert os.path.exists("CheckPoints/Model_BUTDDetection_Dataset_Flickr8K/"
                          "cp/Captioner_cp.msgpack")
    rc = cli_main(build_argparser().parse_args(
        base + ["--operation", "eval", "--eval_split", "test",
                "--eval_beam_size", "2"]))
    assert rc == 0
    rc = cli_main(build_argparser().parse_args(
        base + ["--operation", "sample", "--img_filename", "img_0.jpg",
                "--eval_beam_size", "-1"]))
    assert rc == 0
    # resume path: epoch counter picks up from history
    rc = cli_main(build_argparser().parse_args(
        base + ["--operation", "train", "--num_epochs", "2",
                "--start_from", "checkpoint"]))
    assert rc == 0
    with open("CheckPoints/Model_BUTDDetection_Dataset_Flickr8K/"
              "cp/state_histories.json") as f:
        assert len(json.load(f)["cider_his"]) == 2


def test_img_size_threads_to_data_layer(tmp_path):
    """--img_size must actually reach the image loader (it used to be
    parsed and silently dropped, leaving 224 hardcoded)."""
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine
    from simpleimagecaptionzoo_tpu.vocab import build_vocab

    a = build_argparser().parse_args(["--img_size", "160"])
    assert a.img_size == 160
    vocab = build_vocab([["a", "dog"]], threshold=1)
    eng = get_engine(
        ModelConfig(model_type="NIC", vocab_size=len(vocab), embed_dim=8,
                    hidden_dim=8),
        DataConfig(dataset_name="Flickr8K", image_root=str(tmp_path),
                   data_dir=str(tmp_path)),
        vocab, train_config=TrainConfig(img_size=160))
    assert eng._visual_source().img_size == 160
