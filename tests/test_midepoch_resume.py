"""Mid-epoch checkpoint/resume (crash tolerance beyond the reference).

The reference loses the in-flight epoch on a crash (SURVEY.md §5).  With
``midepoch_save_steps > 0`` the engine saves params + optimizer state + the
exact resume point every N steps; an interrupted run resumed with
``start_from='checkpoint'`` must finish BIT-IDENTICAL to an uninterrupted
one — same batch stream (per-epoch derived rng + skip), same step rng keys
(engine key restored), same optimizer momenta (persisted, unlike the
reference's epoch checkpoints which never need them).
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORDS = ["a", "man", "dog", "rides", "surfboard", "on", "the", "beach"]


@pytest.fixture(scope="module")
def tiny_bu_dataset(tmp_path_factory):
    """Annotations + fixed bottom-up features only (Detection models never
    touch image files during train/eval)."""
    root = tmp_path_factory.mktemp("midepoch_tiny")
    rng = np.random.default_rng(0)
    images = []
    for i in range(20):
        sents = []
        for s in range(4):
            n = int(rng.integers(3, 6))
            toks = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), n)]
            sents.append({"raw": " ".join(toks), "tokens": toks})
        split = "train" if i < 16 else "val"
        images.append({"filename": f"img_{i}.jpg", "imgid": i,
                       "split": split,
                       "sentids": [i * 4 + s for s in range(4)],
                       "sentences": sents})
    ks_path = root / "dataset_tiny.json"
    with open(ks_path, "w") as f:
        json.dump({"images": images, "dataset": "tiny"}, f)
    (root / "fixed_bu_feat").mkdir()
    for i in range(20):
        np.savez(root / "fixed_bu_feat" / f"{i}.npz",
                 feat=rng.normal(size=(4, 12)).astype(np.float32))

    from preprocess.datasets_json_modification import convert_karpathy
    from preprocess.build_caption_vocab import build_from_annotations
    from preprocess.cider_idf_preprocess import build as build_idf
    convert_karpathy(str(ks_path), "Flickr8K", tokenizer="karpathy",
                     output_dir=str(root))
    ann_dir = root / "modified_annotations"
    build_from_annotations(str(ann_dir / "captions_train.json"),
                           str(root / "caption_vocab.pkl"), threshold=1)
    build_idf(str(ann_dir / "captions_train.json"), "Flickr8K",
              str(root / "cider"),
              vocab_path=str(root / "caption_vocab.pkl"))
    return root


def _make_engine(root, ckpt_root, midepoch_steps):
    from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                                  TrainConfig, LrOpts, SsOpts)
    from simpleimagecaptionzoo_tpu.engine.model_engines import get_engine
    from simpleimagecaptionzoo_tpu.vocab import load_vocab
    ann_dir = root / "modified_annotations"
    vocab = load_vocab(str(root / "caption_vocab.pkl"))
    data_cfg = DataConfig(
        dataset_name="Flickr8K", image_root="",
        train_caption_path=str(ann_dir / "captions_train.json"),
        val_caption_path=str(ann_dir / "captions_val.json"),
        test_caption_path=str(ann_dir / "captions_test.json"),
        data_dir=str(root),
        caption_vocab_path=str(root / "caption_vocab.pkl"))
    model_cfg = ModelConfig(model_type="BUTDDetection",
                            vocab_size=len(vocab), embed_dim=12,
                            hidden_dim=12, atten_dim=8, enc_dim=12,
                            max_bu_len=4)
    train_cfg = TrainConfig(
        num_epochs=2, train_batch_size=8, eval_batch_size=8,
        max_caption_len=8, decode_max_len=5, beam_max_steps=6,
        scst_train_batch_size=8, scst_num_refs=4, scst_max_ref_len=8,
        midepoch_save_steps=midepoch_steps,
        lr_opts=LrOpts(), ss_opts=SsOpts(ss_start_epoch=1, ss_inc_every=1,
                                         ss_inc_prob=0.2))
    return get_engine(model_cfg, data_cfg, vocab, train_config=train_cfg,
                      use_bu="fixed", checkpoint_root=str(ckpt_root),
                      verbose=False), vocab


def _leaves(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_batcher_skip_matches_tail(tiny_bu_dataset):
    root = tiny_bu_dataset
    eng, _ = _make_engine(root, root / "cp_batcher", 0)
    from simpleimagecaptionzoo_tpu.data.datasets import CaptionTrainBatches
    from simpleimagecaptionzoo_tpu.data.caption_data import CaptionData
    capdata = CaptionData(annotation_file=str(
        root / "modified_annotations" / "captions_train.json"))
    b = CaptionTrainBatches(capdata, eng.vocab, eng._visual_source(),
                            batch_size=8, max_caption_len=8, seed=0)
    full = list(b.epoch(epoch_index=3))
    tail = list(b.epoch(epoch_index=3, skip_batches=2))
    assert len(tail) == len(full) - 2
    for a, c in zip(full[2:], tail):
        np.testing.assert_array_equal(a["captions"], c["captions"])
        np.testing.assert_array_equal(a["visual"]["bu_feats"],
                                      c["visual"]["bu_feats"])
    # different epochs shuffle differently
    other = list(b.epoch(epoch_index=4))
    assert any((x["captions"] != y["captions"]).any()
               for x, y in zip(full, other))


def test_interrupted_xe_resume_is_bit_identical(tiny_bu_dataset, tmp_path,
                                                monkeypatch):
    root = tiny_bu_dataset
    os.chdir(tmp_path)
    # 16 imgs x 4 anns = 64 anns, batch 8 -> 8 steps/epoch; save every 2
    # reference run: 2 epochs uninterrupted
    eng_ref, _ = _make_engine(root, tmp_path / "cp_ref", 2)
    scores_ref = eng_ref.training(num_epochs=2)
    ref_params = _leaves(eng_ref.tree["params"])

    # interrupted run: crash during epoch 2 after its 2nd step (call 11)
    import simpleimagecaptionzoo_tpu.engine.steps as S
    orig = S.make_xe_train_step
    calls = {"n": 0}

    def make_wrapped(*a, **k):
        fn = orig(*a, **k)

        def wrapped(*sa, **sk):
            calls["n"] += 1
            if calls["n"] > 10:
                raise KeyboardInterrupt("simulated crash")
            return fn(*sa, **sk)
        return wrapped

    monkeypatch.setattr(S, "make_xe_train_step", make_wrapped)
    eng_a, _ = _make_engine(root, tmp_path / "cp_int", 2)
    with pytest.raises(KeyboardInterrupt):
        eng_a.training(num_epochs=2)
    monkeypatch.setattr(S, "make_xe_train_step", orig)
    tag = "Model_BUTDDetection_Dataset_Flickr8K"
    mid = tmp_path / "cp_int" / tag / "cp" / "midepoch_state.json"
    assert mid.exists()
    with open(mid) as f:
        meta = json.load(f)
    assert meta["epoch"] == 2 and meta["steps_done"] == 2

    # resume in a FRESH engine (new process semantics)
    eng_b, _ = _make_engine(root, tmp_path / "cp_int", 2)
    scores_b = eng_b.training(start_from="checkpoint", num_epochs=2)
    assert not mid.exists()               # cleared once the epoch is durable

    # epoch-2 val cider and final params match the uninterrupted run exactly
    assert scores_b[-1] == pytest.approx(scores_ref[-1], abs=0)
    for a, b in zip(_leaves(eng_b.tree["params"]), ref_params):
        np.testing.assert_array_equal(a, b)


def test_resume_discarded_on_config_mismatch(tiny_bu_dataset, tmp_path):
    """A resume point saved under a different batch size / seed / epoch
    length / native-loader availability must be discarded (warn + fall back
    to the epoch boundary), not silently applied — the saved rng and
    skip_batches only reproduce the interrupted batch stream under the
    exact same run config (ADVICE r2)."""
    root = tiny_bu_dataset
    eng, _ = _make_engine(root, tmp_path / "cp_mismatch", 2)
    from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
    tx = make_grad_transform("Adam", 0.1)
    tree = {"params": eng.tree["params"],
            "model_state": eng.tree["model_state"],
            "opt_state": tx.init(eng.tree["params"])}
    meta = {"epoch": 1, "steps_done": 2,
            "rng": np.asarray(eng._rng).tolist(),
            **eng._midepoch_env(False, n_batches=8)}

    eng.ckpt.save_midepoch(tree, meta, scst=False)
    opt, skip = eng._try_resume_midepoch(tx, 1, scst=False, n_batches=8)
    assert opt is not None and skip == 2      # matching config: accepted

    for bad in ({"batch_size": 999}, {"seed": 7}, {"n_batches": 5},
                {"native_loader": not meta["native_loader"]}):
        eng.ckpt.save_midepoch(tree, dict(meta, **bad), scst=False)
        opt, skip = eng._try_resume_midepoch(tx, 1, scst=False, n_batches=8)
        assert opt is None and skip == 0, bad

    # pre-r3 meta without the config fields is still accepted (back compat)
    legacy = {k: meta[k] for k in ("epoch", "steps_done", "rng")}
    eng.ckpt.save_midepoch(tree, legacy, scst=False)
    opt, skip = eng._try_resume_midepoch(tx, 1, scst=False, n_batches=8)
    assert opt is not None and skip == 2


def test_scst_midepoch_resume_completes(tiny_bu_dataset, tmp_path,
                                        monkeypatch):
    root = tiny_bu_dataset
    os.chdir(tmp_path)
    idf = str(root / "cider" / "cider_idf_table.npz")
    # seed an XE best checkpoint for SCST to start from
    eng0, _ = _make_engine(root, tmp_path / "cp_scst", 2)
    eng0.training(num_epochs=1)

    import simpleimagecaptionzoo_tpu.engine.steps as S
    orig = S.make_scst_train_step
    calls = {"n": 0}

    def make_wrapped(*a, **k):
        fn = orig(*a, **k)

        def wrapped(*sa, **sk):
            calls["n"] += 1
            if calls["n"] > 3:        # 16 imgs / batch 8 = 2 steps/epoch
                raise KeyboardInterrupt("simulated crash")
            return fn(*sa, **sk)
        return wrapped

    monkeypatch.setattr(S, "make_scst_train_step", make_wrapped)
    eng1, _ = _make_engine(root, tmp_path / "cp_scst", 1)
    with pytest.raises(KeyboardInterrupt):
        eng1.scst_training(num_epochs=2, idf_cache=idf)
    monkeypatch.setattr(S, "make_scst_train_step", orig)
    tag = "Model_BUTDDetection_Dataset_Flickr8K"
    assert (tmp_path / "cp_scst" / tag / "cp"
            / "midepoch_scst_state.json").exists()

    eng2, _ = _make_engine(root, tmp_path / "cp_scst", 1)
    scores = eng2.scst_training(start_from="checkpoint", num_epochs=2,
                                idf_cache=idf)
    assert len(scores) >= 1
    with open(tmp_path / "cp_scst" / tag / "cp"
              / "scst_state_histories.json") as f:
        assert len(json.load(f)["cider_his"]) == 2
