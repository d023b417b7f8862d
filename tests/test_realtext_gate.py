"""The natural-language gate tier's data path (VERDICT r4 next #5).

The committed hand-written corpus must stay a valid gate input: unique
natural sentences, compact compositional vocabulary, every held-out
scene's keywords covered by training scenes, and the generated dataset
must flow through the real preprocessing toolchain (Karpathy conversion,
vocab build) unchanged.  The full on-chip XE->SCST->beam gate run is
recorded as QUALITY_r05_realtext.json; this test keeps its input
contracts from rotting.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.train_synthetic import (REALTEXT_CORPUS, generate_bu_features,
                                      generate_dataset_realtext,
                                      reset_root_state)

import numpy as np


def _corpus():
    with open(REALTEXT_CORPUS) as f:
        return json.load(f)["scenes"]


def test_corpus_shape_and_vocabulary():
    scenes = _corpus()
    caps = [c for s in scenes for c in s["captions"]]
    assert len(scenes) >= 60 and all(len(s["captions"]) == 5
                                     for s in scenes)
    assert len(set(caps)) == len(caps), "captions must be unique sentences"
    vocab = {w for c in caps for w in c.split()}
    assert 250 <= len(vocab) <= 800, "compact few-hundred-word vocabulary"
    assert max(len(c.split()) for c in caps) <= 16
    # natural-language markers templates lack: articles + varied syntax
    assert sum(c.split()[0] in ("a", "an", "the") for c in caps) > len(
        caps) / 2
    # every scene keyword appears somewhere in that scene's captions
    # (the bu features must be predictive of the text)
    for s in scenes:
        text = " ".join(s["captions"])
        for k in s["keywords"]:
            assert k[:4] in text, (k, s["captions"][0])


def test_heldout_scenes_are_compositional():
    """Every val/test scene keyword must be trained somewhere, or the gate
    measures vocabulary luck instead of generalization."""
    scenes = _corpus()
    split = lambda i: {8: "val", 9: "test"}.get(i % 10, "train")
    train_kw = {k for i, s in enumerate(scenes) if split(i) == "train"
                for k in s["keywords"]}
    for i, s in enumerate(scenes):
        if split(i) != "train":
            missing = set(s["keywords"]) - train_kw
            assert not missing, (i, missing)


def test_realtext_generation_flows_through_preprocess(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Data"))
    n = generate_dataset_realtext(root)
    assert n == len(_corpus())
    generate_bu_features(root, os.path.join(root, "Data"))
    feats = np.load(os.path.join(root, "Data",
                                 "fixed_bu_feats_packed.npy"), mmap_mode="r")
    assert feats.shape[0] == n and not np.isnan(feats[:2]).any()

    from preprocess.datasets_json_modification import convert_karpathy
    from preprocess.build_caption_vocab import build_from_annotations
    convert_karpathy(os.path.join(root, "dataset_synth.json"), "Flickr8K",
                     tokenizer="karpathy", output_dir=root)
    ann = os.path.join(root, "modified_annotations", "captions_train.json")
    vocab_path = os.path.join(root, "caption_vocab.pkl")
    build_from_annotations(ann, vocab_path, threshold=1)
    import pickle
    with open(vocab_path, "rb") as f:
        vocab = pickle.load(f)
    assert 150 <= len(vocab) <= 800

    # a realtext root is invalidated when rerun without --realtext
    assert reset_root_state(root, n, "BUTDDetection", skip_xe=False,
                            realtext=True) is False
    assert reset_root_state(root, n, "BUTDDetection", skip_xe=False,
                            realtext=False) is True
