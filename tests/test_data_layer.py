"""Host data-layer tests: image path routing, fixed-shape batch assembly,
final-batch padding/weights, SCST reference encoding, prefetcher.
(reference behaviors: Datasets.py:11-22 routing, collates :153-176)."""
import json

import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.data.caption_data import CaptionData
from simpleimagecaptionzoo_tpu.data.datasets import (CaptionEvalBatches,
                                                     CaptionTrainBatches,
                                                     CaptionTrainSCSTBatches,
                                                     SuppFeatureLoader,
                                                     _VisualSource,
                                                     image_path)
from simpleimagecaptionzoo_tpu.data.loader import Prefetcher
from simpleimagecaptionzoo_tpu.ops.cider import RewardVocab
from simpleimagecaptionzoo_tpu.vocab import build_vocab


def test_image_path_routing():
    assert image_path("/r", "x.jpg", "Flickr8K") == "/r/x.jpg"
    assert image_path("/r", "COCO_train2014_0001.jpg",
                      "COCO14").endswith("train2014/COCO_train2014_0001.jpg")
    assert image_path("/r", "COCO_val2014_0001.jpg",
                      "COCO14").endswith("val2014/COCO_val2014_0001.jpg")
    assert image_path("/r", "0001.jpg", "COCO17",
                      split="val").endswith("val2017/0001.jpg")
    with pytest.raises(ValueError):
        image_path("/r", "x.jpg", "Unknown")


WORDS = ["a", "dog", "man", "runs", "on", "beach"]


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(10):
        sents = []
        sentids = []
        for s in range(5):
            toks = [WORDS[int(j)]
                    for j in rng.integers(0, len(WORDS), rng.integers(3, 6))]
            sid = i * 5 + s
            annotations.append({"image_id": i, "id": sid,
                                "caption": " ".join(toks), "tokens": toks,
                                "file_name": f"img_{i}.jpg"})
            sents.append({"tokens": toks, "raw": " ".join(toks)})
            sentids.append(sid)
        images.append({"id": i, "file_name": f"img_{i}.jpg",
                       "sentids": sentids, "sentences": sents})
        np.savez(tmp_path / f"{i}.npz",
                 feat=rng.normal(size=(rng.integers(3, 7), 8)
                                 ).astype(np.float32))
    (tmp_path / "fixed_bu_feat").mkdir()
    for i in range(10):
        (tmp_path / f"{i}.npz").rename(tmp_path / "fixed_bu_feat" / f"{i}.npz")
    path = tmp_path / "ann.json"
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    capdata = CaptionData(annotation_file=str(path))
    vocab = build_vocab([WORDS], threshold=1)
    return capdata, vocab, tmp_path


def _vs(tmp_path, max_bu=8):
    supp = SuppFeatureLoader(str(tmp_path), "fixed", max_bu)
    return _VisualSource("Flickr8K", str(tmp_path), False, supp)


def test_train_batches_static_shapes(dataset):
    capdata, vocab, tmp = dataset
    b = CaptionTrainBatches(capdata, vocab, _vs(tmp), batch_size=16,
                            max_caption_len=9)
    batches = list(b.epoch())
    assert len(batches) == len(b) == (50 + 15) // 16
    for batch in batches:
        assert batch["captions"].shape == (16, 9)
        assert batch["visual"]["bu_feats"].shape == (16, 8, 8)
        assert batch["visual"]["bu_masks"].shape == (16, 8)
        assert batch["captions"].dtype == np.int32
        # <sta> first, masks match stored lengths
        assert (batch["captions"][:, 0] == 1).all()
    # final batch padded with weight-0 samples
    last = batches[-1]
    n_real = int(last["sample_weight"].sum())
    assert n_real == 50 - 16 * 3
    # all epochs cover every annotation exactly once among weight-1 rows
    total = sum(int(x["sample_weight"].sum()) for x in batches)
    assert total == 50


def test_caption_truncation(dataset):
    capdata, vocab, tmp = dataset
    b = CaptionTrainBatches(capdata, vocab, _vs(tmp), batch_size=8,
                            max_caption_len=5)
    batch = next(b.epoch())
    assert batch["captions"].shape[1] == 5
    assert (batch["lengths"] <= 5).all()
    # truncated captions keep <end> as their final token
    for row, l in zip(batch["captions"], batch["lengths"]):
        assert row[l - 1] == 2


def test_scst_batches(dataset):
    capdata, vocab, tmp = dataset
    rv = RewardVocab(vocab)
    b = CaptionTrainSCSTBatches(capdata, rv, _vs(tmp), batch_size=4,
                                num_refs=5, max_ref_len=8)
    batch = next(b.epoch())
    assert batch["ref_ids"].shape == (4, 5, 8)
    assert batch["ref_lens"].shape == (4, 5)
    assert (batch["ref_lens"] > 0).all()  # every image has 5 refs here
    # ids are encodable back: all < len(reward vocab extension)
    assert batch["ref_ids"].max() < len(vocab) + 100


def test_eval_batches_and_prefetcher(dataset):
    capdata, vocab, tmp = dataset
    b = CaptionEvalBatches(capdata, _vs(tmp), batch_size=4, split="val")
    seen = []
    for batch in Prefetcher(b.epoch).epoch():
        assert batch["visual"]["bu_feats"].shape[0] == 4
        seen.extend(batch["img_ids"][:batch["n_real"]])
    assert seen == list(capdata.imgs.keys())


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")
    p = Prefetcher(lambda: gen())
    with pytest.raises(RuntimeError, match="boom"):
        list(p.epoch())


def test_supp_loader_pads_and_masks(dataset):
    _, _, tmp = dataset
    supp = SuppFeatureLoader(str(tmp), "fixed", 8)
    out = supp.load(0)
    assert out["bu_feats"].shape == (8, 8)
    n = int(out["bu_masks"].sum())
    assert (out["bu_feats"][n:] == 0).all()


def test_packed_shard_fast_path(dataset, tmp_path):
    """Packed memmap shard produces identical batches to per-image npz."""
    _, _, tmp = dataset
    from preprocess.generate_bottom_up_features import pack
    supp_slow = SuppFeatureLoader(str(tmp), "fixed", 8)
    ref = {i: supp_slow.load(i) for i in range(10)}
    pack(str(tmp), "fixed", max_len=8)
    supp_fast = SuppFeatureLoader(str(tmp), "fixed", 8)
    assert supp_fast._packed is not None
    for i in range(10):
        fast = supp_fast.load(i)
        np.testing.assert_array_equal(fast["bu_feats"], ref[i]["bu_feats"])
        np.testing.assert_array_equal(fast["bu_masks"], ref[i]["bu_masks"])


def test_coco17_conversion(tmp_path):
    """Raw COCO17 captions json -> modified annotations (reference
    generate_modified_json_coco17 schema)."""
    import json as _json
    from preprocess.datasets_json_modification import convert_coco17
    for split in ("train", "val"):
        raw = {"images": [{"id": 10 + i, "file_name": f"{10+i:012d}.jpg"}
                          for i in range(3)],
               "annotations": [{"id": 100 + i, "image_id": 10 + (i % 3),
                                "caption": f"A dog number {i} runs."}
                               for i in range(6)]}
        with open(tmp_path / f"captions_{split}2017.json", "w") as f:
            _json.dump(raw, f)
    out = convert_coco17(str(tmp_path), tokenizer="ptb",
                         output_dir=str(tmp_path))
    assert set(out) == {"train", "val"}
    with open(tmp_path / "modified_annotations" / "captions_train.json") as f:
        data = _json.load(f)
    assert len(data["images"]) == 3 and len(data["annotations"]) == 6
    ann = data["annotations"][0]
    assert ann["tokens"][0] == "a" and "file_name" in ann
    img = data["images"][0]
    assert len(img["sentids"]) == len(img["sentences"]) == 2
    # loads through the CaptionData index
    cd = CaptionData(dataset=data)
    assert len(cd.imgToAnns[10]) == 2


def test_prefetcher_abandoned_consumer_releases_producer():
    """Breaking out of an epoch early must unblock and reap the producer
    thread (a jitted-step exception mid-epoch must not leak threads)."""
    import threading
    before = threading.active_count()

    def gen():
        for i in range(100):
            yield i

    p = Prefetcher(lambda: gen(), depth=2)
    it = p.epoch()
    assert next(it) == 0
    it.close()   # abandon mid-epoch
    # producer must exit promptly (join inside close); no thread leak
    assert threading.active_count() <= before + 1


def test_process_sharded_batchers_partition_epoch_exactly(dataset):
    """Multi-host feeding seam: P process-sharded batchers with the same
    seed must jointly reproduce each global batch row-for-row (process p
    owns rows [p*B/P, (p+1)*B/P)) and cover the epoch exactly once across
    weight-1 rows."""
    capdata, vocab, tmp = dataset
    kw = dict(batch_size=8, max_caption_len=9, seed=3)
    globs = list(CaptionTrainBatches(capdata, vocab, _vs(tmp), **kw).epoch())
    shards = [list(CaptionTrainBatches(capdata, vocab, _vs(tmp), **kw,
                                       process_index=p,
                                       process_count=2).epoch())
              for p in (0, 1)]
    assert len(shards[0]) == len(shards[1]) == len(globs)
    total_real = 0
    for g, s0, s1 in zip(globs, shards[0], shards[1]):
        for key in ("captions", "lengths", "sample_weight"):
            np.testing.assert_array_equal(
                g[key], np.concatenate([s0[key], s1[key]]))
        np.testing.assert_array_equal(
            g["visual"]["bu_feats"],
            np.concatenate([s0["visual"]["bu_feats"],
                            s1["visual"]["bu_feats"]]))
        total_real += int(s0["sample_weight"].sum()
                          + s1["sample_weight"].sum())
    assert total_real == len(capdata.anns)   # epoch covered exactly once

    # SCST batcher: same partition property
    rv = RewardVocab(vocab)
    kw = dict(batch_size=4, num_refs=5, max_ref_len=8, seed=5)
    g_all = list(CaptionTrainSCSTBatches(capdata, rv, _vs(tmp), **kw).epoch())
    s_all = [list(CaptionTrainSCSTBatches(capdata, rv, _vs(tmp), **kw,
                                          process_index=p,
                                          process_count=2).epoch())
             for p in (0, 1)]
    for g, s0, s1 in zip(g_all, s_all[0], s_all[1]):
        np.testing.assert_array_equal(
            g["ref_ids"], np.concatenate([s0["ref_ids"], s1["ref_ids"]]))

    # eval batcher: img id partition + local real-row accounting
    ge = list(CaptionEvalBatches(capdata, _vs(tmp), 4, "val").epoch())
    se = [list(CaptionEvalBatches(capdata, _vs(tmp), 4, "val",
                                  process_index=p, process_count=2).epoch())
          for p in (0, 1)]
    for g, s0, s1 in zip(ge, se[0], se[1]):
        assert g["img_ids"] == s0["img_ids"] + s1["img_ids"]
        assert g["n_real"] == s0["n_real"] + s1["n_real"]


def test_packed_image_shard_fast_path(tmp_path):
    """pack_images.py shard must feed _VisualSource pixels bit-identical
    to the decode path (incl. flip), and absent shards must be a no-op."""
    from PIL import Image
    from simpleimagecaptionzoo_tpu.data.datasets import (_VisualSource,
                                                         load_image_uint8)
    from preprocess.pack_images import pack

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    entries = []
    for i in range(6):
        arr = rng.integers(0, 255, (96, 128, 3), np.uint8)
        name = f"p_{i}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=92)
        entries.append({"file_name": name, "id": i})
    with open(tmp_path / "ann.json", "w") as f:
        json.dump({"images": entries}, f)

    shard = pack([str(tmp_path / "ann.json")], str(img_dir), "Flickr8K",
                 str(tmp_path / "Data"), size=64, workers=2)
    assert shard.endswith("images_64_packed.npy")

    plain = _VisualSource("Flickr8K", str(img_dir), True, None, img_size=64)
    packed = _VisualSource("Flickr8K", str(img_dir), True, None,
                           img_size=64, packed_dir=str(tmp_path / "Data"))
    assert plain._packed_imgs is None and packed._packed_imgs is not None
    for e, flip in zip(entries, [False, True] * 3):
        a = plain.item(e, "train", flip)["img_tensors"]
        b = packed.item(e, "train", flip)["img_tensors"]
        np.testing.assert_array_equal(a, b)
    # unknown file name falls back to decode
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
        img_dir / "extra.jpg")
    out = packed.item({"file_name": "extra.jpg", "id": 99}, "train", False)
    np.testing.assert_array_equal(
        out["img_tensors"],
        load_image_uint8(str(img_dir / "extra.jpg"), 64))

    # identity guard: a shard packed from a different dataset or image_root
    # (overlapping file names) must be refused with a warning, not silently
    # substitute wrong pixels
    import warnings as _warnings
    other_root = tmp_path / "other_images"
    other_root.mkdir()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        foreign = _VisualSource("COCO14", str(other_root), True, None,
                                img_size=64,
                                packed_dir=str(tmp_path / "Data"))
    assert foreign._packed_imgs is None
    assert any("packed from different data" in str(x.message) for x in w)


def test_packed_shard_too_narrow_refused(dataset, tmp_path):
    """A shard packed with fewer boxes/image than the run's max_bu_len must
    be ignored (pack() records CLIPPED lengths, so the truncation would be
    silent) — the loader falls back to the per-image npz path."""
    import warnings

    from preprocess.generate_bottom_up_features import pack
    _, _, tmp = dataset
    ref = SuppFeatureLoader(str(tmp), "fixed", 8)
    expect = {i: ref.load(i) for i in range(10)}
    pack(str(tmp), "fixed", max_len=4)          # narrower than max_bu_len=8
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        narrow = SuppFeatureLoader(str(tmp), "fixed", 8)
    assert narrow._packed is None
    assert any("max_bu_len" in str(x.message) for x in w)
    for i in range(10):
        np.testing.assert_array_equal(narrow.load(i)["bu_feats"],
                                      expect[i]["bu_feats"])
    # a wide-enough shard still engages
    pack(str(tmp), "fixed", max_len=8)
    assert SuppFeatureLoader(str(tmp), "fixed", 8)._packed is not None
