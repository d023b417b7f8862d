"""Generate a miniature COCO14-shaped dataset tree for the reproduce
script's dry run (VERDICT r4 #8).

Writes exactly the artifacts ``scripts/reproduce_coco14.sh``'s download
stage would leave behind — so every LATER stage (preprocess -> pack ->
train -> eval) can run its real commands against it, proving the script's
plumbing end-to-end without egress:

* ``<root>/train2014/COCO_train2014_%012d.jpg`` and
  ``<root>/val2014/COCO_val2014_%012d.jpg`` — real JPEGs (the data layer
  routes COCO14 filenames by the "train"/"val" substring,
  simpleimagecaptionzoo_tpu/data/datasets.py:40).
* ``<root>/dataset_coco.json`` — Karpathy-format splits json with the
  fields preprocess/datasets_json_modification.py consumes (``split``,
  ``cocoid``, ``filename``, ``sentids``, ``sentences[{raw, tokens}]``;
  reference PreProcess/Datasets_json_modification.py semantics).
* with ``--bu``: ``<root>/trainval_36/fixture.tsv`` — Peter-Anderson-style
  base64 TSV rows (image_id, image_w, image_h, num_boxes, boxes, features)
  as parsed by preprocess/generate_bottom_up_features.py.

Captions draw from a small closed vocabulary with every word appearing
well above build_caption_vocab's threshold=5 so the vocab stage produces
a usable vocabulary.

    python tools/make_coco14_fixture.py --dataset_root /tmp/ds [--bu]
"""
from __future__ import annotations

import argparse
import base64
import json
import os
import sys

import numpy as np

WORDS = ["a", "dog", "cat", "man", "woman", "rides", "holds", "sits",
         "on", "near", "the", "red", "small", "table", "horse", "street"]


def _captions(rng, n: int):
    sents = []
    for _ in range(n):
        toks = ["a"] + [WORDS[int(j)] for j in
                        rng.integers(1, len(WORDS), int(rng.integers(4, 9)))]
        sents.append(toks)
    return sents


def write_images_and_json(root: str, n_train: int, n_val: int, n_test: int,
                          img_size: int, rng) -> list:
    from PIL import Image
    images = []
    sid = 0
    specs = ([("train", "train2014")] * n_train
             + [("val", "val2014")] * n_val
             + [("test", "val2014")] * n_test)
    for cocoid, (split, sub) in enumerate(specs, start=1):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        fname = f"COCO_{sub}_{cocoid:012d}.jpg"
        arr = rng.integers(0, 256, size=(img_size, img_size, 3),
                           dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(os.path.join(root, sub, fname))
        sentences, sentids = [], []
        for toks in _captions(rng, 5):
            sentences.append({"raw": " ".join(toks), "tokens": toks})
            sentids.append(sid)
            sid += 1
        images.append({"split": split, "filepath": sub, "filename": fname,
                       "cocoid": cocoid, "sentids": sentids,
                       "sentences": sentences})
    with open(os.path.join(root, "dataset_coco.json"), "w") as f:
        json.dump({"dataset": "coco", "images": images}, f)
    return images


def write_bu_tsv(root: str, images: list, n_boxes: int, feat_dim: int,
                 rng) -> str:
    tsv_dir = os.path.join(root, "trainval_36")
    os.makedirs(tsv_dir, exist_ok=True)
    path = os.path.join(tsv_dir, "fixture.tsv")
    with open(path, "w") as f:
        for img in images:
            boxes = rng.random((n_boxes, 4)).astype(np.float32)
            feats = rng.random((n_boxes, feat_dim)).astype(np.float32)
            f.write("\t".join([
                str(img["cocoid"]), "640", "480", str(n_boxes),
                base64.b64encode(boxes.tobytes()).decode(),
                base64.b64encode(feats.tobytes()).decode()]) + "\n")
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True,
                    help="the DS dir, e.g. <run_root>/Datasets/MSCOCO/2014")
    ap.add_argument("--n_train", type=int, default=8)
    ap.add_argument("--n_val", type=int, default=4)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--bu", action="store_true",
                    help="also write the trainval_36 bottom-up TSV")
    ap.add_argument("--n_boxes", type=int, default=36)
    ap.add_argument("--feat_dim", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.dataset_root, exist_ok=True)
    images = write_images_and_json(args.dataset_root, args.n_train,
                                   args.n_val, args.n_test, args.img_size,
                                   rng)
    if args.bu:
        write_bu_tsv(args.dataset_root, images, args.n_boxes,
                     args.feat_dim, rng)
    print(f"fixture: {len(images)} images under {args.dataset_root}"
          + (" (+ bottom-up TSV)" if args.bu else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
