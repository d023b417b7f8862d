"""Batch captioning utility: caption every image in a directory with a
trained checkpoint.

Beyond the reference's single-image ``sample`` op — a throughput-oriented
inference surface: images stream through the threaded decode+resize
pipeline as uint8, decoding runs as batched on-device beam search (bf16 by
default), and results stream to a json file.

    python tools/caption_images.py --image_dir ./photos \
        --dataset COCO14 --model_type BUTDSpatial [--beam 3] [--out caps.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import DataConfig, load_model_config
from simpleimagecaptionzoo_tpu.data.datasets import load_image_uint8
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.vocab import load_vocab

EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--dataset", default="COCO14")
    ap.add_argument("--model_type", default="BUTDSpatial")
    ap.add_argument("--dataset_config_root", default="./Configs/Datasets/")
    ap.add_argument("--model_config_root", default="./Configs/Models/")
    ap.add_argument("--checkpoint_root", default="./CheckPoints")
    ap.add_argument("--use_scst_model", action="store_true")
    ap.add_argument("--beam", type=int, default=3,
                    help="-1 for greedy")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="int8 = bf16 activations + weight-only int8 decode "
                         "hot set (ops/quant.py)")
    ap.add_argument("--out", default="captions.json")
    args = ap.parse_args()

    data_cfg = DataConfig.from_data_file(
        os.path.join(args.dataset_config_root, args.dataset + ".data"),
        base_dir=os.path.abspath(os.getcwd()), dataset_name=args.dataset)
    vocab = load_vocab(data_cfg.caption_vocab_path)
    model_cfg = load_model_config(
        os.path.join(args.model_config_root, args.model_type + ".json"),
        vocab_size=len(vocab))
    if model_cfg.uses_bu:
        raise SystemExit("Detection models need precomputed bottom-up "
                         "features; use a Spatial/NIC model for raw images.")
    model = get_captioner(model_cfg)
    ck = CheckpointManager(model_cfg.model_type, data_cfg.dataset_name,
                           root=args.checkpoint_root)
    template = {"params": model.init_params(jax.random.PRNGKey(0)),
                "model_state": model.init_model_state()}
    tree, _, _ = ck.load(template, scst=args.use_scst_model, best=True)
    if tree is None:
        raise SystemExit("no checkpoint found under " + ck.root_dir)

    dtype = None if args.dtype == "float32" else jnp.bfloat16
    if args.dtype == "int8":
        tree = dict(tree,
                    params=model.quantize_decode_params(tree["params"]))
    if args.beam == -1:
        dec = S.make_greedy_decode(model, 20, dtype=dtype)
    elif args.beam >= 1:
        dec = S.make_beam_decode(model, args.beam, 50, dtype=dtype)
    else:
        raise SystemExit(f"--beam must be -1 (greedy) or >= 1, "
                         f"got {args.beam}")

    names = sorted(f for f in os.listdir(args.image_dir)
                   if f.lower().endswith(EXTS))
    if not names:
        raise SystemExit("no images in " + args.image_dir)
    results = []
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=8)

    failed: list = []

    def load_one(n):
        # one corrupt file must not abort a 10k-image batch run: substitute
        # black pixels, record the name, and exclude it from the results
        try:
            return load_image_uint8(os.path.join(args.image_dir, n),
                                    args.img_size)
        except Exception as e:
            failed.append(n)
            print(f"WARNING: skipping unreadable image {n!r}: {e}",
                  file=sys.stderr)
            return np.zeros((args.img_size, args.img_size, 3), np.uint8)

    def load_chunk(i):
        chunk = names[i:i + args.batch]
        real = len(chunk)
        while len(chunk) < args.batch:        # static batch for one compile
            chunk.append(chunk[-1])
        imgs = list(pool.map(load_one, chunk))
        return chunk, real, np.stack(imgs)

    # double-buffer: chunk i+1 loads on the host while chunk i decodes
    starts = list(range(0, len(names), args.batch))
    pending = pool.submit(load_chunk, starts[0])
    for k, _ in enumerate(starts):
        chunk, real, imgs = pending.result()
        if k + 1 < len(starts):
            pending = pool.submit(load_chunk, starts[k + 1])
        ids = np.asarray(dec(tree["params"], tree["model_state"],
                             {"img_tensors": jnp.asarray(imgs)}))
        for name, row in zip(chunk[:real], ids[:real]):
            results.append({"file_name": name,
                            "caption": " ".join(vocab.decode_ids(row))})
    dt = time.perf_counter() - t0
    bad = set(failed)
    if bad:
        results = [r for r in results if r["file_name"] not in bad]
        print(f"WARNING: {len(bad)} unreadable image(s) skipped: "
              + ", ".join(sorted(bad)[:10])
              + (" ..." if len(bad) > 10 else ""), file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"captioned {len(results)} images in {dt:.1f}s "
          f"({len(results) / max(dt, 1e-9):.1f} images/sec) -> {args.out}")
    for r in results[:5]:
        print(" ", r["file_name"], "->", r["caption"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
