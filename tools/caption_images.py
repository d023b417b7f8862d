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

import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.data.datasets import load_image_uint8
from simpleimagecaptionzoo_tpu.inference import load_inference_bundle

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

    bundle = load_inference_bundle(
        dataset=args.dataset, model_type=args.model_type,
        dataset_config_root=args.dataset_config_root,
        model_config_root=args.model_config_root,
        checkpoint_root=args.checkpoint_root,
        use_scst_model=args.use_scst_model, beam=args.beam,
        dtype=args.dtype)
    vocab, tree, dec = bundle.vocab, bundle.tree, bundle.decode

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
