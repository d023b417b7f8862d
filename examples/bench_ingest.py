"""Host image-ingest throughput: the four live-decode paths vs the packed
uint8 shard, against the trainer's per-chip demand.

The from-pixels trainer consumes ~1,390 imgs/sec/chip at batch 64
(docs/BENCHMARKS.md, re-measured 2026-08-19); this measures what the host
can FEED on each path:

  parity   full-res decode + Pillow-parity resample (reference-exact pixels)
  fast     DCT-domain scaled decode + host resample from the smaller image
  device   scaled decode only; the TPU finishes resize+normalize
           (ops/image.resize_normalize, fused ahead of the ResNet stem)
  packed   preprocess/pack_images.py memmap shard (offline pre-pass)

Source material is photo-like (smooth content + gradients, ~50 KB at
q90 like a typical COCO jpeg) — pure noise JPEGs triple the entropy-decode
cost and made earlier measurements (195 imgs/sec parity) unrepresentative.

JPEG Huffman decoding is inherently serial per image, so single-core rates
are the honest unit here (this container has 1 core; a v5e host has ~28
cores per chip).  The report includes cores-needed-to-meet-demand per path.

    python examples/bench_ingest.py [--n 400] [--workers 8]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _photo(rng, h=480, w=640):
    img = rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.float32)
    for _ in range(3):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0) +
               np.roll(img, 1, 1) + np.roll(img, -1, 1) + img) / 5
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = img[..., 0] * 0.3 + (xx / w * 200)
    img[..., 1] = img[..., 1] * 0.3 + (yy / h * 200)
    img[..., 2] = img[..., 2] * 0.3 + ((xx // 80 + yy // 80) % 2) * 120
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--demand", type=float, default=1390.0,
                    help="TPU-side imgs/sec demand to compare against "
                         "(XE from-pixels batch 64, docs/BENCHMARKS.md)")
    args = ap.parse_args()

    from PIL import Image
    from simpleimagecaptionzoo_tpu.data import _native_image
    from simpleimagecaptionzoo_tpu.data.datasets import (_VisualSource,
                                                         load_image_fast,
                                                         load_image_scaled,
                                                         load_image_uint8)

    ncores = len(os.sched_getaffinity(0))
    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        img_dir = os.path.join(root, "images")
        os.makedirs(img_dir)
        rng = np.random.default_rng(0)
        base = _photo(rng)
        names = []
        for i in range(args.n):
            arr = np.roll(base, i * 7, axis=1)
            name = f"img_{i:05d}.jpg"
            Image.fromarray(arr).save(os.path.join(img_dir, name),
                                      quality=90)
            names.append(name)
        entries = [{"file_name": n, "id": i} for i, n in enumerate(names)]
        sz = os.path.getsize(os.path.join(img_dir, names[0])) / 1024
        print(f"native loader available: {_native_image.available()}   "
              f"source: 640x480 q90 (~{sz:.0f} KB)   "
              f"demand: {args.demand:.0f} imgs/sec/chip   "
              f"host cores here: {ncores}")

        def timed(tag, fn):
            fn()                                   # warm caches
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            rate = args.n / dt
            per_core = rate / ncores
            need = args.demand / per_core
            verdict = ("meets demand" if rate >= args.demand else
                       f"{need:.1f} cores to meet demand")
            print(f"{tag:<34s} {rate:8.0f} imgs/sec "
                  f"({per_core:6.0f}/core; {verdict})")
            return rate

        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=args.workers)
        paths = [os.path.join(img_dir, n) for n in names]

        timed("parity decode+resize",
              lambda: list(pool.map(lambda p: load_image_uint8(p, 224),
                                    paths)))
        timed("fast (scaled decode + host resize)",
              lambda: list(pool.map(lambda p: load_image_fast(p, 224),
                                    paths)))
        timed("device (scaled decode only)",
              lambda: list(pool.map(lambda p: load_image_scaled(p, 224),
                                    paths)))

        from preprocess.pack_images import pack
        t0 = time.perf_counter()
        with open(os.path.join(root, "ann.json"), "w") as f:
            import json
            json.dump({"images": entries}, f)
        pack([os.path.join(root, "ann.json")], img_dir, "Flickr8K", root,
             workers=args.workers)
        print(f"  (one-time pack cost: {time.perf_counter() - t0:.1f}s)")

        vs = _VisualSource("Flickr8K", img_dir, True, None,
                           packed_dir=root)
        assert vs._packed_imgs is not None
        timed("packed shard (offline pre-pass)",
              lambda: vs.items(entries, "train", [False] * len(entries)))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
