"""Host image-ingest throughput: decode paths vs the packed uint8 shard.

The from-pixels trainer consumes ~889 imgs/sec/chip at batch 64
(docs/BENCHMARKS.md); this measures what the host can FEED on each path —
per-image JPEG decode (PIL / native C++) and the pack_images.py memmap
shard — and reports the host-bound crossover.

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--demand", type=float, default=889.0,
                    help="TPU-side imgs/sec demand to compare against")
    args = ap.parse_args()

    from PIL import Image
    from simpleimagecaptionzoo_tpu.data import _native_image
    from simpleimagecaptionzoo_tpu.data.datasets import (_VisualSource,
                                                         load_image_uint8)

    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        img_dir = os.path.join(root, "images")
        os.makedirs(img_dir)
        rng = np.random.default_rng(0)
        # realistic-ish source material: 640x480 photos with structure
        base = rng.integers(0, 255, (480, 640, 3), np.uint8)
        names = []
        for i in range(args.n):
            arr = np.roll(base, i * 7, axis=1)
            name = f"img_{i:05d}.jpg"
            Image.fromarray(arr).save(os.path.join(img_dir, name),
                                      quality=90)
            names.append(name)
        entries = [{"file_name": n, "id": i} for i, n in enumerate(names)]

        def timed(tag, fn):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            rate = args.n / dt
            verdict = ("TPU-bound" if rate >= args.demand else
                       f"HOST-BOUND ({rate / args.demand:.2f}x of demand)")
            print(f"{tag:<42s} {rate:8.0f} imgs/sec   {verdict}")
            return rate

        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=args.workers)
        paths = [os.path.join(img_dir, n) for n in names]

        print(f"native loader available: {_native_image.available()}   "
              f"(demand: {args.demand:.0f} imgs/sec/chip)")
        timed(f"decode+resize, {args.workers} threads",
              lambda: list(pool.map(lambda p: load_image_uint8(p, 224),
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
        timed(f"packed shard,  {args.workers} threads",
              lambda: vs.items(entries, "train", [False] * len(entries)))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
