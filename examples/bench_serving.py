"""Serving-surface load benchmark: sustained requests/sec through
tools/caption_server.py's real HTTP + dynamic-batching path.

Builds the server in-process (same ``build_server`` the CLI uses), then
hammers it with ``--clients`` concurrent HTTP clients for ``--requests``
total uploads of pre-encoded JPEGs, and reports sustained req/sec, the
batcher's achieved mean batch fill, and request latency percentiles.

The interesting question this answers on-chip: how close does the
serving path (HTTP parse + PIL decode + batching window + future
round-trip) get to the offline decode ceiling (bench.py /
examples/bench_matrix.py) at a given concurrency — i.e. what the
deployment actually delivers, not just the kernel. On the 1-core CPU
host the host-side JPEG decode dominates; on a real deployment the
clients and the host pipeline have their own cores.

    python examples/bench_serving.py --model BUTDSpatial --beam 3 \
        --max_batch 64 [--clients 128] [--requests 1024]

Needs no dataset: generates a tiny synthetic checkpoint + vocab in a
temp dir (weights are irrelevant to throughput; shapes default to the
production config and can be shrunk with --dims for CPU smoke runs).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fixture(root: str, model_type: str, dims: int,
                 vocab_size: int) -> None:
    """Vocab + configs + random-weight checkpoint for the server to load."""
    import pickle

    import jax

    from simpleimagecaptionzoo_tpu.config import ModelConfig
    from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
    from simpleimagecaptionzoo_tpu.models.base import get_captioner
    from simpleimagecaptionzoo_tpu.vocab import SPECIALS, Vocabulary

    vocab = Vocabulary()
    for w in SPECIALS:
        vocab.add_word(w)
    for i in range(vocab_size - len(SPECIALS)):
        vocab.add_word(f"w{i}")
    with open(os.path.join(root, "caption_vocab.pkl"), "wb") as f:
        pickle.dump(vocab, f)
    os.makedirs(os.path.join(root, "Configs", "Datasets"), exist_ok=True)
    os.makedirs(os.path.join(root, "Configs", "Models"), exist_ok=True)
    with open(os.path.join(root, "Configs", "Datasets", "Bench.data"),
              "w") as f:
        f.write("image_root=/images/\ndata_dir=/\n"
                "caption_vocab_path=/caption_vocab.pkl\n")
    with open(os.path.join(root, "Configs", "Models",
                           model_type + ".json"), "w") as f:
        json.dump({"model_type": model_type, "embed_dim": dims,
                   "hidden_dim": dims, "atten_dim": dims}, f)
    cfg = ModelConfig(model_type=model_type, vocab_size=len(vocab),
                      embed_dim=dims, hidden_dim=dims, atten_dim=dims)
    model = get_captioner(cfg)
    tree = {"params": model.init_params(jax.random.PRNGKey(0)),
            "model_state": model.init_model_state()}
    CheckpointManager(model_type, "Bench",
                      root=os.path.join(root, "CheckPoints")
                      ).save_best(tree, 0.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BUTDSpatial",
                    choices=["NIC", "BUTDSpatial", "AoASpatial"])
    ap.add_argument("--dims", type=int, default=1024,
                    help="embed/hidden width (shrink for CPU smoke runs)")
    ap.add_argument("--vocab", type=int, default=10102)
    ap.add_argument("--beam", type=int, default=3, help="-1 for greedy")
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=20.0)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--clients", type=int, default=128)
    ap.add_argument("--requests", type=int, default=1024)
    ap.add_argument("--warmup_requests", type=int, default=64)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="bench_serving_")
    cwd = os.getcwd()
    try:
        make_fixture(root, args.model, args.dims, args.vocab)
        os.chdir(root)
        from tools.caption_server import build_argparser, build_server
        srv_args = build_argparser().parse_args([
            "--dataset", "Bench", "--model_type", args.model,
            "--beam", str(args.beam), "--max_batch", str(args.max_batch),
            "--max_wait_ms", str(args.max_wait_ms),
            "--img_size", str(args.img_size), "--dtype", args.dtype,
            "--port", "0"])
        httpd, batcher = build_server(srv_args)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = "http://127.0.0.1:%d/caption" % httpd.server_address[1]

        # pre-encode distinct JPEGs (distinct inputs defeat result caching;
        # encode cost stays out of the measurement)
        from PIL import Image
        rng = np.random.default_rng(0)
        uploads = []
        for _ in range(256):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255,
                                         (args.img_size, args.img_size, 3),
                                         dtype=np.uint8)
                            ).save(buf, format="JPEG", quality=90)
            uploads.append(buf.getvalue())

        def post(i: int) -> float:
            t0 = time.perf_counter()
            req = urllib.request.Request(url, data=uploads[i % len(uploads)],
                                         method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                json.load(r)
            return time.perf_counter() - t0

        pool = ThreadPoolExecutor(max_workers=args.clients)
        list(pool.map(post, range(args.warmup_requests)))       # warm

        # batcher counters are cumulative — snapshot around the measured
        # window so warmup's ramp-up batches don't contaminate batch fill
        s0 = batcher.snapshot()
        t0 = time.perf_counter()
        lats = list(pool.map(post, range(args.requests)))
        dt = time.perf_counter() - t0
        pool.shutdown()
        s1 = batcher.snapshot()
        httpd.shutdown()
        batcher.stop()
        n_req = s1["requests"] - s0["requests"]
        n_batch = s1["batches"] - s0["batches"]
        fill = round(n_req / n_batch, 2) if n_batch else None

        lat = np.asarray(lats) * 1e3
        out = {
            "metric": "serving_requests_per_sec",
            "value": round(args.requests / dt, 1),
            "unit": "req/sec",
            "model": args.model, "dims": args.dims, "beam": args.beam,
            "dtype": args.dtype, "max_batch": args.max_batch,
            "clients": args.clients,
            "mean_batch_fill": fill,
            "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
            "latency_ms_p99": round(float(np.percentile(lat, 99)), 1),
        }
        print(json.dumps(out))
        return 0
    finally:
        os.chdir(cwd)
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
