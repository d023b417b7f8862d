"""Standing caption server: dynamic batching over one jitted decode program.

The serving counterpart of ``tools/caption_images.py`` (which is offline /
directory-batch): a small HTTP daemon that accepts raw image uploads,
coalesces concurrent requests into fixed-shape batches (static shapes =
one XLA compile, ever), decodes them with batched on-device beam search,
and answers each request with its caption.  This is the deployment shape
the decode engine was designed for — the dispatch pipeline and batch knee
measured in docs/BENCHMARKS.md assume exactly this coalesced pattern.

Design (one decode worker, many HTTP threads):

* HTTP threads (``ThreadingHTTPServer``) decode+resize the upload on the
  host (PIL path of ``data.datasets.load_image_uint8``) and enqueue
  ``(pixels, Future)``;
* the batcher thread takes the first waiting request, then drains the
  queue up to ``--max_batch`` or ``--max_wait_ms`` (whichever first),
  pads the tail by repeating the last image (static shape), runs the ONE
  jitted decode, and resolves every request's future;
* under load, batches fill to ``--max_batch`` and throughput approaches
  the offline number; a lone request pays one batch latency + the wait
  window.

Endpoints:
    POST /caption   body = image bytes (jpeg/png/...) -> {"caption": ...}
    GET  /healthz   liveness + model identity
    GET  /stats     request/batch counters (mean fill, p50/p99 latency)

    python tools/caption_server.py --dataset COCO14 --model_type \
        BUTDSpatial [--beam 3] [--port 8000] [--max_batch 64] \
        [--max_wait_ms 20]

The reference has no serving surface at all (its ``sample`` op is one
image from disk per process run, Main.py:130-138); this is new capability.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import DataConfig, load_model_config
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.vocab import load_vocab


def decode_upload(data: bytes, size: int) -> np.ndarray:
    """Uploaded image bytes -> (size, size, 3) uint8 — the same
    convert+bilinear-resize contract as datasets.load_image_uint8's PIL
    path (uploads arrive as bytes, so the path-based native loader does
    not apply)."""
    from PIL import Image
    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


class Batcher:
    """Coalesces requests into fixed-shape decode batches."""

    def __init__(self, decode_fn, tree, vocab, batch: int, img_size: int,
                 max_wait_ms: float) -> None:
        self._decode = decode_fn
        self._tree = tree
        self._vocab = vocab
        self._batch = batch
        self._img_size = img_size
        self._max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "rows_decoded": 0}
        self._lat_ms: list = []
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="caption-batcher")

    def start(self) -> "Batcher":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)                      # wake the worker
        self._thread.join(timeout=30)

    def submit(self, pixels: np.ndarray) -> Future:
        fut: Future = Future()
        self._q.put((pixels, fut, time.perf_counter()))
        return fut

    # -- worker ------------------------------------------------------------
    def _collect(self):
        """Block for the first request, then drain up to batch/max_wait."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = time.perf_counter() + self._max_wait
        while len(items) < self._batch:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            real = len(items)
            imgs = np.stack([it[0] for it in items]
                            + [items[-1][0]] * (self._batch - real))
            try:
                ids = np.asarray(self._decode(
                    self._tree["params"], self._tree["model_state"],
                    {"img_tensors": jnp.asarray(imgs)}))
                now = time.perf_counter()
                with self._lock:
                    self.stats["batches"] += 1
                    self.stats["requests"] += real
                    self.stats["rows_decoded"] += self._batch
                    self._lat_ms.extend(
                        (now - it[2]) * 1e3 for it in items)
                    del self._lat_ms[:-4096]   # bounded window
                for it, row in zip(items, ids[:real]):
                    it[1].set_result(" ".join(self._vocab.decode_ids(row)))
            except Exception as e:               # resolve, don't wedge clients
                for it in items:
                    if not it[1].done():
                        it[1].set_exception(e)

    def snapshot(self) -> dict:
        with self._lock:
            lat = np.asarray(self._lat_ms, np.float64)
            out = dict(self.stats)
        if out["batches"]:
            out["mean_batch_fill"] = round(
                out["requests"] / out["batches"], 2)
        if lat.size:
            out["latency_ms_p50"] = round(float(np.percentile(lat, 50)), 1)
            out["latency_ms_p99"] = round(float(np.percentile(lat, 99)), 1)
        return out


def make_handler(batcher: Batcher, img_size: int, identity: dict,
                 max_body: int):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):        # quiet: stats has the counts
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, dict(identity, ok=True))
            elif self.path == "/stats":
                self._reply(200, batcher.snapshot())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/caption":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                n = 0
            if n <= 0 or n > max_body:
                self._reply(413 if n > max_body else 400,
                            {"error": f"body must be 1..{max_body} bytes"})
                return
            data = self.rfile.read(n)
            try:
                pixels = decode_upload(data, img_size)
            except Exception as e:
                self._reply(400, {"error": f"undecodable image: {e}"})
                return
            try:
                caption = batcher.submit(pixels).result(timeout=120)
            except Exception as e:
                self._reply(500, {"error": f"decode failed: {e}"})
                return
            self._reply(200, {"caption": caption})

    return Handler


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="COCO14")
    ap.add_argument("--model_type", default="BUTDSpatial")
    ap.add_argument("--dataset_config_root", default="./Configs/Datasets/")
    ap.add_argument("--model_config_root", default="./Configs/Models/")
    ap.add_argument("--checkpoint_root", default="./CheckPoints")
    ap.add_argument("--use_scst_model", action="store_true")
    ap.add_argument("--beam", type=int, default=3, help="-1 for greedy")
    ap.add_argument("--max_batch", type=int, default=64,
                    help="static decode batch (pad-to-shape; one compile)")
    ap.add_argument("--max_wait_ms", type=float, default=20.0,
                    help="batching window after the first request arrives")
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_body_mb", type=int, default=32)
    return ap


def build_server(args):
    """Load the checkpoint, compile+warm the decode program, and return
    the ready-to-serve ``(ThreadingHTTPServer, Batcher)`` pair (the whole
    of ``main`` minus ``serve_forever`` — tests drive this directly)."""
    data_cfg = DataConfig.from_data_file(
        os.path.join(args.dataset_config_root, args.dataset + ".data"),
        base_dir=os.path.abspath(os.getcwd()), dataset_name=args.dataset)
    vocab = load_vocab(data_cfg.caption_vocab_path)
    model_cfg = load_model_config(
        os.path.join(args.model_config_root, args.model_type + ".json"),
        vocab_size=len(vocab))
    if model_cfg.uses_bu:
        raise SystemExit("Detection models need precomputed bottom-up "
                         "features; serve a Spatial/NIC model for raw "
                         "image uploads.")
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
        raise SystemExit(f"--beam must be -1 (greedy) or >= 1, got "
                         f"{args.beam}")

    # compile + warm BEFORE accepting traffic (first request must not pay
    # the 20-40s XLA compile)
    warm = np.zeros((args.max_batch, args.img_size, args.img_size, 3),
                    np.uint8)
    t0 = time.perf_counter()
    np.asarray(dec(tree["params"], tree["model_state"],
                   {"img_tensors": jnp.asarray(warm)}))
    print(f"decode compiled+warm in {time.perf_counter() - t0:.1f}s "
          f"(batch {args.max_batch}, beam {args.beam}, {args.dtype})")

    identity = {"model_type": args.model_type, "dataset": args.dataset,
                "beam": args.beam, "dtype": args.dtype,
                "max_batch": args.max_batch}
    batcher = Batcher(dec, tree, vocab, args.max_batch, args.img_size,
                      args.max_wait_ms).start()
    httpd = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(batcher, args.img_size, identity,
                     args.max_body_mb << 20))
    return httpd, batcher


def main():
    args = build_argparser().parse_args()
    httpd, batcher = build_server(args)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          "(POST /caption, GET /healthz, GET /stats)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batcher.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
