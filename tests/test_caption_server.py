"""End-to-end test for tools/caption_server.py — the serving surface:
real HTTP requests against the real server object (checkpoint load,
compile+warm, dynamic batching, upload decode, JSON replies)."""
import io
import json
import os
import pickle
import sys
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    """The real server built through the real CLI argument path, serving
    on an ephemeral port from a daemon thread."""
    import jax
    from simpleimagecaptionzoo_tpu.config import ModelConfig
    from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
    from simpleimagecaptionzoo_tpu.models.base import get_captioner
    from simpleimagecaptionzoo_tpu.vocab import SPECIALS, Vocabulary

    tmp = tmp_path_factory.mktemp("serve")
    vocab = Vocabulary()
    for w in SPECIALS + ("a", "dog", "cat", "runs"):
        vocab.add_word(w)
    with open(tmp / "caption_vocab.pkl", "wb") as f:
        pickle.dump(vocab, f)
    ds_root = tmp / "Configs" / "Datasets"
    md_root = tmp / "Configs" / "Models"
    ds_root.mkdir(parents=True)
    md_root.mkdir(parents=True)
    (ds_root / "TinyDS.data").write_text(
        "image_root=/photos/\ndata_dir=/\n"
        "caption_vocab_path=/caption_vocab.pkl\n")
    (md_root / "NIC.json").write_text(json.dumps(
        {"model_type": "NIC", "embed_dim": 16, "hidden_dim": 16}))
    cfg = ModelConfig(model_type="NIC", vocab_size=len(vocab),
                      embed_dim=16, hidden_dim=16)
    model = get_captioner(cfg)
    tree = {"params": model.init_params(jax.random.PRNGKey(0)),
            "model_state": model.init_model_state()}
    CheckpointManager("NIC", "TinyDS",
                      root=str(tmp / "CheckPoints")).save_best(tree, 0.0)

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        from tools.caption_server import build_argparser, build_server
        args = build_argparser().parse_args([
            "--dataset", "TinyDS", "--model_type", "NIC",
            "--dataset_config_root", str(ds_root) + "/",
            "--model_config_root", str(md_root) + "/",
            "--checkpoint_root", str(tmp / "CheckPoints"),
            "--beam", "-1", "--max_batch", "4", "--img_size", "64",
            "--dtype", "float32", "--port", "0", "--max_wait_ms", "30"])
        httpd, batcher = build_server(args)
    finally:
        os.chdir(cwd)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    yield url
    httpd.shutdown()
    batcher.stop()
    thread.join(timeout=10)


def _jpeg_bytes(seed: int, size=(48, 56)) -> bytes:
    from PIL import Image
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, size=size + (3,),
                                 dtype=np.uint8)).save(buf, format="JPEG")
    return buf.getvalue()


def _post(url: str, data: bytes) -> dict:
    req = urllib.request.Request(url + "/caption", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.load(r)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        health = json.load(r)
    assert health["ok"] is True
    assert health["model_type"] == "NIC"
    assert health["max_batch"] == 4


def test_concurrent_uploads_are_coalesced_and_answered(server):
    # 6 concurrent requests against max_batch=4: at least two decode
    # batches, every request answered with a caption string
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(
            lambda i: _post(server, _jpeg_bytes(i)), range(6)))
    for out in results:
        assert isinstance(out["caption"], str)
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        stats = json.load(r)
    assert stats["requests"] >= 6
    assert stats["batches"] >= 2            # 6 rows can't fit one batch of 4
    assert stats["rows_decoded"] == stats["batches"] * 4   # pad-to-static
    assert "latency_ms_p50" in stats


def test_bad_upload_rejected_not_fatal(server):
    req = urllib.request.Request(server + "/caption",
                                 data=b"not an image at all", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert "undecodable" in json.load(e.value)["error"]
    # the server still answers real work afterwards
    assert isinstance(_post(server, _jpeg_bytes(99))["caption"], str)


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert e.value.code == 404


class _StubVocab:
    def decode_ids(self, row):
        return ["a", "caption"]


def _make_batcher(decode_fn, batch=4, wait_ms=5.0):
    from tools.caption_server import Batcher
    return Batcher(decode_fn, {"params": 0, "model_state": 0}, _StubVocab(),
                   batch, 8, wait_ms)


def _img():
    return np.zeros((8, 8, 3), np.uint8)


def test_batcher_skips_cancelled_requests():
    """A client that timed out cancels its future; the batcher must not
    count it or try to resolve it."""
    def decode(params, state, visual):
        return np.zeros((4, 5), np.int32)

    b = _make_batcher(decode)
    live = b.submit(_img())             # enqueue BEFORE the worker starts,
    dead = b.submit(_img())             # so the cancel can't race the drain
    assert dead.cancel()
    b.start()
    assert live.result(timeout=30) == "a caption"
    assert dead.cancelled()
    b.stop()
    assert b.stats["requests"] == 1


def test_batcher_stop_fails_queued_work_fast_and_rejects_new():
    """stop() must resolve (with an error) anything still queued behind the
    wake sentinel instead of leaving clients blocked, and post-stop submits
    must fail immediately."""
    import threading
    in_decode = threading.Event()
    release = threading.Event()

    def decode(params, state, visual):
        in_decode.set()
        release.wait(timeout=60)
        return np.zeros((1, 5), np.int32)

    b = _make_batcher(decode, batch=1)
    b.start()
    first = b.submit(_img())
    assert in_decode.wait(timeout=30)   # worker is inside decode
    stuck = b.submit(_img())            # queued; worker will exit before it
    stopper = threading.Thread(target=b.stop)
    stopper.start()                     # sets _stop, then joins the worker
    release.set()
    stopper.join(timeout=30)
    assert not stopper.is_alive()
    assert first.result(timeout=5) == "a caption"
    with pytest.raises(RuntimeError, match="shutting down"):
        stuck.result(timeout=5)
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit(_img()).result(timeout=5)
