"""Per-family decode throughput matrix (greedy + beam-3), machine-readable.

bench.py's headline number covers only the flagship (AoADetection,
beam 3); this matrix makes decode-perf regressions on the other families
visible too.  Feature-mode inputs (precomputed features / bottom-up
boxes) isolate the decode engine from the CNN encoder, matching how the
reference reports beam decode cost.  Same tunnel-safe methodology as
bench.py: device-generated distinct inputs scanned inside one jit call,
ids-only readback.

    python examples/bench_matrix.py [--batch 256] [--out BENCH_MATRIX.json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode as D

VOCAB = 10102          # real COCO14 head (tests/test_vocab_and_metrics.py)


def family_setup(name, b):
    """-> (model, params, visual-maker(seed) building feature-mode inputs)."""
    common = dict(vocab_size=VOCAB, embed_dim=1024, hidden_dim=1024,
                  enc_dim=2048)
    if name == "NIC":
        cfg = ModelConfig(model_type="NIC", **common)
        mk = lambda key: {"features": jax.random.normal(
            key, (b, 2048), jnp.bfloat16)}
    elif name == "BUTDSpatial":
        cfg = ModelConfig(model_type="BUTDSpatial", atten_dim=1024, **common)
        mk = lambda key: {"spatial_feats": jax.random.normal(
            key, (b, 49, 2048), jnp.bfloat16)}
    elif name == "BUTDDetection":
        cfg = ModelConfig(model_type="BUTDDetection", atten_dim=1024,
                          max_bu_len=36, **common)
        mk = lambda key: {"bu_feats": jax.random.normal(
            key, (b, 36, 2048), jnp.bfloat16),
            "bu_masks": jnp.ones((b, 36), jnp.bfloat16)}
    elif name == "AoASpatial":
        cfg = ModelConfig(model_type="AoASpatial", num_heads=8,
                          num_refine_layers=6, **common)
        mk = lambda key: {"spatial_feats": jax.random.normal(
            key, (b, 49, 2048), jnp.bfloat16)}
    elif name == "AoADetection":
        cfg = ModelConfig(model_type="AoADetection", num_heads=8,
                          num_refine_layers=6, max_bu_len=36, **common)
        mk = lambda key: {"bu_feats": jax.random.normal(
            key, (b, 36, 2048), jnp.bfloat16),
            "bu_masks": jnp.ones((b, 36), jnp.bfloat16)}
    else:
        raise ValueError(name)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    return model, params, mk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--families", default="NIC,BUTDSpatial,BUTDDetection,"
                                          "AoASpatial,AoADetection")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    print("devices:", jax.devices())
    b, nb = args.batch, args.inner
    rows = []
    for fam in args.families.split(","):
        fam = fam.strip()
        model, params, mk = family_setup(fam, b)

        def many_fn(decode_one):
            @jax.jit
            def many(p, seed):
                def body(_, key):
                    enc, _ = model.encode(p, mk(key), train=False)
                    return 0, decode_one(p, enc)
                keys = jax.random.split(jax.random.PRNGKey(seed), nb)
                return jax.lax.scan(body, 0, keys)[1]
            return many

        for mode, decode_one in (
                ("greedy", lambda p, e: D.greedy(model, p, e,
                                                 max_len=20)[0]),
                ("beam3", lambda p, e: D.beam_search(model, p, e,
                                                     beam_size=3,
                                                     max_steps=20))):
            many = many_fn(decode_one)
            np.asarray(many(params, jnp.int32(99_000)))     # compile+warm
            times = []
            for r in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(many(params, jnp.int32(r + 1)))
                times.append((time.perf_counter() - t0) / nb)
            dt = float(np.median(times))
            cps = b / dt
            rows.append({"family": fam, "mode": mode,
                         "ms_per_batch": round(dt * 1e3, 2),
                         "captions_per_sec": round(cps, 1),
                         "batch": b})
            print(f"{fam:<14} {mode:<7} {dt * 1e3:8.2f} ms/batch "
                  f"{cps:9.0f} captions/sec", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "vocab": VOCAB,
                       "dims": "embed/hidden 1024"}, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
