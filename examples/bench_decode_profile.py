"""Decode perf probes with tunnel-safe methodology.

This environment's accelerator tunnel makes naive microbenchmarks lie
(docs/BENCHMARKS.md "Environment calibration"): repeated same-input calls
return cached results, `block_until_ready` doesn't force execution, every
call pays a ~24-35 ms dispatch floor, and bulk transfers crawl.  All probes
here therefore (a) scan many work items inside ONE jit call, (b) generate
inputs on device from a per-call seed, (c) read back only ids/scalars.

    python examples/bench_decode_profile.py [--batch 256] [--beam 3]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode as D
from simpleimagecaptionzoo_tpu.utils.flops import decode_flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=9962)
    ap.add_argument("--inner", type=int, default=10,
                    help="batches per jit call (amortizes dispatch floor)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 decode hot set (ops/quant.py)")
    args = ap.parse_args()
    print("devices:", jax.devices())

    b, k, v, n_box = args.batch, args.beam, args.vocab, 36
    nb = args.inner
    cfg = ModelConfig(model_type="AoADetection", vocab_size=v,
                      embed_dim=1024, hidden_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=n_box)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    if args.int8:
        params = model.quantize_decode_params(params)
        print("decode hot set quantized:", [
            "/".join(p) for p in model.decode_quant_paths])

    def scan_decoder(decode_one):
        @jax.jit
        def many(p, seed):
            feats = jax.random.normal(jax.random.PRNGKey(seed),
                                      (nb, b, n_box, 2048), jnp.bfloat16)
            masks = jnp.ones((nb, b, n_box), jnp.bfloat16)

            def body(_, fm):
                enc, _ = model.encode(p, {"bu_feats": fm[0],
                                          "bu_masks": fm[1]}, train=False)
                return 0, decode_one(p, enc)
            return jax.lax.scan(body, 0, (feats, masks))[1]
        return many

    def run(tag, decode_one, flops):
        many = scan_decoder(decode_one)
        np.asarray(many(params, jnp.int32(0)))          # compile + warm
        t0 = time.perf_counter()
        outs = [many(params, jnp.int32(s + 1)) for s in range(2)]
        [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / (2 * nb)
        print(f"{tag:<38s} {dt * 1e3:7.2f} ms/batch  {b / dt:7.0f} "
              f"captions/sec  {flops / dt / 1e12:5.1f} TFLOP/s")

    run(f"beam={k} x 20 steps (device-resident)",
        lambda p, e: D.beam_search(model, p, e, beam_size=k, max_steps=20),
        decode_flops(cfg, b, n_box, 20, beam=k))
    run("greedy x 20 steps (device-resident)",
        lambda p, e: D.greedy(model, p, e, max_len=20)[0],
        decode_flops(cfg, b, n_box, 20))
    return 0


if __name__ == "__main__":
    sys.exit(main())
