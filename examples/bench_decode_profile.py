"""Decode-step component microbenchmark (perf-lever hunting).

Times, at bench.py's production shapes (AoADetection 1024d, vocab 9962,
batch 256, beam 3 -> 768 lanes, bf16):

* one fused decoder step (what the beam while_loop body pays per token),
* its individual matmul components (predict head, LSTM, AoA block),
* the beam bookkeeping (top_k + gathers) isolated,
* encode (refiner) once,

so the captions/sec headline can be attributed to ops and the next
optimization chosen from data rather than guesses.

    python examples/bench_decode_profile.py [--batch 256] [--beam 3]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models.base import get_captioner


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<42s} {dt * 1e6:9.1f} us")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=9962)
    args = ap.parse_args()
    print("devices:", jax.devices())

    b, k, v, n_box, d = args.batch, args.beam, args.vocab, 36, 1024
    rows = b * k
    cfg = ModelConfig(model_type="AoADetection", vocab_size=v, embed_dim=d,
                      hidden_dim=d, enc_dim=2048, num_heads=8,
                      num_refine_layers=6, max_bu_len=n_box)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    visual = {"bu_feats": jnp.asarray(
        rng.normal(size=(b, n_box, 2048)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "bu_masks": jnp.ones((b, n_box), jnp.bfloat16)}

    enc_fn = jax.jit(lambda p, vz: model.encode(p, vz, train=False)[0])
    enc = enc_fn(params, visual)
    timeit("encode (proj + 6-layer refiner + kv hoist)", enc_fn, params,
           visual, iters=20)

    # blow encode up to beam lanes the way beam_search's vmap does
    enc_k = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0) if hasattr(x, "ndim") and x.ndim
        else x, enc)
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0), model.init_state(params, enc))
    toks = jnp.ones((rows,), jnp.int32)

    step_fn = jax.jit(lambda p, e, s, t: model.step(p, e, s, t, train=False))
    dt_step = timeit("full decoder step (768 lanes)", step_fn, params, enc_k,
                     state, toks)

    # components
    h = state["h"]
    x_lstm = jnp.concatenate(
        [L.embedding(params["embed"], toks), state["ctx"]], axis=-1)
    timeit("  lstm_cell (rows, 2048 -> 4x1024)",
           jax.jit(lambda p, x, hh, cc: L.lstm_cell(p, x, hh, cc)),
           params["lstm"], x_lstm, h, state["m"])
    timeit("  predict head dense_wn (rows, 1024 -> 9962)",
           jax.jit(L.dense_wn), params["predict"], h)
    q = h[:, None, :]
    timeit("  aoa block q-proj+attn+GLU (kv hoisted)",
           jax.jit(lambda p, qq, e: __import__(
               "simpleimagecaptionzoo_tpu.models.aoa", fromlist=["aoa_block"]
           ).aoa_block(p, qq, e.features, e.features, e.mask, cfg.num_heads,
                       dropout_aoa=0.0, dropout_dot=0.0, train=False,
                       kv_proj=(e.extras["k_proj"], e.extras["v_proj"]))),
           params["aoa_dec"], q, enc_k)

    # beam bookkeeping isolated: scores+topk+gathers at (b, k, v)
    logits = jnp.asarray(rng.normal(size=(b, k, v)).astype(np.float32))
    scores = jnp.zeros((b, k), jnp.float32)

    def bookkeeping(lg, sc):
        cand = sc[..., None] + jax.nn.log_softmax(lg, axis=-1)
        top, idx = jax.lax.top_k(cand.reshape(b, -1), k)
        return top, idx // v, idx % v

    timeit("beam bookkeeping (log_softmax+topk)", jax.jit(bookkeeping),
           logits, scores)

    est_20 = 20 * dt_step
    print(f"\n~20 steps x full step = {est_20 * 1e3:.1f} ms; measured "
          f"bench.py batch time implies the loop+bookkeeping overhead.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
