"""Beam-decode step decomposition at the headline bench shape (round 5).

bench.py's headline runs AoADetection beam=3 at BATCH=384 (1152 lanes) and
lands at decode MFU ~0.32.  This bench splits that number into its parts so
the next kernel targets the real bottleneck instead of a guessed one:

  encode            the 6-layer refiner + K/V hoist (half the batch FLOPs)
  cell              the decoder LSTM alone, in-scan
  core              step_lanes_core (cell + LN + AoA attention + GLU)
  core+head         core + fused top-k head (the full per-step compute)
  beam20            ops/decode.beam_search, max_steps=20 (adds lane
                    bookkeeping: joint top-k, lane gathers, finished pools)

Methodology (docs/BENCHMARKS.md "Environment calibration"): every timed
quantity scans >= 20 iterations inside ONE jit call, the carry chains
through every iteration so XLA cannot hoist loop-invariant work
(the round-4 bench_lstm flaw: per-step RNG in the timed region; the probe-3
flaw: hoistable loop bodies), and only scalars/ids are read back.

    python examples/bench_beam_ablation.py [--batch 384] [--trials 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode as D
from simpleimagecaptionzoo_tpu.ops import fused_head
from simpleimagecaptionzoo_tpu.utils import flops as F

STEPS = 20


def timed(fn, trials):
    np.asarray(fn(0))                      # compile + warm
    ts = []
    for t in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(t + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.mean(ts)), float(np.std(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=10102)
    ap.add_argument("--inner", type=int, default=20,
                    help="iterations per jit call (amortizes the ~30ms "
                         "dispatch floor)")
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()
    b, k, v, n_box, nb = args.batch, args.beam, args.vocab, 36, args.inner
    rows = b * k
    print(f"devices: {jax.devices()}  batch={b} beam={k} rows={rows}")

    cfg = ModelConfig(model_type="AoADetection", vocab_size=v,
                      embed_dim=1024, hidden_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=n_box)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, n_box, 2048),
                              jnp.bfloat16)
    masks = jnp.ones((b, n_box), jnp.bfloat16)

    def chain(x, carry):
        # fold the loop counter into the input so iterations can't be hoisted
        return x + carry.astype(x.dtype) * jnp.asarray(1e-20, x.dtype)

    # ---- encode (runs once per batch in production) -----------------------
    @jax.jit
    def encode_many(p, seed):
        def body(carry, i):
            enc, _ = model.encode(
                p, {"bu_feats": chain(feats, carry), "bu_masks": masks},
                train=False)
            return carry + jnp.sum(enc.mean.astype(jnp.float32)), ()
        return jax.lax.scan(body, jnp.float32(seed), jnp.arange(nb))[0]

    enc0, _ = model.encode(params, {"bu_feats": feats, "bu_masks": masks},
                           train=False)
    tok0 = jnp.full((b, k), 4, jnp.int32)

    # ---- per-step pieces, scanned STEPS deep inside one traced loop -------
    def scan_steps(step_fn):
        @jax.jit
        def many(p, seed):
            def outer(carry, i):
                state = model.init_lane_state(p, enc0, k)
                state = dict(state, ctx=chain(state["ctx"], carry))

                def inner(st, t):
                    st, out = step_fn(p, st, tok0)
                    return st, out
                state, outs = jax.lax.scan(inner, state, jnp.arange(STEPS))
                return carry + jnp.sum(outs.astype(jnp.float32)), ()
            return jax.lax.scan(outer, jnp.float32(seed),
                                jnp.arange(nb))[0]
        return many

    def core_step(p, st, tok):
        ctx, st, _ = model.step_lanes_core(p, enc0, st, tok, train=False,
                                           rng=None)
        return st, ctx[..., 0]

    def core_head_step(p, st, tok):
        ctx, st, _ = model.step_lanes_core(p, enc0, st, tok, train=False,
                                           rng=None)
        vals, idx, lse = fused_head.topk_head(
            p["predict"], ctx.reshape(rows, -1), k)
        return st, (vals - lse[:, None]).reshape(b, k * k)[..., 0]

    # cell-only: the decoder LSTM at lane rows (chain through h)
    from simpleimagecaptionzoo_tpu.models import layers as L
    emb_const = jax.random.normal(jax.random.PRNGKey(2), (rows, 2048),
                                  jnp.bfloat16)

    @jax.jit
    def cell_many(p, seed):
        lstm = p["decoder"]["lstm"] if "decoder" in p else p["lstm"]

        def outer(carry, i):
            h0 = c0 = jnp.zeros((rows, 1024), jnp.bfloat16)
            h0 = chain(h0, carry)

            def inner(hc, t):
                h, c = L.lstm_cell(lstm, emb_const, *hc)
                return (h, c), ()
            (h, c), _ = jax.lax.scan(inner, (h0, c0), jnp.arange(STEPS))
            return carry + jnp.sum(h.astype(jnp.float32)), ()
        return jax.lax.scan(outer, jnp.float32(seed), jnp.arange(nb))[0]

    # head-only
    hid_const = jax.random.normal(jax.random.PRNGKey(3), (rows, 1024),
                                  jnp.bfloat16)

    @jax.jit
    def head_many(p, seed):
        def outer(carry, i):
            def inner(c2, t):
                vals, idx, lse = fused_head.topk_head(
                    p["predict"], chain(hid_const, c2), k)
                return c2 + jnp.sum(vals), ()
            c2, _ = jax.lax.scan(inner, carry, jnp.arange(STEPS))
            return c2, ()
        return jax.lax.scan(outer, jnp.float32(seed), jnp.arange(nb))[0]

    # full beam (bookkeeping included) — no early exit with random params
    @jax.jit
    def beam_many(p, seed):
        def body(carry, i):
            enc, _ = model.encode(
                p, {"bu_feats": chain(feats, carry), "bu_masks": masks},
                train=False)
            ids = D.beam_search(model, p, enc, beam_size=k, max_steps=STEPS)
            return carry + jnp.sum(ids).astype(jnp.float32), ()
        return jax.lax.scan(body, jnp.float32(seed), jnp.arange(nb))[0]

    lstm_p = (params["decoder"]["lstm"] if "decoder" in params
              else params["lstm"])
    del lstm_p

    rows_f = float(rows)
    d = cfg.hidden_dim
    cell_fl = F._lstm(rows_f, 2048, d) * STEPS
    head_fl = F._mm(rows_f, v, d) * STEPS
    step_fl = F.step_flops(cfg, rows_f, n_box) * STEPS
    core_fl = step_fl - head_fl
    enc_fl = F.encode_flops(cfg, b, n_box)

    results = {}
    for name, fn, fl in (
            ("encode", encode_many, enc_fl),
            ("cell x20", cell_many, cell_fl),
            ("core x20", scan_steps(core_step), core_fl),
            ("core+head x20", scan_steps(core_head_step), step_fl),
            ("head x20", head_many, head_fl),
            ("beam20 (full)", beam_many, enc_fl + step_fl),
    ):
        mean, std = timed(lambda s, fn=fn: fn(params, jnp.int32(s)),
                          args.trials)
        per = mean / nb
        results[name] = per
        print(f"{name:<16} {per * 1e3:8.2f} ms/batch  (std {std / nb * 1e3:.2f})"
              f"  {fl / per / 1e12:6.1f} TFLOP/s  mfu={fl / per / 197e12:.3f}",
              flush=True)

    if "core+head x20" in results and "beam20 (full)" in results:
        book = results["beam20 (full)"] - results["encode"] \
            - results["core+head x20"]
        print(f"\nbookkeeping residual (beam - encode - core+head): "
              f"{book * 1e3:.2f} ms/batch ({book / STEPS * 1e6:.0f} us/step)")
        attn = results["core x20"] - results["cell x20"]
        print(f"attention+GLU+LN residual (core - cell): "
              f"{attn * 1e3:.2f} ms/batch ({attn / STEPS * 1e6:.0f} us/step)")
        hd = results["core+head x20"] - results["core x20"]
        print(f"head residual (core+head - core): "
              f"{hd * 1e3:.2f} ms/batch ({hd / STEPS * 1e6:.0f} us/step)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
