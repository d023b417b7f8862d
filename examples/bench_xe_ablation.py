"""On-chip decomposition of the BUTD/AoA XE train step (VERDICT r4 #2).

The family MFU table (docs/BENCHMARKS.md) shows BUTDDetection XE bf16 at
18-24% vs NIC's 33%, with the gap attributed to per-timestep attention/
LN/gate VPU work inside the scan.  The round-5 decode recalibration
showed that attribution can be wrong (XLA overlapped the decode cell's
epilogue just fine once the harness stopped generating RNG in the timed
region) — so before building the fused (2xLSTM + attention) training
cell SURVEY.md names, this bench decomposes the step the way
bench_beam_ablation.py decomposed the beam step:

  full        the production make_xe_train_step (fwd+bwd+Adam), ss off
  full-uK     same, teacher-forcing scan unroll=K (the round-4 sweep
              rejected u2 at B=128; re-measured here at the target batch)
  fwd         loss only, no backward
  scan f+b    encode + 21-step decoder scan fwd+bwd, hoisted head elided
              (loss = masked mean of hiddens) — the fused-cell target
  head f+b    scan fwd only (stop-grad hiddens) + head/loss fwd+bwd
  encode f+b  encode fwd+bwd only

Methodology per docs/BENCHMARKS.md "Environment calibration": donated
state threads through every iteration (no hoisting), distinct rng per
step, >= 20 steps per timing, only scalars read back.

    python examples/bench_xe_ablation.py [--batch 512] [--model BUTDDetection]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SICZ_JAX_PLATFORM"):
    # same escape hatch as main.py:16 — site customization pins
    # jax_platforms, so the plain env var can't keep a CPU compile-check
    # off the exclusive single chip
    import jax
    jax.config.update("jax_platforms", os.environ["SICZ_JAX_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.optim import (apply_updates_partitioned,
                                                    make_grad_transform)
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.ops.losses import (label_smoothing_loss,
                                                  xe_mask_from_lengths)
from simpleimagecaptionzoo_tpu.utils import flops as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--model", default="BUTDDetection")
    ap.add_argument("--vocab", type=int, default=10102)
    ap.add_argument("--t", type=int, default=22)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--unrolls", default="2,4")
    args = ap.parse_args()
    b, v, t, n_box = args.batch, args.vocab, args.t, 36
    dt = jnp.bfloat16
    print(f"devices: {jax.devices()}  model={args.model} batch={b} bf16")

    cfg = ModelConfig(model_type=args.model, vocab_size=v, embed_dim=1024,
                      hidden_dim=1024, atten_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=n_box)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    labels = model.param_labels(params)
    tx = make_grad_transform("Adam", 0.1)
    params_host = jax.tree_util.tree_map(np.asarray, params)

    rng = np.random.default_rng(0)
    batch = {
        "visual": {"bu_feats": jnp.asarray(
            rng.normal(size=(b, n_box, 2048)).astype(np.float32)),
            "bu_masks": jnp.ones((b, n_box), jnp.float32)},
        "captions": jnp.asarray(
            rng.integers(4, v, size=(b, t)).astype(np.int32)),
        "lengths": jnp.asarray(rng.integers(
            min(8, t - 1), t, size=(b,)).astype(np.int32)),
    }

    def make_variant(kind):
        """A jitted step(state, batch, rng, ...) exercising one slice."""
        def step(state, batch, r, lr):
            r_enc, r_dec = jax.random.split(r)
            captions = batch["captions"]
            n_steps = captions.shape[1] - 1
            mask = xe_mask_from_lengths(batch["lengths"] - 1, n_steps)
            visual = S._cast_floats(batch["visual"], dt)

            def loss_fn(p):
                p = S._cast_floats(p, dt)
                enc, new_ms = model.encode(p, visual, train=True, rng=r_enc,
                                           model_state=state.model_state)
                if kind == "encode":
                    return jnp.mean(
                        enc.features.astype(jnp.float32) ** 2), new_ms
                if kind in ("scan", "head"):
                    # teacher-forcing scan returning HIDDENS (the hoisted
                    # head elided) — mirrors teacher_forced_logits with
                    # ss off, including the per-step dropout rng stream
                    # (ops/decode.py:104-156)
                    gt = captions[:, :-1].T
                    rngs = jax.random.split(r_dec, n_steps)
                    step_rngs = jax.vmap(
                        lambda kk: jax.random.split(kk, 3)[2])(rngs)
                    tf_in = model.tf_inputs(p, enc, gt, step_rngs,
                                            train=True)
                    state0 = model.init_state(p, enc)

                    def body(carry, xs):
                        st = carry
                        tok, r_t, tf_t = xs
                        hid, st, _ = model.step_core(
                            p, enc, st, tok, train=True,
                            rng=jax.random.split(r_t, 3)[2], tf_input=tf_t)
                        return st, hid
                    _, hid_t = jax.lax.scan(body, state0,
                                            (gt, rngs, tf_in))
                    hiddens = jnp.transpose(hid_t, (1, 0, 2))
                    if kind == "scan":
                        loss = jnp.mean((hiddens.astype(jnp.float32)
                                         * mask[..., None]) ** 2)
                        return loss, new_ms
                    # head: backward through predict+loss only
                    hiddens = jax.lax.stop_gradient(hiddens)
                    logits = model.predict(p, hiddens)
                    return label_smoothing_loss(logits, captions[:, 1:],
                                                mask, 0.1), new_ms
                logits = decode.teacher_forced_logits(
                    model, p, enc, captions, 0.0, r_dec, train=True,
                    ss_active=False)
                return label_smoothing_loss(logits, captions[:, 1:], mask,
                                            0.1), new_ms

            if kind == "fwd":
                loss, new_ms = loss_fn(state.params)
                return state.replace(model_state=new_ms,
                                     step=state.step + 1), {"loss": loss}
            (loss, new_ms), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = apply_updates_partitioned(state.params, updates,
                                                   labels, lr, 0.0)
            return state.replace(params=new_params, opt_state=new_opt,
                                 model_state=new_ms, step=state.step + 1), \
                {"loss": loss}
        return jax.jit(step, donate_argnums=(0,))

    def bench(name, step, fl=None):
        fresh = jax.tree_util.tree_map(jnp.asarray, params_host)
        state = TrainState.create(fresh, tx,
                                  model_state=model.init_model_state())
        state, m = step(state, batch, jax.random.PRNGKey(0), 1e-4)
        jax.block_until_ready(m["loss"])
        ts = []
        k = 1
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = step(state, batch, jax.random.PRNGKey(k), 1e-4)
                k += 1
            jax.block_until_ready(m["loss"])
            ts.append((time.perf_counter() - t0) / args.iters)
        ms = np.mean(ts) * 1e3
        extra = ""
        if fl is not None:
            tf = fl / (ms / 1e3) / 1e12
            extra = f"  {tf:6.1f} TFLOP/s  mfu={tf / 197:.3f}"
        print(f"{name:<12} {ms:8.2f} ms/step  (std {np.std(ts) * 1e3:.2f})"
              f"{extra}", flush=True)
        return ms

    n_steps = t - 1
    step_fl = F.step_flops(cfg, float(b), n_box) * n_steps
    enc_fl = F.encode_flops(cfg, b, n_box)
    full_fl = 3 * (enc_fl + step_fl)          # fwd + dx + dW

    res = {}
    res["full"] = bench("full", make_variant("full"), full_fl)
    for u in [int(x) for x in args.unrolls.split(",") if x.strip()]:
        os.environ["SICZ_TPU_SCAN_UNROLL_XE"] = str(u)
        res[f"full-u{u}"] = bench(f"full-u{u}", make_variant("full"), full_fl)
        del os.environ["SICZ_TPU_SCAN_UNROLL_XE"]
    res["fwd"] = bench("fwd", make_variant("fwd"), enc_fl + step_fl)
    res["scan"] = bench("scan f+b", make_variant("scan"))
    res["head"] = bench("head f+b", make_variant("head"))
    res["encode"] = bench("encode f+b", make_variant("encode"))

    # identities: full = encode f+b + scan f+b + head f+b (+ Adam);
    #             'scan' variant = encode f+b + scan f+b
    print(f"\nhead f+b (full - scan):          "
          f"{res['full'] - res['scan']:8.2f} ms")
    print(f"decoder scan f+b (scan - encode):"
          f" {res['scan'] - res['encode']:8.2f} ms")
    print(f"encode f+b:                      {res['encode']:8.2f} ms")
    print(f"cross-check head variant (enc_fwd + scan_fwd + head f+b): "
          f"{res['head']:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
