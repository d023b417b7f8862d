"""End-to-end smoke demo through the public package surface.

Builds a tiny synthetic captioning dataset, trains a BUTDDetection captioner
for a few XE steps with label smoothing, decodes greedy + beam, and scores
the output with the COCO-protocol metric stack.  Run:

    python examples/demo_e2e.py [--steps 30]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu import STA_ID
from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.evalcap.bleu import Bleu
from simpleimagecaptionzoo_tpu.evalcap.cider_scorer import CiderD
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.ops.losses import (label_smoothing_loss,
                                                  xe_mask_from_lengths)
from simpleimagecaptionzoo_tpu.vocab import build_vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--model", type=str, default="BUTDDetection")
    args = ap.parse_args()

    print("devices:", jax.devices())

    # -- tiny synthetic dataset: each "image" is a random 36x2048 feature set
    #    whose caption deterministically depends on its feature signature.
    phrases = [["a", "man", "rides", "a", "horse"],
               ["a", "dog", "runs", "on", "the", "beach"],
               ["two", "birds", "fly", "over", "water"],
               ["a", "red", "car", "parked", "outside"]]
    vocab = build_vocab(phrases * 5, threshold=1)
    print("vocab size:", len(vocab))

    rng = np.random.default_rng(0)
    n_img, n_box, feat_dim, t_max = 32, 36, 64, 10
    feats = rng.normal(size=(n_img, n_box, feat_dim)).astype(np.float32)
    cls = rng.integers(0, len(phrases), size=(n_img,))
    feats[:, 0, :4] = np.eye(4, dtype=np.float32)[cls] * 5.0  # signature
    caps = np.zeros((n_img, t_max), np.int64)
    lens = np.zeros((n_img,), np.int64)
    for i in range(n_img):
        ids = vocab.encode_tokens(phrases[cls[i]])
        caps[i, :len(ids)] = ids
        lens[i] = len(ids) - 1

    cfg = ModelConfig(model_type=args.model, vocab_size=len(vocab),
                      embed_dim=64, hidden_dim=64, atten_dim=64,
                      enc_dim=feat_dim, num_heads=4, num_refine_layers=2,
                      enc_img_size=6)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    if args.model == "NIC":
        visual = {"features": jnp.asarray(feats[:, 0, :])}
    elif args.model.endswith("Spatial"):
        visual = {"spatial_feats": jnp.asarray(feats)}
    else:
        visual = {"bu_feats": jnp.asarray(feats),
                  "bu_masks": jnp.ones((n_img, n_box), jnp.float32)}

    import optax
    tx = optax.chain(optax.clip(0.1), optax.adam(4e-3))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rng):
        def loss_fn(p):
            enc, _ = model.encode(p, visual, train=True, rng=rng)
            logits = decode.teacher_forced_logits(
                model, p, enc, jnp.asarray(caps, jnp.int32), 0.0, rng)
            mask = xe_mask_from_lengths(jnp.asarray(lens), t_max - 1)
            return label_smoothing_loss(logits, jnp.asarray(caps[:, 1:]),
                                        mask, 0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first_loss = None
    loss = None                      # --steps 0 = decode-only run
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if step == 0:
            first_loss = float(loss)
            print("step 0 loss %.4f (compile %.1fs)" % (loss, time.time() - t0))
        elif step % 10 == 0 or step == args.steps - 1:
            print("step %d loss %.4f" % (step, float(loss)))
    final_loss = float(loss) if loss is not None else float("nan")

    enc, _ = model.encode(params, visual, train=False)
    greedy_ids, _ = decode.greedy(model, params, enc, max_len=9)
    beam_ids = decode.beam_search(model, params, enc, beam_size=3, max_steps=12)

    gts, res_g, res_b = {}, [], []
    n_correct = 0
    for i in range(n_img):
        truth = " ".join(phrases[cls[i]])
        g = " ".join(vocab.decode_ids(np.asarray(greedy_ids[i])))
        b = " ".join(vocab.decode_ids(np.asarray(beam_ids[i])))
        gts[i] = [truth]
        res_g.append({"image_id": i, "caption": [g]})
        res_b.append({"image_id": i, "caption": [b]})
        n_correct += int(g == truth)
        if i < 4:
            print("img %d gt=%r greedy=%r beam=%r" % (i, truth, g, b))
    cider_g, _ = CiderD(df="corpus").compute_score(gts, res_g)
    cider_b, _ = CiderD(df="corpus").compute_score(gts, res_b)
    bleu, _ = Bleu(4).compute_score(gts, {e["image_id"]: e["caption"]
                                          for e in res_b})
    print("loss %.4f -> %.4f | greedy exact-match %d/%d | "
          "CIDEr-D greedy %.2f beam %.2f | BLEU-4 %.3f"
          % (first_loss, final_loss, n_correct, n_img,
             cider_g, cider_b, bleu[3]))
    ok = final_loss < first_loss * 0.7 and n_correct >= n_img // 2
    print("DEMO_RESULT:", "OK" if ok else "WEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
