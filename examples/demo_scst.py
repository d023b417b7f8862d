"""SCST smoke demo through the public engine-steps surface.

Pre-trains a tiny BUTDDetection captioner with a few XE steps on synthetic
data, then runs SCST self-critical steps (greedy baseline + multinomial
rollout + on-device CIDEr-D reward, all one jitted program per step —
engine/steps.py) and checks the CIDEr-D score of the greedy policy improves.

    python examples/demo_scst.py [--xe_steps 40] [--scst_steps 40]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops.cider import (CiderDTable, RewardVocab,
                                                 cider_d_device,
                                                 seq_length_greedy)
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.vocab import build_vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xe_steps", type=int, default=100)
    ap.add_argument("--scst_steps", type=int, default=60)
    ap.add_argument("--scst_lr", type=float, default=1e-4)
    args = ap.parse_args()
    print("devices:", jax.devices())

    phrases = [["a", "man", "rides", "a", "horse"],
               ["a", "dog", "runs", "on", "the", "beach"],
               ["two", "birds", "fly", "over", "water"],
               ["a", "red", "car", "parked", "outside"]]
    vocab = build_vocab(phrases * 5, threshold=1)
    reward_vocab = RewardVocab(vocab)

    rng = np.random.default_rng(0)
    n_img, n_box, feat_dim, t_max = 32, 16, 64, 10
    feats = rng.normal(size=(n_img, n_box, feat_dim)).astype(np.float32)
    cls = rng.integers(0, len(phrases), size=(n_img,))
    feats[:, 0, :4] = np.eye(4, dtype=np.float32)[cls] * 5.0
    caps = np.zeros((n_img, t_max), np.int32)
    lens = np.zeros((n_img,), np.int32)
    ref_ids = np.zeros((n_img, 5, 12), np.int32)
    ref_lens = np.zeros((n_img, 5), np.int32)
    for i in range(n_img):
        ids = vocab.encode_tokens(phrases[cls[i]])
        caps[i, :len(ids)] = ids
        lens[i] = len(ids)
        enc = reward_vocab.encode(phrases[cls[i]])
        ref_ids[i, 0, :len(enc)] = enc
        ref_lens[i, 0] = len(enc)
    table = CiderDTable.from_ref_corpus(
        [[reward_vocab.encode(p)] for p in phrases])
    table_dev = table.device_arrays()

    cfg = ModelConfig(model_type="BUTDDetection", vocab_size=len(vocab),
                      embed_dim=64, hidden_dim=64, atten_dim=64,
                      enc_dim=feat_dim)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    labels = model.param_labels(params)
    visual = {"bu_feats": jnp.asarray(feats),
              "bu_masks": jnp.ones((n_img, n_box), jnp.float32)}
    batch = {"visual": visual, "captions": jnp.asarray(caps),
             "lengths": jnp.asarray(lens)}

    # ---- XE pre-train -------------------------------------------------------
    tx = make_grad_transform("Adam", 0.1)
    state = TrainState.create(params, tx)
    xe = S.make_xe_train_step(model, tx, labels)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    m = None                         # --xe_steps 0 = SCST from random init
    for step in range(args.xe_steps):
        key, sub = jax.random.split(key)
        state, m = xe(state, batch, sub, 0.0, 4e-3, 0.0)
        if step == 0:
            print("xe step 0 loss %.4f (compile %.1fs)"
                  % (float(m["loss"]), time.time() - t0))
    if m is not None:
        print("xe final loss %.4f" % float(m["loss"]))

    def greedy_cider(params):
        enc, _ = model.encode(params, visual, train=False)
        ids, _ = decode.greedy(model, params, enc, max_len=9)
        scores = cider_d_device(table_dev, table.probe, ids,
                                seq_length_greedy(ids),
                                jnp.asarray(ref_ids), jnp.asarray(ref_lens))
        return float(jnp.mean(scores))

    cider_before = greedy_cider(state.params)

    # ---- SCST ---------------------------------------------------------------
    tx2 = make_grad_transform("Adam", 0.25)
    state = TrainState.create(state.params, tx2)
    scst = S.make_scst_train_step(model, tx2, labels, table_dev, table.probe,
                                  max_len=9)
    scst_batch = {"visual": visual, "ref_ids": jnp.asarray(ref_ids),
                  "ref_lens": jnp.asarray(ref_lens)}
    t0 = time.time()
    rewards = []
    for step in range(args.scst_steps):
        key, sub = jax.random.split(key)
        state, m = scst(state, scst_batch, sub, args.scst_lr, 0.0)
        rewards.append(float(m["reward"]))
        if step == 0:
            print("scst step 0 reward %.4f (compile %.1fs)"
                  % (rewards[0], time.time() - t0))
        elif step % 10 == 0 or step == args.scst_steps - 1:
            print("scst step %d reward %.4f" % (step, rewards[-1]))
    steps_per_sec = args.scst_steps / (time.time() - t0)
    cider_after = greedy_cider(state.params)

    print("greedy CIDEr-D before SCST %.3f -> after %.3f | "
          "%.2f SCST steps/sec (batch %d, fully on-device reward)"
          % (cider_before, cider_after, steps_per_sec, n_img))
    # success: rewards trend up (sample closes the gap to greedy) and the
    # greedy policy doesn't collapse
    trend_up = np.mean(rewards[-10:]) > np.mean(rewards[:10])
    ok = (trend_up and cider_after >= 0.8 * cider_before
          and np.isfinite(rewards).all())
    print("DEMO_RESULT:", "OK" if ok else "WEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
