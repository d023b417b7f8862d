"""Model step-function shape/jit tests + decode-engine semantics tests,
including exact-parity of the batched beam search against a Python
re-enactment of the reference's shrinking-k algorithm
(NIC_Model.py:153-212)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu import END_ID, STA_ID
from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.ops.losses import (label_smoothing_loss,
                                                  reward_criterion,
                                                  xe_mask_from_lengths)

V = 23
B = 4


def tiny_config(model_type):
    return ModelConfig(model_type=model_type, vocab_size=V, embed_dim=16,
                       hidden_dim=16, atten_dim=12, enc_dim=10,
                       enc_img_size=3, num_heads=4, num_refine_layers=2)


def make_visual(model_type, rng):
    if model_type == "NIC":
        return {"features": jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)}
    if model_type.endswith("Spatial"):
        return {"spatial_feats": jnp.asarray(rng.normal(size=(B, 9, 10)),
                                             jnp.float32)}
    mask = np.ones((B, 6), np.float32)
    mask[0, 4:] = 0
    mask[2, 3:] = 0
    return {"bu_feats": jnp.asarray(rng.normal(size=(B, 6, 10)), jnp.float32),
            "bu_masks": jnp.asarray(mask)}


ALL_MODELS = ["NIC", "BUTDSpatial", "BUTDDetection", "AoASpatial",
              "AoADetection"]


@pytest.mark.parametrize("model_type", ALL_MODELS)
def test_step_and_decodes(model_type, rng):
    cfg = tiny_config(model_type)
    model = get_captioner(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, include_cnn=False) \
        if model_type != "NIC" else model.init_params(key, include_cnn=False)
    visual = make_visual(model_type, rng)
    enc, _ = model.encode(params, visual, train=False)
    mean_dim = {"NIC": cfg.embed_dim, "BUTDSpatial": cfg.enc_dim,
                "BUTDDetection": cfg.enc_dim, "AoASpatial": cfg.hidden_dim,
                "AoADetection": cfg.hidden_dim}[model_type]
    assert enc.mean.shape == (B, mean_dim)

    # teacher forcing
    caps = jnp.asarray(rng.integers(4, V, size=(B, 8)), jnp.int32)
    caps = caps.at[:, 0].set(STA_ID)
    logits = decode.teacher_forced_logits(model, params, enc, caps,
                                          ss_prob=0.2,
                                          rng=jax.random.PRNGKey(1))
    assert logits.shape == (B, 7, V)
    lengths = jnp.asarray([7, 5, 6, 4])
    mask = xe_mask_from_lengths(lengths, 7)
    loss = label_smoothing_loss(logits, caps[:, 1:], mask, smoothing=0.1)
    assert np.isfinite(float(loss))

    # greedy
    ids, alphas = decode.greedy(model, params, enc, max_len=6)
    assert ids.shape == (B, 6)
    if alphas is not None:
        assert alphas.shape[0] == B and alphas.shape[1] == 6

    # multinomial rollout
    seq, logp = decode.sample_rl(model, params, enc, max_len=6,
                                 rng=jax.random.PRNGKey(2), train=False)
    assert seq.shape == (B, 6) and logp.shape == (B, 6)
    # ids after <end> must be zero
    seq_np = np.asarray(seq)
    for b in range(B):
        done = False
        for t in range(6):
            if done:
                assert seq_np[b, t] == 0
            if seq_np[b, t] == 0:
                done = True
    rl_loss = reward_criterion(logp, seq, jnp.ones((B,)))
    assert np.isfinite(float(rl_loss))

    # beam search
    beams = decode.beam_search(model, params, enc, beam_size=3, max_steps=8)
    assert beams.shape == (B, 9)
    assert np.all(np.asarray(beams)[:, 0] == STA_ID)


def _reference_beam(step_logp_fn, init_state_fn, k, max_steps):
    """Faithful Python re-enactment of the reference's per-sentence beam
    search (NIC_Model.py:153-212) on top of an arbitrary step function.

    step_logp_fn(state, tokens (s,)) -> (logp (s, V), new_state)
    state: dict of numpy arrays with leading dim s (gatherable).
    """
    state = init_state_fn(k)
    prev_words = np.full((k,), STA_ID, np.int64)
    seqs = prev_words[:, None].copy()
    top_k_scores = np.zeros((k,))
    complete_seqs, complete_scores = [], []
    step = 1
    while step <= max_steps:
        logp, state = step_logp_fn(state, prev_words)
        scores = top_k_scores[:, None] + logp
        if step == 1:
            flat = scores[0]
            idx = np.argsort(-flat, kind="stable")[:k]
            top_k_scores, top_k_words = flat[idx], idx
        else:
            flat = scores.reshape(-1)
            idx = np.argsort(-flat, kind="stable")[:k]
            top_k_scores, top_k_words = flat[idx], idx
        prev_inds = top_k_words // logp.shape[1]
        next_inds = top_k_words % logp.shape[1]
        seqs = np.concatenate([seqs[prev_inds], next_inds[:, None]], axis=1)
        incomplete = [i for i, w in enumerate(next_inds) if w != END_ID]
        complete = [i for i in range(len(next_inds)) if i not in incomplete]
        if complete:
            complete_seqs.extend(seqs[complete].tolist())
            complete_scores.extend(top_k_scores[complete].tolist())
        k -= len(complete)
        if k == 0:
            break
        seqs = seqs[incomplete]
        state = {kk: v[prev_inds[incomplete]] for kk, v in state.items()}
        top_k_scores = top_k_scores[incomplete]
        prev_words = next_inds[incomplete]
        step += 1
    if complete_seqs:
        best = int(np.argmax(complete_scores))
        return complete_seqs[best], complete_scores[best]
    best = int(np.argmax(top_k_scores))
    return seqs[best].tolist(), float(top_k_scores[best])


@pytest.mark.parametrize("model_type", ["NIC", "BUTDDetection", "AoADetection"])
@pytest.mark.parametrize("beam_size", [2, 3, 5])
def test_beam_parity_with_reference_algorithm(model_type, beam_size, rng):
    cfg = tiny_config(model_type)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(42), include_cnn=False)
    visual = make_visual(model_type, rng)
    enc, _ = model.encode(params, visual, train=False)
    max_steps = 10

    ours = np.asarray(decode.beam_search(model, params, enc,
                                         beam_size=beam_size,
                                         max_steps=max_steps))
    for b in range(B):
        enc_b = jax.tree_util.tree_map(lambda x: x[b:b + 1], enc)

        def init_state_fn(k):
            enc_k = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (k,) + x.shape[1:]), enc_b)
            st = model.init_state(params, enc_k)
            return {kk: np.asarray(v) for kk, v in st.items()}

        def step_logp_fn(state, tokens):
            s = tokens.shape[0]
            enc_k = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (s,) + x.shape[1:]), enc_b)
            st = {kk: jnp.asarray(v) for kk, v in state.items()}
            logits, new_st, _ = model.step(params, enc_k, st,
                                           jnp.asarray(tokens, jnp.int32))
            logp = np.asarray(jax.nn.log_softmax(logits, axis=-1),
                              np.float64)
            return logp, {kk: np.asarray(v) for kk, v in new_st.items()}

        ref_seq, _ = _reference_beam(step_logp_fn, init_state_fn,
                                     beam_size, max_steps)
        got = ours[b]
        got_trim = []
        for t in got:
            got_trim.append(int(t))
            if t == END_ID:
                break
        assert got_trim == [int(x) for x in ref_seq], (
            "beam mismatch sample %d: ours=%s ref=%s" % (b, got_trim, ref_seq))


def test_reward_criterion_sample_weight_excludes_filler_rows():
    """A padded final SCST batch must not deflate the gradient: filler rows
    (weight 0) are excluded from the mask-sum denominator, so the loss over
    [real rows + filler] equals the loss over real rows alone."""
    rng = np.random.default_rng(3)
    logp = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    seq = jnp.asarray(rng.integers(3, V, size=(4, 6)), jnp.int32)
    reward = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    full = reward_criterion(logp, seq, reward * w, sample_weight=w)
    real = reward_criterion(logp[:2], seq[:2], reward[:2])
    np.testing.assert_allclose(float(full), float(real), rtol=1e-6)


def test_greedy_pads_after_end():
    """Early-exit greedy decode (lax.while_loop) emits <pad> after a lane's
    first <end>, independent of how long other lanes keep the loop alive."""
    cfg = tiny_config("NIC")
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    rng = np.random.default_rng(0)
    visual = make_visual("NIC", rng)
    enc, _ = model.encode(params, visual, train=False)
    ids = np.asarray(decode.greedy(model, params, enc, max_len=15)[0])
    for row in ids:
        ends = np.flatnonzero(row == END_ID)
        if len(ends):
            assert (row[ends[0] + 1:] == 0).all()


@pytest.mark.parametrize("model_type", ALL_MODELS)
def test_step_lanes_matches_flat_step(model_type, rng):
    """The grouped-lanes step (shared-KV attention for AoA/BUTD, flattening
    default otherwise) must reproduce the per-lane flat step numerically —
    it is what beam search runs."""
    cfg = tiny_config(model_type)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    visual = make_visual(model_type, rng)
    enc, _ = model.encode(params, visual, train=False)
    k = 3
    state = model.init_lane_state(params, enc, k)
    toks = jnp.asarray(rng.integers(4, V, size=(B, k)), jnp.int32)

    logits, new_state, alpha = model.step_lanes(params, enc, state, toks,
                                                train=False)
    assert logits.shape == (B, k, V)

    # flat reference: lane j of sample i == step on the broadcast encoding
    from simpleimagecaptionzoo_tpu.models.base import (_broadcast_lanes,
                                                       _flatten_lanes)
    enc_flat = _flatten_lanes(_broadcast_lanes(enc, k))
    state_flat = jax.tree_util.tree_map(
        lambda s: s.reshape((B * k,) + s.shape[2:]), state)
    logits_f, state_f, alpha_f = model.step(params, enc_flat, state_flat,
                                            toks.reshape(-1), train=False)
    np.testing.assert_allclose(np.asarray(logits).reshape(B * k, V),
                               np.asarray(logits_f), rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state),
                    jax.tree_util.tree_leaves(state_f)):
        np.testing.assert_allclose(np.asarray(a).reshape(b.shape),
                                   np.asarray(b), rtol=2e-5, atol=2e-5)
    if alpha is not None:
        np.testing.assert_allclose(
            np.asarray(alpha).reshape(np.asarray(alpha_f).shape),
            np.asarray(alpha_f), rtol=2e-5, atol=2e-5)
