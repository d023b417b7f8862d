"""Decode-engine consistency properties:

* beam_size=1 must reproduce greedy decoding exactly up to the first <end>
  (same argmax path — a strong structural check on the beam bookkeeping);
* decoding is deterministic across calls;
* beam scores are monotone in beam size on the winning sequence's logprob
  (a larger beam can only find an equal-or-better finished sequence under
  the raw-cumulative-logprob selection rule).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu import END_ID, STA_ID
from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode

B = 5
V = 19


@pytest.fixture(params=["NIC", "BUTDSpatial", "AoADetection"])
def model_setup(request, rng):
    mt = request.param
    cfg = ModelConfig(model_type=mt, vocab_size=V, embed_dim=12,
                      hidden_dim=12, atten_dim=8, enc_dim=6, enc_img_size=2,
                      num_heads=4, num_refine_layers=1)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(3), include_cnn=False)
    if mt == "NIC":
        visual = {"features": jnp.asarray(rng.normal(size=(B, 6)),
                                          jnp.float32)}
    elif mt == "BUTDSpatial":
        visual = {"spatial_feats": jnp.asarray(rng.normal(size=(B, 4, 6)),
                                               jnp.float32)}
    else:
        visual = {"bu_feats": jnp.asarray(rng.normal(size=(B, 4, 6)),
                                          jnp.float32),
                  "bu_masks": jnp.ones((B, 4))}
    enc, _ = model.encode(params, visual, train=False)
    return model, params, enc


def _trim(row):
    out = []
    for t in row:
        out.append(int(t))
        if t == END_ID:
            break
    return out


def test_beam1_equals_greedy(model_setup):
    model, params, enc = model_setup
    g_ids, _ = decode.greedy(model, params, enc, max_len=12)
    b_ids = decode.beam_search(model, params, enc, beam_size=1, max_steps=12)
    g = np.asarray(g_ids)
    b = np.asarray(b_ids)[:, 1:]          # beam output column 0 is <sta>
    for i in range(B):
        gt = _trim(g[i])
        bt = _trim(b[i][:len(gt)])
        assert bt == gt, (i, gt, bt)


def test_decode_deterministic(model_setup):
    model, params, enc = model_setup
    a1, _ = decode.greedy(model, params, enc, max_len=10)
    a2, _ = decode.greedy(model, params, enc, max_len=10)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    b1 = decode.beam_search(model, params, enc, beam_size=3, max_steps=10)
    b2 = decode.beam_search(model, params, enc, beam_size=3, max_steps=10)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def _seq_logprob(model, params, enc, ids_row, sample_idx):
    """Cumulative logprob of a <sta>-prefixed id row under the model."""
    one = jax.tree_util.tree_map(
        lambda x: x[sample_idx:sample_idx + 1], enc)
    state = model.init_state(params, one)
    total = 0.0
    prev = ids_row[0]
    for t in range(1, len(ids_row)):
        logits, state, _ = model.step(
            params, one, state, jnp.asarray([prev], jnp.int32), train=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total += float(logp[0, int(ids_row[t])])
        prev = int(ids_row[t])
        if prev == END_ID:
            break
    return total


def test_larger_beam_never_worse(model_setup):
    model, params, enc = model_setup
    b1 = np.asarray(decode.beam_search(model, params, enc, beam_size=1,
                                       max_steps=10))
    b4 = np.asarray(decode.beam_search(model, params, enc, beam_size=4,
                                       max_steps=10))
    for i in range(B):
        lp1 = _seq_logprob(model, params, enc, _trim_sta(b1[i]), i)
        lp4 = _seq_logprob(model, params, enc, _trim_sta(b4[i]), i)
        assert lp4 >= lp1 - 1e-4, (i, lp1, lp4)


def _trim_sta(row):
    out = [int(row[0])]
    for t in row[1:]:
        out.append(int(t))
        if t == END_ID:
            break
    return out


# ---------------------------------------------------------------------------
# hoisted prediction head (teacher forcing)
# ---------------------------------------------------------------------------

def _teacher_forced_inline(model, params, enc, captions, ss_prob, rng):
    """Non-hoisted reference: full model.step (head applied in-scan),
    mirroring the pre-hoist implementation step by step."""
    b, t_total = captions.shape
    n = t_total - 1
    state = model.init_state(params, enc)
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    prev_logits = jnp.zeros((b, model.config.vocab_size), enc.mean.dtype)
    outs = []
    for t in range(n):
        gt = captions[:, t]
        if rng is not None:
            r_ss, r_draw, r_step = jax.random.split(rngs[t], 3)
            use_model = ((jax.random.uniform(r_ss, (b,))
                          < jnp.float32(ss_prob)) & (t >= 2))
            # shared sampler with the production scan (see note in
            # _sample_rl_inline)
            drawn = decode._categorical(r_draw, prev_logits)
            tok = jnp.where(use_model, drawn, gt)
        else:
            r_step, tok = None, gt
        logits, state, _ = model.step(params, enc, state, tok,
                                      train=rng is not None, rng=r_step)
        prev_logits = logits
        outs.append(logits)
    return jnp.stack(outs, axis=1)


@pytest.mark.parametrize("ss", [0.0, 0.7])
def test_teacher_forcing_matches_inline_reference(model_setup, rng, ss):
    """The hoisted-head scan must reproduce the per-step implementation:
    same logits (incl. identical scheduled-sampling draws) and same
    gradients wrt every param."""
    model, params, enc = model_setup
    caps = jnp.asarray(rng.integers(4, V, size=(B, 7)), jnp.int32)
    caps = caps.at[:, 0].set(1)
    key = jax.random.PRNGKey(11) if ss > 0 else None

    def loss_hoisted(p):
        lg = decode.teacher_forced_logits(model, p, enc, caps, ss, key,
                                          train=ss > 0)
        return jnp.sum(jax.nn.log_softmax(lg.astype(jnp.float32)) ** 2)

    def loss_inline(p):
        lg = _teacher_forced_inline(model, p, enc, caps, ss, key)
        return jnp.sum(jax.nn.log_softmax(lg.astype(jnp.float32)) ** 2)

    v1, g1 = jax.value_and_grad(loss_hoisted)(params)
    v2, g2 = jax.value_and_grad(loss_inline)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def _sample_rl_inline(model, params, enc, max_len, rng):
    """Pre-hoist reference: full model.step per timestep, logp in-scan."""
    b = enc.mean.shape[0]
    state = model.init_state(params, enc)
    tok = jnp.full((b,), STA_ID, jnp.int32)
    unfinished = jnp.ones((b,), jnp.bool_)
    rngs = jax.random.split(rng, max_len)
    seqs, logps = [], []
    for t in range(max_len):
        r_step, r_draw = jax.random.split(rngs[t])
        logits, state, _ = model.step(params, enc, state, tok,
                                      train=True, rng=r_step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # decode._categorical, not jax.random.categorical: this A/B pins
        # the head HOIST, so both sides must share the sampler (the fast
        # Gumbel path draws a different — equally valid — bit stream)
        drawn = decode._categorical(r_draw, logits)
        tok_logp = jnp.take_along_axis(logp, drawn[:, None], axis=-1)[:, 0]
        unfinished = unfinished & (drawn != END_ID)
        tok = drawn * unfinished.astype(jnp.int32)
        seqs.append(tok)
        logps.append(tok_logp)
    return jnp.stack(seqs, 1), jnp.stack(logps, 1)


def test_sample_rl_matches_inline_reference(model_setup):
    """The hoisted-head rollout must draw the SAME token sequence as the
    per-step formulation, record logprobs equal to tiling ulps, and give
    matching REINFORCE gradients."""
    model, params, enc = model_setup
    key = jax.random.PRNGKey(5)

    def loss_hoisted(p):
        seq, logp = decode.sample_rl(model, p, enc, 7, key, train=True)
        return jnp.sum(logp * (seq != 0)), seq

    def loss_inline(p):
        seq, logp = _sample_rl_inline(model, p, enc, 7, key)
        return jnp.sum(logp * (seq != 0)), seq

    (v1, seq1), g1 = jax.value_and_grad(loss_hoisted, has_aux=True)(params)
    (v2, seq2), g2 = jax.value_and_grad(loss_inline, has_aux=True)(params)
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=1e-5)


def test_scan_unroll_is_numerics_neutral(model_setup, monkeypatch):
    """SICZ_TPU_SCAN_UNROLL replicates the scan body so XLA can share
    weight fetches across adjacent timesteps (multi-timestep
    weight-stationary training); it must not change losses, drawn
    sequences, or gradients."""
    model, params, enc = model_setup
    key = jax.random.PRNGKey(11)
    caps = jax.random.randint(jax.random.PRNGKey(12), (B, 9), 0, V)

    def xe_loss(p):
        logits = decode.teacher_forced_logits(model, p, enc, caps,
                                              ss_prob=0.2, rng=key)
        return jnp.sum(jax.nn.log_softmax(logits, -1)[..., 1])

    def rl_loss(p):
        seq, logp = decode.sample_rl(model, p, enc, 7, key, train=True)
        return jnp.sum(logp * (seq != 0)), seq

    outs = {}
    for unroll in ("1", "4"):
        monkeypatch.setenv("SICZ_TPU_SCAN_UNROLL", unroll)
        v_xe, g_xe = jax.value_and_grad(xe_loss)(params)
        (v_rl, seq), g_rl = jax.value_and_grad(rl_loss, has_aux=True)(params)
        outs[unroll] = (v_xe, g_xe, v_rl, seq, g_rl)
    np.testing.assert_allclose(float(outs["1"][0]), float(outs["4"][0]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(outs["1"][3]),
                                  np.asarray(outs["4"][3]))
    np.testing.assert_allclose(float(outs["1"][2]), float(outs["4"][2]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves((outs["1"][1], outs["1"][4])),
                     jax.tree_util.tree_leaves((outs["4"][1], outs["4"][4]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=1e-5)


def test_scan_unroll_per_regime_defaults(monkeypatch):
    """The round-4 sweep measured SCST +7% at unroll=4 and XE regressing
    under any unroll, so the defaults are per-regime (VERDICT r4 #3); the
    global sweep knob still overrides both, a per-regime knob one."""
    for var in ("SICZ_TPU_SCAN_UNROLL", "SICZ_TPU_SCAN_UNROLL_XE",
                "SICZ_TPU_SCAN_UNROLL_SCST"):
        monkeypatch.delenv(var, raising=False)
    assert decode._scan_unroll("xe") == 1
    assert decode._scan_unroll("scst") == 4
    monkeypatch.setenv("SICZ_TPU_SCAN_UNROLL", "2")
    assert decode._scan_unroll("xe") == 2
    assert decode._scan_unroll("scst") == 2
    monkeypatch.setenv("SICZ_TPU_SCAN_UNROLL_XE", "3")
    assert decode._scan_unroll("xe") == 3
    assert decode._scan_unroll("scst") == 2
    monkeypatch.setenv("SICZ_TPU_SCAN_UNROLL_SCST", "bogus")
    assert decode._scan_unroll("scst") == 2   # bad value: next var wins


def test_tf_input_hoist_matches_in_scan_path(model_setup):
    """ss_active=False engages the weight-stationary teacher-forcing path
    (Captioner.tf_inputs: embeddings + their dropout + input projection
    hoisted out of the scan); ss_active=True with ss_prob=0 runs the
    classic in-scan formulation with the same effective token stream.
    Losses and grads must match to matmul-tiling ulps — this locks the
    out-of-scan dropout replay to step_core's in-step rng discipline."""
    model, params, enc = model_setup
    key = jax.random.PRNGKey(7)
    caps = jax.random.randint(jax.random.PRNGKey(8), (B, 9), 0, V)

    def loss(p, ss_active):
        lg = decode.teacher_forced_logits(model, p, enc, caps, 0.0, key,
                                          train=True, ss_active=ss_active)
        return jnp.sum(jax.nn.log_softmax(lg.astype(jnp.float32)) ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_interpret_mode_disables_weight_stationary_hoists(monkeypatch, rng):
    """SICZ_TPU_PALLAS_LSTM=interpret is the one spelling that forces the
    fused kernel; the weight-stationary hoists (which route around
    lstm_cell entirely) must stand down so the switch is honored — and the
    un-hoisted paths must produce the same decode."""
    from simpleimagecaptionzoo_tpu.models import layers as L
    cfg = ModelConfig(model_type="BUTDSpatial", vocab_size=V, embed_dim=12,
                      hidden_dim=12, atten_dim=8, enc_dim=6, enc_img_size=2)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(3), include_cnn=False)
    visual = {"spatial_feats": jnp.asarray(rng.normal(size=(B, 4, 6)),
                                           jnp.float32)}

    enc, _ = model.encode(params, visual, train=False)
    assert "td_mean_gates" in enc.extras           # hoist on by default
    assert model.tf_inputs(params, enc, jnp.zeros((3, B), jnp.int32),
                           None) is not None
    g_default, _ = decode.greedy(model, params, enc, max_len=12)

    monkeypatch.setenv("SICZ_TPU_PALLAS_LSTM", "interpret")
    assert not L.hoist_lstm_inputs(params["lstm_td"])
    enc_i, _ = model.encode(params, visual, train=False)
    assert "td_mean_gates" not in enc_i.extras     # hoist stands down
    assert model.tf_inputs(params, enc_i, jnp.zeros((3, B), jnp.int32),
                           None) is None
    # tiny dims fail pallas supported(); the jnp full-concat cell runs —
    # decode must agree with the hoisted path bit-for-bit
    g_interp, _ = decode.greedy(model, params, enc_i, max_len=12)
    np.testing.assert_array_equal(np.asarray(g_default),
                                  np.asarray(g_interp))
