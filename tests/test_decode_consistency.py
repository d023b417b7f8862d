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

from simpleimagecaptionzoo_tpu import END_ID
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
