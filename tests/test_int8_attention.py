"""Int8 K/V attention (ops/int8_attention.py): row quantization, interpret-
mode kernel vs jnp fallback, fidelity vs the bf16 attention path, and the
AoA int8-decode wiring (quantized extras + beam decode end to end)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode, int8_attention as IA

B, K, N, D, H = 8, 3, 5, 256, 2      # dh = 128 (kernel-eligible)


def test_quantize_rows_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 7, 64)), jnp.float32)
    q, s = IA.quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 7)
    back = q.astype(jnp.float32) * s[..., None]
    err = np.max(np.abs(np.asarray(back - x)))
    assert err <= float(np.max(np.asarray(s))) * 0.51     # half-ulp of int8
    zq, zs = IA.quantize_rows(jnp.zeros((2, 3, 8)))
    np.testing.assert_array_equal(np.asarray(zq), 0)


@pytest.fixture()
def attn_inputs(rng):
    q = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    vv = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    kq, ks = IA.quantize_rows(kv)
    vq, vs = IA.quantize_rows(vv)
    mask = jnp.ones((B, N)).at[0, 3:].set(0.0).at[2, 4:].set(0.0)
    return q, kv, vv, kq, ks, vq, vs, mask


def test_kernel_matches_fallback(attn_inputs, monkeypatch):
    q, _, _, kq, ks, vq, vs, mask = attn_inputs
    monkeypatch.setenv("SICZ_TPU_INT8_KV", "interpret")
    assert IA.supported(B, K, N, D, H)
    out_k, p_k = IA.lanes_attention_int8(q, kq, ks, vq, vs, mask, H)
    monkeypatch.setenv("SICZ_TPU_INT8_KV", "off")
    out_f, p_f = IA.lanes_attention_int8(q, kq, ks, vq, vs, mask, H)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_f),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_f), atol=2e-6)
    # masked rows get zero attention
    assert np.all(np.asarray(p_k)[0, :, 3:] == 0.0)


def test_int8_attention_close_to_full_precision(attn_inputs, monkeypatch):
    """Same attention math on dequantized K/V must track the bf16/f32
    reference within int8 quantization tolerance."""
    import math
    q, kv, vv, kq, ks, vq, vs, mask = attn_inputs
    monkeypatch.setenv("SICZ_TPU_INT8_KV", "interpret")
    out_q, p_q = IA.lanes_attention_int8(q, kq, ks, vq, vs, mask, H)
    # full-precision reference
    dh = D // H
    q4 = q.reshape(B, K, H, dh)
    k4 = kv.reshape(B, N, H, dh)
    v4 = vv.reshape(B, N, H, dh)
    scores = jnp.einsum("bqhd,bnhd->bhqn", q4, k4) / math.sqrt(dh)
    scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhqn,bnhd->bqhd", p, v4).reshape(B, K, D)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_aoa_int8_decode_end_to_end(rng, monkeypatch):
    """Quantized decode params -> encode stores int8 extras; greedy + beam
    run through the int8 attention path and produce sequences close to the
    full-precision decode (identical on a random model at these sizes)."""
    monkeypatch.setenv("SICZ_TPU_INT8_KV", "interpret")
    monkeypatch.setenv("SICZ_TPU_PALLAS_QUANT", "off")  # cpu: jnp dequant
    cfg = ModelConfig(model_type="AoADetection", vocab_size=61,
                      embed_dim=32, hidden_dim=D, enc_dim=24, num_heads=H,
                      num_refine_layers=2, max_bu_len=N)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    feats = jnp.asarray(rng.normal(size=(B, N, 24)), jnp.float32)
    mask = jnp.ones((B, N))
    visual = {"bu_feats": feats, "bu_masks": mask}

    enc_fp, _ = model.encode(params, visual)
    assert "k_proj" in enc_fp.extras
    qparams = model.quantize_decode_params(params)
    enc_q, _ = model.encode(qparams, visual)
    assert "k_q" in enc_q.extras and enc_q.extras["k_q"].dtype == jnp.int8

    ids_fp = np.asarray(decode.greedy(model, params, enc_fp, max_len=8)[0])
    ids_q = np.asarray(decode.greedy(model, qparams, enc_q, max_len=8)[0])
    assert ids_q.shape == ids_fp.shape
    # int8 is an approximation; on a random tiny model the argmax stream
    # should still match almost everywhere
    agree = float((ids_q == ids_fp).mean())
    assert agree >= 0.9, agree

    beam_q = np.asarray(decode.beam_search(model, qparams, enc_q,
                                           beam_size=2, max_steps=6))
    assert beam_q.shape == (B, 7)


def test_aoa_int8_extras_wide_beam_dequant_fallback(rng, monkeypatch):
    """Encode gates int8 storage on k<=4, but a decode can run a wider
    shape the kernel rejects; _attend must then dequantize ONCE to the
    query dtype (bf16-extras behavior) rather than ride the jnp fallback's
    materialized-f32 copy.  Locked by forcing supported() False and
    asserting bit-equality with a decode over pre-dequantized extras."""
    monkeypatch.setenv("SICZ_TPU_INT8_KV", "interpret")
    monkeypatch.setenv("SICZ_TPU_PALLAS_QUANT", "off")
    cfg = ModelConfig(model_type="AoADetection", vocab_size=61,
                      embed_dim=32, hidden_dim=D, enc_dim=24, num_heads=H,
                      num_refine_layers=2, max_bu_len=N)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    feats = jnp.asarray(rng.normal(size=(B, N, 24)), jnp.float32)
    visual = {"bu_feats": feats, "bu_masks": jnp.ones((B, N))}
    qparams = model.quantize_decode_params(params)
    enc_q, _ = model.encode(qparams, visual)
    assert "k_q" in enc_q.extras

    ex = enc_q.extras
    deq = {"k_proj": ex["k_q"].astype(jnp.float32)
           * ex["k_s"][..., None].astype(jnp.float32),
           "v_proj": ex["v_q"].astype(jnp.float32)
           * ex["v_s"][..., None].astype(jnp.float32)}
    import dataclasses
    enc_deq = dataclasses.replace(enc_q, extras=deq)

    monkeypatch.setattr(IA, "supported",
                        lambda *a, **kw: False)
    ids_fb = np.asarray(decode.beam_search(model, qparams, enc_q,
                                           beam_size=5, max_steps=6))
    ids_deq = np.asarray(decode.beam_search(model, qparams, enc_deq,
                                            beam_size=5, max_steps=6))
    np.testing.assert_array_equal(ids_fb, ids_deq)
