"""Fused head->log-softmax->top-k kernel (ops/fused_head.py): interpret-mode
kernel vs the jnp fallback vs plain materialized-logits math, and the fused
beam/greedy decode formulations vs the classic ones."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode, fused_head, quant

H, V, M, K = 64, 1000, 16, 3


@pytest.fixture()
def head(rng):
    return {"v": jnp.asarray(rng.normal(size=(H, V)), jnp.float32),
            "g": jnp.asarray(rng.uniform(0.5, 2.0, V), jnp.float32),
            "b": jnp.asarray(rng.normal(size=V), jnp.float32)}


@pytest.fixture()
def x(rng):
    return jnp.asarray(rng.normal(size=(M, H)), jnp.float32)


def test_kernel_matches_fallback(head, x, monkeypatch):
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    vk, ik, lk = fused_head.topk_head(head, x, K)
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "off")
    vf, if_, lf = fused_head.topk_head(head, x, K)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(if_))
    np.testing.assert_allclose(np.asarray(vk), np.asarray(vf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lf), atol=1e-5)


def test_matches_materialized_logits(head, x, monkeypatch):
    """vals - lse must equal the top-k log-softmax of the plain head."""
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    vals, idx, lse = fused_head.topk_head(head, x, K)
    logits = L.dense_wn(head, x)
    ref_vals, ref_idx = jax.lax.top_k(logits, K)
    logp = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(vals - lse[:, None]),
        np.asarray(jnp.take_along_axis(logp, idx, axis=1)), atol=1e-5)
    # descending order, argmax in slot 0
    v = np.asarray(vals)
    assert np.all(np.diff(v, axis=1) <= 1e-7)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_int8_head_kernel_matches_fallback(head, x, monkeypatch):
    qh = quant.quantize_dense_wn(head)
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    vk, ik, lk = fused_head.topk_head(qh, x, K)
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "off")
    vf, if_, lf = fused_head.topk_head(qh, x, K)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(if_))
    np.testing.assert_allclose(np.asarray(vk), np.asarray(vf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lf), atol=1e-5)


def test_tie_resolution_matches_lax_top_k(monkeypatch):
    """Duplicate logit values must resolve to the smallest vocab index,
    like lax.top_k — across tile boundaries too."""
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    v = 2 * fused_head.V_TILE
    w = np.zeros((8, v), np.float32)     # dense layout (in, out): in = 8
    # same winning value in tile 0 and tile 1 for every row
    w[:, 7] = 3.0
    w[:, fused_head.V_TILE + 11] = 3.0
    w[:, 100] = 1.0
    head = {"w": jnp.asarray(w)}
    x = jnp.eye(8, dtype=jnp.float32)    # row i selects w[i, :]
    vals, idx, lse = fused_head.topk_head(head, x, 3)
    logits = x @ jnp.asarray(w)
    ref_vals, ref_idx = jax.lax.top_k(logits, 3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def _aoa_setup(rng, b):
    cfg = ModelConfig(model_type="AoADetection", vocab_size=57, embed_dim=32,
                      hidden_dim=32, enc_dim=24, num_heads=2,
                      num_refine_layers=2, max_bu_len=5)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    feats = jnp.asarray(rng.normal(size=(b, 5, 24)), jnp.float32)
    mask = jnp.ones((b, 5))
    enc, _ = model.encode(params, {"bu_feats": feats, "bu_masks": mask})
    return model, params, enc


def test_fused_beam_matches_classic(rng, monkeypatch):
    model, params, enc = _aoa_setup(rng, 8)
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "off")
    ids_classic = np.asarray(decode.beam_search(model, params, enc,
                                                beam_size=2, max_steps=8))
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    assert fused_head.enabled(params["predict"], 16, 2, jnp.float32)
    ids_fused = np.asarray(decode.beam_search(model, params, enc,
                                              beam_size=2, max_steps=8))
    np.testing.assert_array_equal(ids_fused, ids_classic)


def test_fused_greedy_matches_classic(rng, monkeypatch):
    model, params, enc = _aoa_setup(rng, 8)
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "off")
    ids_classic = np.asarray(decode.greedy(model, params, enc,
                                           max_len=8)[0])
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    ids_fused = np.asarray(decode.greedy(model, params, enc, max_len=8)[0])
    np.testing.assert_array_equal(ids_fused, ids_classic)


def test_unsupported_rows_fall_back(head, rng, monkeypatch):
    """m not divisible by the row minimum (e.g. the sample op's b=1) must
    silently take the fallback and still be correct."""
    monkeypatch.setenv("SICZ_TPU_FUSED_HEAD", "interpret")
    x1 = jnp.asarray(rng.normal(size=(3, H)), jnp.float32)
    assert not fused_head.enabled(head, 3, K, jnp.float32)
    vals, idx, lse = fused_head.topk_head(head, x1, K)
    logits = L.dense_wn(head, x1)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(jax.lax.top_k(logits, K)[1]))
