"""Weight-only int8 decode path (ops/quant.py).

Covers: the fused dequant-matmul kernel (interpret mode) against its jnp
fallback (same op order — only dot accumulation-order ulps may differ),
quantization error bounds, layer-library dispatch, and full greedy/beam
decode on quantized params for every model family.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode as D
from simpleimagecaptionzoo_tpu.ops import quant


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("SICZ_TPU_PALLAS_QUANT", "interpret")


def _dense(rng, k, n):
    return L.dense_init(rng, k, n)


@pytest.mark.parametrize("m,k,n,dtype", [
    (16, 256, 512, jnp.float32),      # aligned everywhere
    (32, 384, 640, jnp.bfloat16),     # K, N need padding (384%128=0, 640)
    (16, 100, 130, jnp.float32),      # K and N both unaligned
])
def test_kernel_matches_fallback_exactly(interpret_mode, monkeypatch,
                                         m, k, n, dtype):
    rng = jax.random.PRNGKey(0)
    p = _dense(rng, k, n)
    qp = quant.quantize_dense(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), dtype)
    out_kernel = quant.quant_matmul(x, qp)
    monkeypatch.setenv("SICZ_TPU_PALLAS_QUANT", "off")
    out_jnp = quant.quant_matmul(x, qp)
    assert out_kernel.dtype == dtype
    # same op order; only dot accumulation-order ulp noise may differ
    np.testing.assert_allclose(np.asarray(out_kernel, np.float32),
                               np.asarray(out_jnp, np.float32),
                               rtol=2e-6, atol=2e-6)


def test_quantization_error_bound():
    """Per-channel int8 on uniform weights: logits within ~1% relative."""
    rng = jax.random.PRNGKey(0)
    p = _dense(rng, 512, 1024)
    qp = quant.quantize_dense(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 512))
    ref = L.dense(p, x)
    out = quant.quant_matmul(x, qp)      # jnp fallback on CPU
    denom = np.maximum(np.abs(np.asarray(ref)), 1e-3)
    rel = np.abs(np.asarray(out) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.01, np.median(rel)


def test_dense_wn_quantization_matches_effective_weight():
    p = L.dense_wn_init(jax.random.PRNGKey(0), 256, 384)
    qp = quant.quantize_dense_wn(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256))
    ref = L.dense_wn(p, x)
    out = L.dense_wn(qp, x)              # dispatch through the layer fn
    denom = np.maximum(np.abs(np.asarray(ref)), 1e-3)
    assert np.median(np.abs(np.asarray(out) - np.asarray(ref)) / denom) < 0.01


def test_lstm_cell_quantized_dispatch():
    p = L.lstm_cell_init(jax.random.PRNGKey(0), 96, 128)
    qp = quant.quantize_lstm(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 96))
    h = jax.random.normal(jax.random.PRNGKey(2), (8, 128)) * 0.1
    c = jax.random.normal(jax.random.PRNGKey(3), (8, 128)) * 0.1
    h_ref, c_ref = L.lstm_cell(p, x, h, c)
    h_q, c_q = L.lstm_cell(qp, x, h, c)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(c_q), np.asarray(c_ref), atol=5e-3)


_CFGS = {
    "NIC": dict(embed_dim=32, hidden_dim=64),
    "BUTDDetection": dict(embed_dim=32, hidden_dim=64, atten_dim=32,
                          enc_dim=48, max_bu_len=5),
    "AoADetection": dict(embed_dim=32, hidden_dim=32, enc_dim=48,
                         num_heads=4, num_refine_layers=2, max_bu_len=5),
}


def _visual(model_type, cfg, b, rng):
    if model_type == "NIC":
        return {"features": rng.normal(
            size=(b, cfg.enc_dim)).astype(np.float32)}
    return {"bu_feats": rng.normal(
        size=(b, cfg.max_bu_len, cfg.enc_dim)).astype(np.float32),
        "bu_masks": np.ones((b, cfg.max_bu_len), np.float32)}


@pytest.mark.parametrize("model_type", sorted(_CFGS))
def test_decode_on_quantized_params(model_type):
    """Greedy + beam run end-to-end on quantized trees and stay close to
    the full-precision decode (identical tokens at these tiny dims)."""
    kw = dict(_CFGS[model_type])
    cfg = ModelConfig(model_type=model_type, vocab_size=40, **kw)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    qparams = model.quantize_decode_params(params)
    # the transform must not mutate the source tree
    assert "q" not in params[model.decode_quant_paths[0][0]] \
        if len(model.decode_quant_paths[0]) == 1 else True
    rng = np.random.default_rng(0)
    visual = _visual(model_type, cfg, 4, rng)
    enc, _ = model.encode(params, visual, train=False)
    enc_q, _ = model.encode(qparams, visual, train=False)
    ids, _ = D.greedy(model, params, enc, max_len=8)
    ids_q, _ = D.greedy(model, qparams, enc_q, max_len=8)
    assert ids_q.shape == ids.shape
    agree = float(np.mean(np.asarray(ids_q) == np.asarray(ids)))
    assert agree > 0.8, f"greedy token agreement {agree}"
    beam_q = D.beam_search(model, qparams, enc_q, beam_size=3, max_steps=6)
    assert beam_q.shape == (4, 7)
    assert (np.asarray(beam_q)[:, 0] == 1).all()


def test_quantize_tree_is_shape_stable_and_nonmutating():
    cfg = ModelConfig(model_type="AoADetection", vocab_size=40, embed_dim=32,
                      hidden_dim=32, enc_dim=48, num_heads=4,
                      num_refine_layers=2, max_bu_len=5)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    qparams = model.quantize_decode_params(params)
    assert "v" in params["predict"] and "q" in qparams["predict"]
    assert qparams["predict"]["q"].dtype == jnp.int8
    assert qparams["predict"]["q"].shape[1] % quant.N_ALIGN == 0
    # untouched subtrees are shared, not copied
    assert qparams["embed"] is params["embed"]
    assert qparams["aoa_dec"]["k"] is params["aoa_dec"]["k"]


def test_int8_beam_decode_over_mesh():
    """The engine eval path combination: batch sharded over the data mesh,
    params carrying int8 leaves (uncommitted — jit places them).  Locks
    that quantized trees flow through make_beam_decode under sharding."""
    import jax
    from simpleimagecaptionzoo_tpu.engine import steps as S
    from simpleimagecaptionzoo_tpu.parallel import get_mesh, shard_batch
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = ModelConfig(model_type="AoADetection", vocab_size=40, embed_dim=32,
                      hidden_dim=32, enc_dim=48, num_heads=4,
                      num_refine_layers=2, max_bu_len=5)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    qparams = model.quantize_decode_params(params)
    mesh = get_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    visual = shard_batch(mesh, {
        "bu_feats": rng.normal(size=(16, 5, 48)).astype(np.float32),
        "bu_masks": np.ones((16, 5), np.float32)})
    beam = S.make_beam_decode(model, beam_size=3, max_steps=6,
                              dtype=jnp.bfloat16)
    ids = np.asarray(beam(qparams, {}, visual))
    assert ids.shape == (16, 7) and (ids[:, 0] == 1).all()
    # matches the unsharded decode on the same quantized tree
    visual_local = {k: np.asarray(v) for k, v in visual.items()}
    ids_local = np.asarray(beam(qparams, {}, visual_local))
    np.testing.assert_array_equal(ids, ids_local)
