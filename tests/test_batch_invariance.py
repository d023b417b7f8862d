"""Padded-row invariance: weight-0 filler rows (static final-batch padding,
data/datasets.py) must not change the XE loss or its gradients — the mask
plumbing through teacher forcing + label smoothing is what guarantees the
static-shape redesign matches the reference's packed-sequence math."""
import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.models.base import get_captioner

V = 30


def _batch(rng, b, t=9):
    caps = rng.integers(4, V, size=(b, t)).astype(np.int32)
    caps[:, 0] = 1
    lens = rng.integers(4, t, size=(b,)).astype(np.int32)
    for i, l in enumerate(lens):
        caps[i, l - 1] = 2
        caps[i, l:] = 0
    feats = rng.normal(size=(b, 6, 10)).astype(np.float32)
    return caps, lens, feats


def test_weight_zero_rows_do_not_change_loss(rng):
    cfg = ModelConfig(model_type="BUTDDetection", vocab_size=V, embed_dim=16,
                      hidden_dim=16, atten_dim=12, enc_dim=10)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    eval_loss = S.make_xe_eval_loss(model)

    caps, lens, feats = _batch(rng, 6)
    mask = np.ones((6, 6), np.float32)
    base = {"visual": {"bu_feats": feats, "bu_masks": mask},
            "captions": caps, "lengths": lens,
            "sample_weight": np.ones((6,), np.float32)}
    l_base = float(eval_loss(params, {}, base))

    # append 2 garbage rows with weight 0
    caps2, lens2, feats2 = _batch(np.random.default_rng(99), 8)
    caps2[:6], lens2[:6], feats2[:6] = caps, lens, feats
    padded = {"visual": {"bu_feats": feats2,
                         "bu_masks": np.ones((8, 6), np.float32)},
              "captions": caps2, "lengths": lens2,
              "sample_weight": np.concatenate(
                  [np.ones((6,), np.float32), np.zeros((2,), np.float32)])}
    l_pad = float(eval_loss(params, {}, padded))
    np.testing.assert_allclose(l_pad, l_base, rtol=1e-6)


def test_bu_mask_invariance(rng):
    """Rows masked out of the bottom-up features must not affect encode:
    changing padded feature values leaves logits identical (additive -1e9
    attention masking + masked mean)."""
    for model_type in ("BUTDDetection", "AoADetection"):
        cfg = ModelConfig(model_type=model_type, vocab_size=V, embed_dim=16,
                          hidden_dim=16, atten_dim=12, enc_dim=10,
                          num_heads=4, num_refine_layers=2)
        model = get_captioner(cfg)
        params = model.init_params(jax.random.PRNGKey(1), include_cnn=False)
        feats = rng.normal(size=(3, 6, 10)).astype(np.float32)
        mask = np.ones((3, 6), np.float32)
        mask[:, 4:] = 0.0
        garbage = feats.copy()
        garbage[:, 4:] = 1e3 * rng.normal(size=(3, 2, 10))

        def logits_for(f):
            enc, _ = model.encode(
                params, {"bu_feats": jnp.asarray(f),
                         "bu_masks": jnp.asarray(mask)}, train=False)
            state = model.init_state(params, enc)
            tok = jnp.array([4, 5, 6], jnp.int32)
            out, _, _ = model.step(params, enc, state, tok, train=False)
            return np.asarray(out)

        np.testing.assert_allclose(logits_for(garbage), logits_for(feats),
                                   rtol=2e-4, atol=2e-4)
