"""Reference-checkpoint converter tests.

For every captioner family: build a torch module with the reference's exact
attribute layout (so its ``state_dict`` has the exact key names the
reference saves, /root/reference/Engine.py:81-88), run a hand-written
eval-mode oracle of the reference's forward math, convert the state_dict
with ``convert_reference.convert_state_dict``, and require the converted
JAX model's teacher-forced logits to match numerically.  This proves
decode-level parity for converted checkpoints without needing COCO data or
training time (VERDICT r1, next-round item 2).
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
from torch.nn.utils.weight_norm import weight_norm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simpleimagecaptionzoo_tpu.config import ModelConfig  # noqa: E402
from simpleimagecaptionzoo_tpu.convert_reference import (  # noqa: E402
    convert_state_dict, export_state_dict, load_reference_checkpoint,
    save_reference_checkpoint)
from simpleimagecaptionzoo_tpu.models.base import get_captioner  # noqa: E402
from simpleimagecaptionzoo_tpu.ops import decode  # noqa: E402

V, E, H, A, ENC = 23, 8, 8, 6, 12       # vocab, embed, hidden, atten, enc
HEADS, LAYERS, NBOX = 2, 2, 5
B, T = 3, 7

torch.manual_seed(0)


def _captions():
    rng = np.random.default_rng(0)
    caps = rng.integers(4, V, size=(B, T)).astype(np.int64)
    caps[:, 0] = 1
    caps[:, -1] = 2
    return caps


def _ours_logits(model_type, sd, visual, caps, **cfg_kw):
    params, cnn_stats = convert_state_dict(sd, model_type)
    cfg = ModelConfig(model_type=model_type, vocab_size=V, embed_dim=E,
                      hidden_dim=H, enc_dim=ENC, **cfg_kw)
    model = get_captioner(cfg)
    # converted tree must be structurally identical to a fresh init
    # (flax.serialization templates depend on it)
    fresh = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fresh))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(fresh)):
        assert a.shape == b.shape
    enc, _ = model.encode(params, visual, train=False)
    logits = decode.teacher_forced_logits(model, params, enc,
                                          jnp.asarray(caps.astype(np.int32)),
                                          0.0, None, train=False)
    return np.asarray(logits)


# ---------------------------------------------------------------------- NIC

class RefNIC(nn.Module):
    """Attribute layout of NIC_Captioner (NIC_Model.py:214-218)."""

    def __init__(self):
        super().__init__()
        enc = nn.Module()
        enc.img_embedding = weight_norm(nn.Linear(ENC, E))
        enc.bn = nn.BatchNorm1d(E, momentum=0.01)   # dead code in reference
        dec = nn.Module()
        dec.embed = nn.Embedding(V, E)
        dec.lstm = nn.LSTMCell(E, H)
        dec.predict = weight_norm(nn.Linear(H, V))
        self.encoder, self.decoder = enc, dec


def test_nic_decode_parity():
    m = RefNIC().eval()
    feats = torch.randn(B, ENC)
    caps = _captions()
    with torch.no_grad():
        emb = m.encoder.img_embedding(feats)
        h = torch.zeros(B, H)
        c = torch.zeros(B, H)
        h, c = m.decoder.lstm(emb, (h, c))          # NIC_Model.py:52-56
        outs = []
        for t in range(T - 1):                      # NIC_Model.py:77-95
            x = m.decoder.embed(torch.from_numpy(caps[:, t]))
            h, c = m.decoder.lstm(x, (h, c))
            outs.append(m.decoder.predict(h))
        ref = torch.stack(outs, 1).numpy()

    ours = _ours_logits("NIC", m.state_dict(),
                        {"features": jnp.asarray(feats.numpy())}, caps)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------- BUTD

class RefBUTD(nn.Module):
    """Attribute layout of BUTDDetection_Captioner (BUTD_Model.py:443-449,
    decoder per :64-90)."""

    def __init__(self):
        super().__init__()
        dec = nn.Module()
        atten = nn.Module()
        atten.enc_att = weight_norm(nn.Linear(ENC, A))
        atten.dec_att = weight_norm(nn.Linear(H, A))
        atten.affine = weight_norm(nn.Linear(A, 1))
        dec.atten = atten
        dec.embed = nn.Sequential(nn.Embedding(V, E), nn.ReLU(),
                                  nn.Dropout(0.5))
        dec.TD_atten = nn.LSTMCell(E + ENC + H, H)
        dec.language_model = nn.LSTMCell(ENC + H, H)
        dec.predict = weight_norm(nn.Linear(H, V))
        self.decoder = dec


def test_butd_decode_parity():
    m = RefBUTD().eval()
    feats = torch.randn(B, NBOX, ENC)
    caps = _captions()
    with torch.no_grad():
        d = m.decoder
        h1 = c1 = h2 = c2 = torch.zeros(B, H)
        mean = feats.mean(1)                        # BUTD_Model.py:118
        outs = []
        for t in range(T - 1):                      # BUTD_Model.py:121-149
            emb = d.embed(torch.from_numpy(caps[:, t]))
            h1, c1 = d.TD_atten(torch.cat([h2, mean, emb], 1), (h1, c1))
            enc_ctx = d.atten.enc_att(feats)        # BUTD_Model.py:49-62
            dec_ctx = d.atten.dec_att(h1)
            scores = d.atten.affine(
                torch.relu(enc_ctx + dec_ctx.unsqueeze(1))).squeeze(2)
            alpha = torch.softmax(scores, 1)
            attended = (feats * alpha.unsqueeze(2)).sum(1)
            h2, c2 = d.language_model(torch.cat([attended, h1], 1), (h2, c2))
            outs.append(d.predict(h2))
        ref = torch.stack(outs, 1).numpy()

    ours = _ours_logits("BUTDDetection", m.state_dict(),
                        {"bu_feats": jnp.asarray(feats.numpy())}, caps,
                        atten_dim=A, max_bu_len=NBOX)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------- AoA

class RefLayerNorm(nn.Module):
    """AoA_Model.py:14-25 (params named gain/bias; unbiased std + eps)."""

    def __init__(self, d, eps=1e-6):
        super().__init__()
        self.gain = nn.Parameter(torch.ones(d))
        self.bias = nn.Parameter(torch.zeros(d))
        self.eps = eps

    def forward(self, x):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)
        return self.gain * (x - mean) / (std + self.eps) + self.bias


class RefAoABlock(nn.Module):
    """AoA_Model.py:71-120 layout + eval-mode math."""

    def __init__(self, heads, d):
        super().__init__()
        self.heads, self.dh = heads, d // heads
        self.linear_Q = nn.Linear(d, d)
        self.linear_K = nn.Linear(d, d)
        self.linear_V = nn.Linear(d, d)
        self.aoa_module = nn.Sequential(nn.Linear(2 * d, 2 * d), nn.GLU())

    def forward(self, q, k, v, mask=None):
        b = q.size(0)
        qp = self.linear_Q(q).view(b, -1, self.heads, self.dh).transpose(1, 2)
        kp = self.linear_K(k).view(b, -1, self.heads, self.dh).transpose(1, 2)
        vp = self.linear_V(v).view(b, -1, self.heads, self.dh).transpose(1, 2)
        scores = qp @ kp.transpose(-2, -1) / math.sqrt(self.dh)
        if mask is not None:
            scores = scores.masked_fill(mask[:, None, None, :] == 0, -1e9)
        p = torch.softmax(scores, -1)
        x = (p @ vp).transpose(1, 2).reshape(b, -1, self.heads * self.dh)
        return self.aoa_module(torch.cat([x, q], dim=-1))


class RefAoA(nn.Module):
    """Attribute layout of AoADetection_Captioner (AoA_Model.py:657-668,
    decoder per :197-227, refiner per :122-162)."""

    def __init__(self):
        super().__init__()
        self.img_feats_porjection = nn.Sequential(
            nn.Linear(ENC, H), nn.ReLU(), nn.Dropout(0.5))
        refine = nn.Module()
        blocks = []
        for _ in range(LAYERS):
            blk = nn.Module()
            blk.aoa_block = RefAoABlock(HEADS, H)
            sub = nn.Module()
            sub.norm = RefLayerNorm(H)
            blk.sublayer = sub
            blocks.append(blk)
        refine.aoa_layers = nn.ModuleList(blocks)
        refine.norm = RefLayerNorm(H)
        self.aoa_refine = refine
        dec = nn.Module()
        dec.lstm = nn.LSTMCell(E + H, H)
        dec.aoa_block = RefAoABlock(HEADS, H)
        dec.embed = nn.Sequential(nn.Embedding(V, E), nn.ReLU(),
                                  nn.Dropout(0.5))
        dec.h_norm = RefLayerNorm(H)
        dec.predict = weight_norm(nn.Linear(H, V))
        self.decoder = dec


def test_aoa_decode_parity_with_adaptive_mask():
    m = RefAoA().eval()
    feats = torch.randn(B, NBOX, ENC)
    mask = torch.ones(B, NBOX)
    mask[0, 3:] = 0.0                               # adaptive bu path
    mask[2, 4:] = 0.0
    caps = _captions()
    with torch.no_grad():
        # pack_wrapper semantics: padded rows exactly 0 (AoA_Model.py:650-655)
        x = m.img_feats_porjection(feats) * mask.unsqueeze(-1)
        for blk in m.aoa_refine.aoa_layers:         # AoA_Model.py:27-39,158-162
            y = blk.sublayer.norm(x)
            x = x + blk.aoa_block(y, y, y, mask)
        refined = m.aoa_refine.norm(x)
        mean = (refined * mask.unsqueeze(-1)).sum(1) / mask.sum(
            1, keepdim=True)                        # AoA_Model.py:251-253
        d = m.decoder
        h = mm = ctx = torch.zeros(B, H)
        outs = []
        for t in range(T - 1):                      # AoA_Model.py:258-290
            emb = d.embed(torch.from_numpy(caps[:, t]))
            h, mm = d.lstm(torch.cat([emb, mean + ctx], 1), (h, mm))
            q = d.h_norm(h.unsqueeze(1))
            ctx = d.aoa_block(q, refined, refined, mask).squeeze(1)
            outs.append(d.predict(ctx))
        ref = torch.stack(outs, 1).numpy()

    ours = _ours_logits(
        "AoADetection", m.state_dict(),
        {"bu_feats": jnp.asarray(feats.numpy()),
         "bu_masks": jnp.asarray(mask.numpy())}, caps,
        num_heads=HEADS, num_refine_layers=LAYERS, max_bu_len=NBOX)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=3e-5)


# ------------------------------------------------------------ CNN + pth I/O

def test_nic_with_cnn_and_pth_roundtrip(tmp_path, monkeypatch):
    """Spatial family with encoder.feature_extractor.* keys: converted tree
    (params + BN stats) must match init_params(include_cnn=True) structurally,
    end-to-end through torch.save -> load_reference_checkpoint."""
    from simpleimagecaptionzoo_tpu.models import resnet
    from tests.test_resnet_weights import synthetic_state_dict

    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    m = RefNIC()
    sd = dict(m.state_dict())
    for k, v in synthetic_state_dict().items():
        if k.startswith("fc."):
            continue
        # Sequential index names (NIC_Model.py:13-22)
        name, _, tail = k.partition(".")
        idx = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}[name]
        sd[f"encoder.feature_extractor.{idx}.{tail}"] = v
    path = tmp_path / "Captioner_cp.pth"
    torch.save(sd, path)

    params, model_state = load_reference_checkpoint(str(path), "NIC")
    assert model_state["cnn_stats"] is not None
    cfg = ModelConfig(model_type="NIC", vocab_size=V, embed_dim=E,
                      hidden_dim=H, enc_dim=ENC)
    model = get_captioner(cfg)
    fresh = model.init_params(jax.random.PRNGKey(0), include_cnn=True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fresh))
    np.testing.assert_allclose(
        np.asarray(params["cnn"]["conv1"]).ravel()[:8],
        np.transpose(sd["encoder.feature_extractor.0.weight"].numpy(),
                     (2, 3, 1, 0)).ravel()[:8])


# ------------------------------------------------------- export round trip

def _tiny_cfg(model_type):
    kw = {}
    if model_type.startswith("BUTD"):
        kw = dict(atten_dim=A, max_bu_len=NBOX)
    elif model_type.startswith("AoA"):
        kw = dict(num_heads=HEADS, num_refine_layers=LAYERS, max_bu_len=NBOX)
    return ModelConfig(model_type=model_type, vocab_size=V, embed_dim=E,
                       hidden_dim=H, enc_dim=ENC, **kw)


@pytest.mark.parametrize("model_type",
                         ["NIC", "BUTDSpatial", "BUTDDetection",
                          "AoASpatial", "AoADetection"])
def test_export_convert_roundtrip_bit_exact(model_type):
    """export_state_dict must be the exact inverse of convert_state_dict:
    framework init -> reference state_dict -> converted tree, bit-equal."""
    model = get_captioner(_tiny_cfg(model_type))
    params = model.init_params(jax.random.PRNGKey(3), include_cnn=False)
    sd = export_state_dict(params, None, model_type)
    back, cnn_stats = convert_state_dict(sd, model_type)
    assert cnn_stats is None
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


@pytest.mark.parametrize("ref_cls,model_type",
                         [(RefNIC, "NIC"), (RefBUTD, "BUTDDetection"),
                          (RefAoA, "AoADetection")])
def test_export_strict_loads_into_reference_module(ref_cls, model_type):
    """The exported key set must strict-load into modules with the
    reference's exact attribute layout (so the reference itself could run
    our weights), and survive torch.save -> convert bit-exact."""
    model = get_captioner(_tiny_cfg(model_type))
    params = model.init_params(jax.random.PRNGKey(4), include_cnn=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, None, model_type).items()}
    m = ref_cls()
    missing, unexpected = m.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # weight_norm modules also materialize a derived '.weight' entry in
    # state_dict(); everything else must be covered by the export
    assert all(k.endswith(".weight") and (k[:-7] + ".weight_v") in sd
               for k in missing), missing
    back, _ = convert_state_dict(m.state_dict(), model_type)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_export_roundtrip_with_cnn(tmp_path, monkeypatch):
    """CNN-bearing family: params + BN running stats survive the
    export -> .pth -> convert round trip bit-exact (stats included)."""
    from simpleimagecaptionzoo_tpu.models import resnet

    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    model = get_captioner(_tiny_cfg("NIC"))
    params = model.init_params(jax.random.PRNGKey(5), include_cnn=True)
    model_state = model.init_model_state()
    # make the BN stats non-trivial so the assert is meaningful
    model_state["cnn_stats"] = jax.tree_util.tree_map(
        lambda x: x + 0.25, model_state["cnn_stats"])
    path = str(tmp_path / "Captioner_cp.pth")
    save_reference_checkpoint(path, params, model_state, "NIC")
    back_params, back_state = load_reference_checkpoint(path, "NIC")
    for name, tree, ref in (("params", back_params, params),
                            ("stats", back_state["cnn_stats"],
                             model_state["cnn_stats"])):
        assert (jax.tree_util.tree_structure(tree)
                == jax.tree_util.tree_structure(ref)), name
        for a, b in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))


def test_strict_mode_rejects_wrong_model_type():
    m = RefBUTD()
    with pytest.raises((KeyError, ValueError)):
        convert_state_dict(m.state_dict(), "NIC")


def test_new_style_weight_norm_keys_accepted():
    """torch >= 2.1 parametrize-style exports use
    parametrizations.weight.original{0,1} instead of weight_{g,v}."""
    m = RefNIC().eval()
    sd = dict(m.state_dict())
    for pre in ("encoder.img_embedding", "decoder.predict"):
        sd[f"{pre}.parametrizations.weight.original0"] = sd.pop(
            f"{pre}.weight_g")
        sd[f"{pre}.parametrizations.weight.original1"] = sd.pop(
            f"{pre}.weight_v")
    params, _ = convert_state_dict(sd, "NIC")
    params_old, _ = convert_state_dict(m.state_dict(), "NIC")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
