"""Reference (PyTorch) checkpoint -> framework param-tree converter.

The reference saves plain module state_dicts with ``torch.save``
(``/root/reference/Engine.py:81-88``: ``cp/Captioner_[scst_]cp.pth``).  This
module maps those state_dicts — for every captioner family — into this
framework's nested-dict param trees, so a reference-trained model can be
evaluated (or SCST-finetuned) here without retraining.  That is the
quality-parity bridge for environments that have reference checkpoints but
no GPU-weeks to spare.

Reference module layouts converted (file:line into /root/reference):

* NIC     — Models/NIC_Model.py:214-218: ``encoder.feature_extractor``
  (torchvision resnet101 Sequential), ``encoder.img_embedding``
  (weight_norm Linear), ``encoder.bn`` (dead code, skipped — never applied
  in forward, NIC_Model.py:27-37), ``decoder.{embed,lstm,predict}``.
* BUTD    — Models/BUTD_Model.py:64-90: ``decoder.atten.{enc_att,dec_att,
  affine}`` (weight_norm Linears), ``decoder.embed.0`` (Embedding inside
  Sequential), ``decoder.TD_atten``/``decoder.language_model`` (LSTMCells),
  ``decoder.predict``; Spatial adds ``encoder.feature_extractor``.
* AoA     — Models/AoA_Model.py:505-517,657-668: ``img_feats_porjection.0``
  (the reference's typo is load-bearing), ``aoa_refine.aoa_layers.{i}``
  (AoABlock ``linear_Q/K/V`` + ``aoa_module.0`` and SublayerConnection
  ``sublayer.norm``), ``aoa_refine.norm``, ``decoder.{lstm,aoa_block,
  embed.0,h_norm,predict}``; Spatial adds ``encoder.feature_extractor``.

Layout conventions translated:

* ``nn.Linear.weight`` is (out, in) -> our ``w`` is (in, out): transpose.
* ``weight_norm(Linear)`` (dim=0) stores ``weight_v`` (out, in) and
  ``weight_g`` (out, 1) -> our ``v`` (in, out) + ``g`` (out,).  Both the
  classic hook names and the new ``parametrizations.weight.original{0,1}``
  names are accepted.
* ``nn.LSTMCell`` stores ``weight_ih``/``weight_hh`` as (4H, in)/(4H, H),
  gate order i,f,g,o -> our ``w_ih``/``w_hh`` transposed; biases direct.
* torchvision resnet convs OIHW -> HWIO; BN running stats -> the framework's
  frozen-BN ``model_state['cnn_stats']`` tree (models/resnet.py).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Set, Tuple

import numpy as np

_RESNET_SEQ_NAMES = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                     "6": "layer3", "7": "layer4"}


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach()
    if hasattr(v, "numpy"):
        v = v.numpy()
    return np.asarray(v, dtype=np.float32)


class _SD:
    """State-dict view that records which keys were consumed."""

    def __init__(self, sd: Mapping):
        self.sd = dict(sd)
        self.used: Set[str] = set()

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"reference checkpoint is missing '{key}' — wrong model_type "
                f"or a truncated/renamed state_dict? Available keys start "
                f"with: {sorted(self.sd)[:5]}")
        self.used.add(key)
        return _np(self.sd[key])

    def mark_prefix_used(self, prefix: str) -> None:
        self.used.update(k for k in self.sd if k.startswith(prefix))

    def unused(self) -> list:
        return sorted(set(self.sd) - self.used
                      - {k for k in self.sd if k.endswith("num_batches_tracked")})


def _linear(sd: _SD, prefix: str, bias: bool = True) -> dict:
    p = {"w": sd.take(prefix + ".weight").T}
    if bias:
        p["b"] = sd.take(prefix + ".bias")
    return p


def _linear_wn(sd: _SD, prefix: str, bias: bool = True) -> dict:
    if (prefix + ".weight_v") in sd:
        v, g = sd.take(prefix + ".weight_v"), sd.take(prefix + ".weight_g")
    else:  # torch >= 2.1 parametrize-style weight_norm export
        g = sd.take(prefix + ".parametrizations.weight.original0")
        v = sd.take(prefix + ".parametrizations.weight.original1")
    p = {"v": v.T, "g": g.reshape(-1)}
    if bias:
        p["b"] = sd.take(prefix + ".bias")
    return p


def _lstm_cell(sd: _SD, prefix: str) -> dict:
    return {"w_ih": sd.take(prefix + ".weight_ih").T,
            "w_hh": sd.take(prefix + ".weight_hh").T,
            "b_ih": sd.take(prefix + ".bias_ih"),
            "b_hh": sd.take(prefix + ".bias_hh")}


def _layer_norm(sd: _SD, prefix: str) -> dict:
    return {"gain": sd.take(prefix + ".gain"),
            "bias": sd.take(prefix + ".bias")}


def _embedding(sd: _SD, key: str) -> dict:
    return {"table": sd.take(key)}


def _aoa_block(sd: _SD, prefix: str) -> dict:
    """AoABlock (AoA_Model.py:71-92): linear_Q/K/V + aoa_module.0 (the GLU's
    Linear; GLU itself has no params)."""
    return {"q": _linear(sd, prefix + ".linear_Q"),
            "k": _linear(sd, prefix + ".linear_K"),
            "v": _linear(sd, prefix + ".linear_V"),
            "aoa": _linear(sd, prefix + ".aoa_module.0")}


def _resnet(sd: _SD, prefix: str) -> Tuple[dict, dict]:
    """encoder.feature_extractor.{0,1,4..7}.* -> torchvision key names ->
    (params, stats) via models/resnet.py."""
    from simpleimagecaptionzoo_tpu.models import resnet

    tv_sd = {}
    plen = len(prefix) + 1
    for key in sd.sd:
        if not key.startswith(prefix + "."):
            continue
        rest = key[plen:]
        idx, _, tail = rest.partition(".")
        if idx not in _RESNET_SEQ_NAMES:
            raise KeyError(f"unexpected feature_extractor entry '{key}'")
        tv_sd[_RESNET_SEQ_NAMES[idx] + "." + tail] = sd.sd[key]
    sd.mark_prefix_used(prefix + ".")
    return resnet.convert_torch_state_dict(
        {k: _np(v) for k, v in tv_sd.items()})


def _num_refine_layers(sd: _SD) -> int:
    n = 0
    while f"aoa_refine.aoa_layers.{n}.aoa_block.linear_Q.weight" in sd:
        n += 1
    return n


def convert_state_dict(state_dict: Mapping, model_type: str, *,
                       strict: bool = True
                       ) -> Tuple[dict, Optional[dict]]:
    """Convert a reference captioner ``state_dict`` into ``(params,
    cnn_stats)`` for :class:`~simpleimagecaptionzoo_tpu.models.base.Captioner`
    of the same ``model_type``.

    ``cnn_stats`` is the frozen-BN statistics tree for CNN-bearing families
    (NIC, BUTDSpatial, AoASpatial) and None for Detection families.  With
    ``strict`` (default), raises if any unexpected parameter key remains
    unconsumed (catching model_type mismatches early).
    """
    sd = _SD(state_dict)
    cnn_stats: Optional[dict] = None
    params: Dict[str, object]

    if model_type == "NIC":
        params = {
            "img_embed": _linear_wn(sd, "encoder.img_embedding"),
            "embed": _embedding(sd, "decoder.embed.weight"),
            "lstm": _lstm_cell(sd, "decoder.lstm"),
            "predict": _linear_wn(sd, "decoder.predict"),
        }
        # encoder.bn is defined but never applied in the reference forward
        # (NIC_Model.py:25 vs :27-37) — dead parameters, skipped.
        sd.mark_prefix_used("encoder.bn.")
        if "encoder.feature_extractor.0.weight" in sd:
            params["cnn"], cnn_stats = _resnet(sd, "encoder.feature_extractor")
    elif model_type in ("BUTDSpatial", "BUTDDetection"):
        params = {
            "embed": _embedding(sd, "decoder.embed.0.weight"),
            "att_enc": _linear_wn(sd, "decoder.atten.enc_att"),
            "att_dec": _linear_wn(sd, "decoder.atten.dec_att"),
            "att_affine": _linear_wn(sd, "decoder.atten.affine"),
            "lstm_td": _lstm_cell(sd, "decoder.TD_atten"),
            "lstm_lang": _lstm_cell(sd, "decoder.language_model"),
            "predict": _linear_wn(sd, "decoder.predict"),
        }
        if "encoder.feature_extractor.0.weight" in sd:
            params["cnn"], cnn_stats = _resnet(sd, "encoder.feature_extractor")
    elif model_type in ("AoASpatial", "AoADetection"):
        refine = []
        for i in range(_num_refine_layers(sd)):
            pre = f"aoa_refine.aoa_layers.{i}"
            refine.append({
                "aoa": _aoa_block(sd, pre + ".aoa_block"),
                "ln": _layer_norm(sd, pre + ".sublayer.norm"),
            })
        if not refine:
            raise KeyError("no aoa_refine.aoa_layers.* keys — not an AoA "
                           "checkpoint?")
        params = {
            "proj": _linear(sd, "img_feats_porjection.0"),
            "refine": refine,
            "refine_ln": _layer_norm(sd, "aoa_refine.norm"),
            "embed": _embedding(sd, "decoder.embed.0.weight"),
            "lstm": _lstm_cell(sd, "decoder.lstm"),
            "aoa_dec": _aoa_block(sd, "decoder.aoa_block"),
            "h_norm": _layer_norm(sd, "decoder.h_norm"),
            "predict": _linear_wn(sd, "decoder.predict"),
        }
        if "encoder.feature_extractor.0.weight" in sd:
            params["cnn"], cnn_stats = _resnet(sd, "encoder.feature_extractor")
    else:
        raise ValueError(f"unknown model_type '{model_type}'")

    leftovers = sd.unused()
    if leftovers and strict:
        raise ValueError(
            f"{len(leftovers)} unconsumed keys in the reference state_dict "
            f"(model_type mismatch?): {leftovers[:8]}")

    import jax.numpy as jnp
    params = _tree_map_arrays(params, jnp.asarray)
    if cnn_stats is not None:
        import jax
        cnn_stats = jax.tree_util.tree_map(jnp.asarray, cnn_stats)
    return params, cnn_stats


def _tree_map_arrays(tree, fn):
    if isinstance(tree, dict):
        return {k: _tree_map_arrays(v, fn) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_arrays(v, fn) for v in tree]
    return fn(tree)


def load_reference_checkpoint(pth_path: str, model_type: str, *,
                              strict: bool = True) -> Tuple[dict, dict]:
    """Load a reference ``Captioner_[scst_]cp.pth`` and convert it.

    Returns ``(params, model_state)`` where ``model_state`` is
    ``{"cnn_stats": stats-or-None}`` — exactly the tree the Engine
    checkpoints (engine/engine.py)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, cnn_stats = convert_state_dict(sd, model_type, strict=strict)
    return params, {"cnn_stats": cnn_stats}
