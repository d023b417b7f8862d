"""NIC ("Show and Tell") captioner.

Reference: Models/NIC_Model.py — ResNet-101 global-pool encoder, weight-norm
linear image embedding, single LSTMCell decoder with the embedded image fed
as the (step -1) input (NIC_Model.py:52-56), weight-norm prediction head with
dropout 0.5.

Parity note: the reference defines ``self.bn = BatchNorm1d(embed_dim)``
(NIC_Model.py:25) but never applies it in ``forward`` — dead code we do not
reproduce.

TPU design: the decoder is exposed as a single step function; all decode
modes derive from it in ``ops/decode.py``.  The image embedding is the only
encode-time compute beyond the (optional) ResNet backbone.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models import resnet
from simpleimagecaptionzoo_tpu.models.base import Captioner, Encoded, register


@register("NIC")
class NICCaptioner(Captioner):
    decode_quant_paths = (("lstm",), ("predict",))

    def init_params(self, rng, include_cnn: bool = True) -> dict:
        cfg = self.config
        k_cnn, k_emb, k_tok, k_lstm, k_pred = jax.random.split(rng, 5)
        params = {
            "img_embed": L.dense_wn_init(k_emb, cfg.enc_dim, cfg.embed_dim),
            "embed": L.embedding_init(k_tok, cfg.vocab_size, cfg.embed_dim),
            "lstm": L.lstm_cell_init(k_lstm, cfg.embed_dim, cfg.hidden_dim),
            "predict": L.dense_wn_init(k_pred, cfg.hidden_dim, cfg.vocab_size),
        }
        if include_cnn:
            cnn_params, self._cnn_stats = resnet.init(k_cnn)
            params["cnn"] = cnn_params
        return params

    def init_model_state(self) -> dict:
        return {"cnn_stats": getattr(self, "_cnn_stats", None)}

    def encode(self, params, visual: Dict[str, jnp.ndarray], *,
               train: bool = False, rng=None,
               model_state: Optional[dict] = None
               ) -> Tuple[Encoded, Optional[dict]]:
        if "features" in visual:                  # precomputed (B, 2048)
            feats = visual["features"]
        else:
            from simpleimagecaptionzoo_tpu.ops.image import prepare_images
            images = prepare_images(visual, self.ingest_out_size)  # (B,S,S,3)
            if train:                 # batch-stat BN + running-stat update
                fmap, new_cnn = resnet.apply(
                    params["cnn"], (model_state or {})["cnn_stats"], images,
                    train=True)
                model_state = dict(model_state or {}, cnn_stats=new_cnn)
            else:
                fmap = resnet.apply(params["cnn"],
                                    (model_state or {})["cnn_stats"], images)
            feats = resnet.global_pool(fmap)      # (B, 2048)
        emb = L.dense_wn(params["img_embed"], feats)  # (B, E)
        return Encoded(features=emb[:, None, :], mean=emb, mask=None), model_state

    def init_state(self, params, encoded: Encoded):
        """Step -1: feed the embedded image through the LSTM from zeros
        (NIC_Model.py:52-56)."""
        b = encoded.mean.shape[0]
        h = jnp.zeros((b, self.config.hidden_dim), encoded.mean.dtype)
        c = jnp.zeros_like(h)
        h, c = L.lstm_cell(params["lstm"], encoded.mean, h, c)
        return {"h": h, "c": c}

    def step_core(self, params, encoded: Encoded, state,
                  tokens: jnp.ndarray, *, train: bool = False, rng=None,
                  tf_input=None):
        if tf_input is not None:
            h, c = L.lstm_cell_gates(params["lstm"], tf_input["gates_x"],
                                     state["h"], state["c"])
        else:
            emb = L.embedding(params["embed"], tokens)
            h, c = L.lstm_cell(params["lstm"], emb, state["h"], state["c"])
        hd = L.dropout(rng, h, self.config.dropout, train) if rng is not None else h
        return hd, {"h": h, "c": c}, None

    def tf_inputs(self, params, encoded: Encoded, tokens, step_rngs, *,
                  train: bool = False):
        """NIC's LSTM input is the token embedding alone (no in-step
        dropout touches it, NIC_Model.py:58-60), so the ENTIRE w_ih read
        leaves the teacher-forcing scan: one (T*B, E) @ (E, 4H) matmul
        here replaces T in-scan reads of half the cell's weights."""
        lstm = params["lstm"]
        if not L.hoist_lstm_inputs(lstm):
            return None
        emb = L.embedding(params["embed"], tokens)        # (T, B, E)
        return {"gates_x": emb @ lstm["w_ih"] + lstm["b_ih"]}
