"""BUTD ("Bottom-Up Top-Down") captioner — Spatial and Detection variants.

Reference: Models/BUTD_Model.py — spatial 7x7x2048 ResNet features (Spatial)
or 36x2048 faster-rcnn bottom-up features (Detection), concat SoftAttention
(BUTD_Model.py:40-62), two-layer top-down LSTM: an attention LSTM fed
[h2, mean_features, word_emb] and a language LSTM fed [attended, h1]
(BUTD_Model.py:82-83,137-145), weight-norm prediction head.

Parity notes:
* ``init_weights`` re-initializes the embedding to U(-0.1, 0.1)
  (BUTD_Model.py:88) — reproduced.  Its re-init of ``predict.weight`` is a
  no-op in the reference (weight_norm's pre-forward hook overwrites the
  attribute), but its ``predict.bias.data.fill_(0)`` (BUTD_Model.py:90) is
  real and reproduced via ``zero_bias=True``.
* The word embedding is Sequential(Embedding, ReLU, Dropout)
  (BUTD_Model.py:77-81).

TPU design: the encoder projection of the attention keys
(``enc_att(enc_features)``) is hoisted out of the per-step loop into encode
(the reference recomputes it every timestep, BUTD_Model.py:57).  Masked
attention (additive -1e9) is always-on so 'adaptive' detection features work
with static shapes; for fixed 36-box inputs the all-ones mask is a no-op.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models import resnet
from simpleimagecaptionzoo_tpu.models.base import Captioner, Encoded, register


class _BUTDBase(Captioner):
    has_cnn = False
    # att_affine (atten_dim -> 1) is excluded: padding its single output
    # column to the int8 tile would cost more HBM than its bf16 original
    decode_quant_paths = (("lstm_td",), ("lstm_lang",), ("att_dec",),
                          ("predict",))

    def init_params(self, rng, include_cnn: Optional[bool] = None) -> dict:
        cfg = self.config
        ks = jax.random.split(rng, 8)
        params = {
            "embed": L.embedding_init(ks[0], cfg.vocab_size, cfg.embed_dim,
                                      scale=0.1),
            "att_enc": L.dense_wn_init(ks[1], cfg.enc_dim, cfg.atten_dim),
            "att_dec": L.dense_wn_init(ks[2], cfg.hidden_dim, cfg.atten_dim),
            "att_affine": L.dense_wn_init(ks[3], cfg.atten_dim, 1),
            "lstm_td": L.lstm_cell_init(
                ks[4], cfg.embed_dim + cfg.enc_dim + cfg.hidden_dim,
                cfg.hidden_dim),
            "lstm_lang": L.lstm_cell_init(
                ks[5], cfg.enc_dim + cfg.hidden_dim, cfg.hidden_dim),
            "predict": L.dense_wn_init(ks[6], cfg.hidden_dim, cfg.vocab_size,
                                       zero_bias=True),
        }
        include_cnn = self.has_cnn if include_cnn is None else include_cnn
        if include_cnn:
            cnn_params, self._cnn_stats = resnet.init(ks[7])
            params["cnn"] = cnn_params
        return params

    def init_model_state(self) -> dict:
        return {"cnn_stats": getattr(self, "_cnn_stats", None)}

    def _features(self, params, visual, model_state, train=False):
        """-> (feats, mask, model_state) — model_state carries updated BN
        running stats when a CNN ran in train mode."""
        raise NotImplementedError

    def encode(self, params, visual: Dict[str, jnp.ndarray], *,
               train: bool = False, rng=None,
               model_state: Optional[dict] = None
               ) -> Tuple[Encoded, Optional[dict]]:
        feats, mask, model_state = self._features(params, visual,
                                                  model_state, train=train)
        if mask is None:
            mean = jnp.mean(feats, axis=1)
        else:
            mean = (jnp.sum(feats * mask[..., None], axis=1)
                    / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0))
        att_keys = L.dense_wn(params["att_enc"], feats)      # hoisted (B,N,A)
        extras = {"att_keys": att_keys}
        td = params["lstm_td"]
        if L.hoist_lstm_inputs(td):
            # weight-stationary hoist: the td-LSTM input is
            # [h2 (H), mean (E), emb (D)] and ``mean`` never changes across
            # timesteps — project it (2048 of the 4096 input rows, 8.4M of
            # the 16.8M w_ih params) ONCE here instead of every scan step
            # in forward AND backward (VERDICT r3 next #2).  b_ih rides
            # along so the step adds one term.  Skipped for int8-quantized
            # decode params, whose packed cell consumes the full concat.
            h_dim = self.config.hidden_dim
            e_dim = feats.shape[-1]
            w_mean = jax.lax.slice_in_dim(td["w_ih"], h_dim, h_dim + e_dim)
            extras["td_mean_gates"] = mean @ w_mean + td["b_ih"]
        return (Encoded(features=feats, mean=mean, mask=mask,
                        extras=extras), model_state)

    def init_state(self, params, encoded: Encoded):
        b = encoded.mean.shape[0]
        z = jnp.zeros((b, self.config.hidden_dim), encoded.mean.dtype)
        return {"h1": z, "c1": z, "h2": z, "c2": z}

    def step_core(self, params, encoded: Encoded, state,
                  tokens: jnp.ndarray, *, train: bool = False, rng=None,
                  tf_input=None):
        cfg = self.config
        if rng is not None:
            r_emb, r_att, r_out = jax.random.split(rng, 3)
        else:
            r_emb = r_att = r_out = None
        td = params["lstm_td"]
        if tf_input is not None:
            # teacher-forcing weight-stationary path: emb was embedded,
            # dropped out (with this step's r_emb — tf_inputs mirrors the
            # split above) and projected OUTSIDE the scan; mean's
            # projection came from encode.  Only the h2 rows of w_ih are
            # read per timestep.
            h_dim = cfg.hidden_dim
            w_h2 = jax.lax.slice_in_dim(td["w_ih"], 0, h_dim)
            gates_x = (state["h2"] @ w_h2 + tf_input["emb_gates"]
                       + encoded.extras["td_mean_gates"])
            h1, c1 = L.lstm_cell_gates(td, gates_x, state["h1"], state["c1"])
        else:
            emb = jax.nn.relu(L.embedding(params["embed"], tokens))
            emb = L.dropout(r_emb, emb, cfg.dropout, train)
            if "td_mean_gates" in (encoded.extras or {}):
                # weight-stationary path: mean's input projection arrives
                # precomputed from encode; only the h2/emb slices of w_ih
                # are read per step (XLA hoists the constant slices out of
                # scans)
                h_dim, e_dim = cfg.hidden_dim, encoded.features.shape[-1]
                w_h2 = jax.lax.slice_in_dim(td["w_ih"], 0, h_dim)
                w_emb = jax.lax.slice_in_dim(td["w_ih"], h_dim + e_dim,
                                             td["w_ih"].shape[0])
                gates_x = (state["h2"] @ w_h2 + emb @ w_emb
                           + encoded.extras["td_mean_gates"])
                h1, c1 = L.lstm_cell_gates(td, gates_x,
                                           state["h1"], state["c1"])
            else:
                h1, c1 = L.lstm_cell(
                    td,
                    jnp.concatenate([state["h2"], encoded.mean, emb],
                                    axis=-1),
                    state["h1"], state["c1"])
        # concat SoftAttention (BUTD_Model.py:49-62)
        dec_ctx = L.dense_wn(params["att_dec"], h1)          # (B, A)
        act = jax.nn.relu(encoded.extras["att_keys"] + dec_ctx[:, None, :])
        act = L.dropout(r_att, act, cfg.dropout, train)
        scores = L.dense_wn(params["att_affine"], act)[..., 0]   # (B, N)
        alpha = L.masked_softmax(scores, encoded.mask, axis=-1)
        attended = jnp.sum(encoded.features * alpha[..., None], axis=1)
        h2, c2 = L.lstm_cell(
            params["lstm_lang"],
            jnp.concatenate([attended, h1], axis=-1),
            state["h2"], state["c2"])
        out = L.dropout(r_out, h2, cfg.dropout, train)
        return out, {"h1": h1, "c1": c1, "h2": h2, "c2": c2}, alpha

    def tf_inputs(self, params, encoded: Encoded, tokens, step_rngs, *,
                  train: bool = False):
        """Embed + dropout + project ALL teacher-forcing tokens outside
        the scan: the emb rows of the td-LSTM's w_ih (embed_dim of its
        4096-row input) are then read once per training step instead of
        once per timestep.  The per-step dropout replays step_core's exact
        rng discipline (r_emb = split(rng, 3)[0]) so the loss is
        bit-identical (tests/test_decode_consistency.py)."""
        td = params["lstm_td"]
        if (not L.hoist_lstm_inputs(td)
                or "td_mean_gates" not in (encoded.extras or {})):
            return None
        cfg = self.config
        emb = jax.nn.relu(L.embedding(params["embed"], tokens))  # (T,B,E)
        if step_rngs is not None:
            r_embs = jax.vmap(lambda k: jax.random.split(k, 3)[0])(step_rngs)
            emb = jax.vmap(
                lambda r, e: L.dropout(r, e, cfg.dropout, train))(r_embs, emb)
        h_dim, e_dim = cfg.hidden_dim, encoded.features.shape[-1]
        w_emb = jax.lax.slice_in_dim(td["w_ih"], h_dim + e_dim,
                                     td["w_ih"].shape[0])
        return {"emb_gates": emb @ w_emb}

    def init_lane_state(self, params, encoded: Encoded, k: int):
        b = encoded.mean.shape[0]
        z = jnp.zeros((b, k, self.config.hidden_dim), encoded.mean.dtype)
        return {"h1": z, "c1": z, "h2": z, "c2": z}

    def step_lanes_core(self, params, encoded: Encoded, state, tokens, *,
                        train: bool = False, rng=None):
        """Beam-lane step sharing each sample's attention keys/features:
        ``att_keys`` (B,N,A) and ``features`` (B,N,E) are read once per
        sample per step; only the lane-dependent concat-attention
        activation (B,k,N,A) is materialized per lane.  Returns pre-logit
        h2 (B,k,H); the head is applied by the caller."""
        cfg = self.config
        b, k = tokens.shape
        emb = jax.nn.relu(L.embedding(params["embed"], tokens))   # (B,k,E)
        td = params["lstm_td"]
        if "td_mean_gates" in (encoded.extras or {}):
            # weight-stationary path, lane-shared: the precomputed mean
            # gates broadcast over the k lanes for free
            h_dim, e_dim = cfg.hidden_dim, encoded.features.shape[-1]
            w_h2 = jax.lax.slice_in_dim(td["w_ih"], 0, h_dim)
            w_emb = jax.lax.slice_in_dim(td["w_ih"], h_dim + e_dim,
                                         td["w_ih"].shape[0])
            gates_x = (state["h2"] @ w_h2 + emb @ w_emb
                       + encoded.extras["td_mean_gates"][:, None, :])
            h1, c1 = L.lstm_cell_gates(
                td, gates_x.reshape(b * k, -1),
                state["h1"].reshape(b * k, -1),
                state["c1"].reshape(b * k, -1))
        else:
            mean = encoded.mean[:, None, :].astype(emb.dtype)
            mean = jnp.broadcast_to(mean, (b, k, mean.shape[-1]))
            h1, c1 = L.lstm_cell(
                td,
                jnp.concatenate([state["h2"], mean, emb],
                                axis=-1).reshape(b * k, -1),
                state["h1"].reshape(b * k, -1),
                state["c1"].reshape(b * k, -1))
        dec_ctx = L.dense_wn(params["att_dec"], h1).reshape(b, k, 1, -1)
        act = jax.nn.relu(encoded.extras["att_keys"][:, None] + dec_ctx)
        scores = L.dense_wn(params["att_affine"], act)[..., 0]   # (B,k,N)
        mask = None if encoded.mask is None else encoded.mask[:, None, :]
        alpha = L.masked_softmax(scores, mask, axis=-1)
        attended = jnp.einsum("bne,bkn->bke", encoded.features,
                              alpha.astype(encoded.features.dtype))
        h2, c2 = L.lstm_cell(
            params["lstm_lang"],
            jnp.concatenate([attended,
                             h1.reshape(b, k, -1)], axis=-1).reshape(b * k, -1),
            state["h2"].reshape(b * k, -1), state["c2"].reshape(b * k, -1))
        rs = lambda x: x.reshape(b, k, -1)
        return rs(h2), {"h1": rs(h1), "c1": rs(c1),
                        "h2": rs(h2), "c2": rs(c2)}, alpha


@register("BUTDSpatial")
class BUTDSpatialCaptioner(_BUTDBase):
    has_cnn = True

    def _features(self, params, visual, model_state, train=False):
        if "spatial_feats" in visual:             # precomputed (B, 49, 2048)
            return visual["spatial_feats"], None, model_state
        from simpleimagecaptionzoo_tpu.ops.image import prepare_images
        images = prepare_images(visual, self.ingest_out_size)
        if train:                     # batch-stat BN + running-stat update
            fmap, new_cnn = resnet.apply(
                params["cnn"], (model_state or {})["cnn_stats"], images,
                train=True)
            model_state = dict(model_state or {}, cnn_stats=new_cnn)
        else:
            fmap = resnet.apply(params["cnn"],
                                (model_state or {})["cnn_stats"], images)
        return (resnet.spatial_features(fmap, self.config.enc_img_size),
                None, model_state)


@register("BUTDDetection")
class BUTDDetectionCaptioner(_BUTDBase):
    has_cnn = False

    def _features(self, params, visual, model_state, train=False):
        return visual["bu_feats"], visual.get("bu_masks"), model_state
