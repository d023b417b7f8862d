"""AoA ("Attention on Attention") captioner — Spatial and Detection variants.

Reference: Models/AoA_Model.py — scaled dot-product multi-head attention with
a GLU "attention on attention" gate (AoABlock, AoA_Model.py:71-120), a
6-layer pre-norm residual self-attention refiner over projected image
features (AoA_Refine_Core, :140-162), and an LSTM decoder whose input mixes
the word embedding with ``mean_features + dropout(ctx)`` where ``ctx`` is the
previous step's AoA output (AoA_Decoder, :197-293).

Parity notes:
* LayerNorm is the reference's hand-rolled unbiased-std variant
  (AoA_Model.py:14-25) — see ``layers.layer_norm_std``.
* The embedding re-init U(-0.1,0.1) (AoA_Model.py:219) is reproduced; the
  ``predict.weight`` re-init is a no-op under weight_norm, but the
  ``predict.bias`` zeroing (AoA_Model.py:221) is real and reproduced
  (see butd.py note).
* 'adaptive' bottom-up masking: masked feature projection zeroes padded rows
  (pack_wrapper semantics, AoA_Model.py:650-655), masked softmax via additive
  -1e9 (:63-64), masked mean features (:251-253).

TPU design: the refiner is a plain batched self-attention stack — pure XLA
einsums on the MXU.  For the decoder the K/V projections of the refined
features are hoisted into encode (computed once, reused for all ~20 steps;
the reference recomputes them every step, AoA_Model.py:114-115).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.models import resnet
from simpleimagecaptionzoo_tpu.models.base import Captioner, Encoded, register


def aoa_block_init(rng, d_model: int) -> dict:
    ks = jax.random.split(rng, 4)
    return {
        "q": L.dense_init(ks[0], d_model, d_model),
        "k": L.dense_init(ks[1], d_model, d_model),
        "v": L.dense_init(ks[2], d_model, d_model),
        "aoa": L.dense_init(ks[3], 2 * d_model, 2 * d_model),
    }


def aoa_block(params: dict, query: jnp.ndarray, key: jnp.ndarray,
              value: jnp.ndarray, mask: Optional[jnp.ndarray],
              num_heads: int, *, dropout_aoa: float, dropout_dot: float,
              train: bool, rng=None,
              kv_proj: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
    """AoABlock forward (AoA_Model.py:90-120).

    query (B,Tq,D); key/value (B,Tk,D); mask (B,Tk) or None.
    kv_proj: optional precomputed (k_proj, v_proj), each (B,Tk,D).
    Returns (x (B,Tq,D), mean-head attention (B,Tq,Tk)).
    """
    b, tq, d = query.shape
    dh = d // num_heads
    if rng is not None:
        r_dot, r_aoa = jax.random.split(rng)
    else:
        r_dot = r_aoa = None
    qp = L.dense(params["q"], query).reshape(b, tq, num_heads, dh)
    if kv_proj is None:
        kp = L.dense(params["k"], key).reshape(b, -1, num_heads, dh)
        vp = L.dense(params["v"], value).reshape(b, -1, num_heads, dh)
    else:
        kp = kv_proj[0].reshape(b, -1, num_heads, dh)
        vp = kv_proj[1].reshape(b, -1, num_heads, dh)
    # (B, H, Tq, Tk) on the MXU; accumulate in f32, carry activations in the
    # input dtype (keeps bf16 decode actually bf16 — dtype discipline)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :] == 0, -1e9, scores)
    p_atten = jax.nn.softmax(scores, axis=-1)
    p_drop = L.dropout(r_dot, p_atten, dropout_dot, train)
    x = jnp.einsum("bhqk,bkhd->bqhd", p_drop.astype(vp.dtype), vp,
                   preferred_element_type=jnp.float32
                   ).reshape(b, tq, d).astype(query.dtype)
    cat = jnp.concatenate([x, query], axis=-1)
    cat = L.dropout(r_aoa, cat, dropout_aoa, train)
    gated = L.dense(params["aoa"], cat)
    a, g = jnp.split(gated, 2, axis=-1)            # GLU (AoA_Model.py:83)
    out = a * jax.nn.sigmoid(g)
    return out, jnp.mean(p_atten, axis=1)


class _AoABase(Captioner):
    has_cnn = False
    # aoa_dec k/v are applied once in encode (hoisted K/V projections) and
    # the refiner runs once per batch — only the per-step consumers qualify
    decode_quant_paths = (("lstm",), ("aoa_dec", "q"), ("aoa_dec", "aoa"),
                          ("predict",))

    def init_params(self, rng, include_cnn: Optional[bool] = None) -> dict:
        cfg = self.config
        d = cfg.hidden_dim                        # d_model == hidden_dim
        ks = jax.random.split(rng, 10)
        refine = []
        for i in range(cfg.num_refine_layers):
            refine.append({
                "aoa": aoa_block_init(jax.random.fold_in(ks[0], i), d),
                "ln": L.layer_norm_std_init(d),
            })
        params = {
            "proj": L.dense_init(ks[1], cfg.enc_dim, d),
            "refine": refine,
            "refine_ln": L.layer_norm_std_init(d),
            "embed": L.embedding_init(ks[2], cfg.vocab_size, cfg.embed_dim,
                                      scale=0.1),
            "lstm": L.lstm_cell_init(ks[3], cfg.embed_dim + d, d),
            "aoa_dec": aoa_block_init(ks[4], d),
            "h_norm": L.layer_norm_std_init(d),
            "predict": L.dense_wn_init(ks[5], d, cfg.vocab_size,
                                       zero_bias=True),
        }
        include_cnn = self.has_cnn if include_cnn is None else include_cnn
        if include_cnn:
            cnn_params, self._cnn_stats = resnet.init(ks[6])
            params["cnn"] = cnn_params
        return params

    def init_model_state(self) -> dict:
        return {"cnn_stats": getattr(self, "_cnn_stats", None)}

    def _raw_features(self, params, visual, model_state, train=False):
        """-> (feats, mask, model_state) — model_state carries updated BN
        running stats when a CNN ran in train mode."""
        raise NotImplementedError

    def encode(self, params, visual: Dict[str, jnp.ndarray], *,
               train: bool = False, rng=None,
               model_state: Optional[dict] = None
               ) -> Tuple[Encoded, Optional[dict]]:
        cfg = self.config
        feats, mask, model_state = self._raw_features(params, visual,
                                                      model_state,
                                                      train=train)
        n_layers = cfg.num_refine_layers
        if rng is not None:
            rngs = jax.random.split(rng, n_layers + 1)
        else:
            rngs = [None] * (n_layers + 1)
        # masked projection (pack_wrapper semantics): padded rows -> exactly 0
        x = jax.nn.relu(L.dense(params["proj"], feats))
        x = L.dropout(rngs[0], x, cfg.dropout, train)
        if mask is not None:
            x = x * mask[..., None]
        # 6-layer pre-norm residual AoA refiner (AoA_Model.py:136-162)
        for i, layer in enumerate(params["refine"]):
            y = L.layer_norm_std(layer["ln"], x)
            out, _ = aoa_block(layer["aoa"], y, y, y, mask, cfg.num_heads,
                               dropout_aoa=cfg.dropout_aoa,
                               dropout_dot=cfg.dropout_dot_atten,
                               train=train, rng=rngs[i + 1])
            if train and cfg.dropout_sc > 0 and rngs[i + 1] is not None:
                out = L.dropout(jax.random.fold_in(rngs[i + 1], 7), out,
                                cfg.dropout_sc, train)
            x = x + out
        refined = L.layer_norm_std(params["refine_ln"], x)     # (B, N, D)
        if mask is None:
            mean = jnp.mean(refined, axis=1)
        else:
            mean = (jnp.sum(refined * mask[..., None], axis=1)
                    / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0))
        # hoist the decoder AoA block's K/V projections out of the step loop
        k_proj = L.dense(params["aoa_dec"]["k"], refined)
        v_proj = L.dense(params["aoa_dec"]["v"], refined)
        from simpleimagecaptionzoo_tpu.ops import int8_attention as IA
        from simpleimagecaptionzoo_tpu.ops import quant
        if (quant.is_quantized(params.get("predict"))
                and IA.encode_should_quantize(
                    refined.shape[0], refined.shape[1], cfg.hidden_dim,
                    cfg.num_heads)):
            # int8 decode mode + engaged kernel: store the hoisted K/V
            # int8 with per-row scales — the decode loop's largest
            # remaining HBM read, halved; dequant happens inside the
            # attention kernel so the loop truly reads 1 byte/element
            # (ops/int8_attention.py; opt-in, see its module docstring)
            k_q, k_s = IA.quantize_rows(k_proj)
            v_q, v_s = IA.quantize_rows(v_proj)
            extras = {"k_q": k_q, "k_s": k_s, "v_q": v_q, "v_s": v_s}
        else:
            extras = {"k_proj": k_proj, "v_proj": v_proj}
        return (Encoded(features=refined, mean=mean, mask=mask,
                        extras=extras),
                model_state)

    def _attend(self, params, query, encoded: Encoded, *, train: bool,
                rng):
        """Decoder AoA block over precomputed K/V: query (B, q, D) ->
        (gated ctx (B, q, D), mean-head attention (B, q, N)).  Dispatches
        on the encode-time K/V representation (bf16 hoisted projections vs
        int8 + per-row scales)."""
        cfg = self.config
        ex = encoded.extras
        int8_kv = "k_q" in ex
        if int8_kv:
            from simpleimagecaptionzoo_tpu.ops import int8_attention as IA
            if not IA.supported(query.shape[0], query.shape[1],
                                ex["k_q"].shape[1], cfg.hidden_dim,
                                cfg.num_heads):
                # encode gated on k<=4 but this decode runs a wider shape
                # the kernel rejects (e.g. large --eval_beam_size): dequant
                # ONCE to the query dtype so XLA hoists it out of the
                # decode loop and the per-step reads are bf16 — identical
                # traffic to bf16 extras, instead of the jnp fallback's
                # materialized-f32 copy
                ex = {"k_proj": (ex["k_q"].astype(query.dtype)
                                 * ex["k_s"][..., None].astype(query.dtype)),
                      "v_proj": (ex["v_q"].astype(query.dtype)
                                 * ex["v_s"][..., None].astype(query.dtype))}
                int8_kv = False
        if int8_kv:
            blk = params["aoa_dec"]
            qp = L.dense(blk["q"], query)
            x, alpha = IA.lanes_attention_int8(
                qp, ex["k_q"], ex["k_s"], ex["v_q"], ex["v_s"],
                encoded.mask, cfg.num_heads)
            # AoA gate (GLU) — identical tail to aoa_block (dropouts are
            # inactive: the int8 representation only exists in eval decode)
            cat = jnp.concatenate([x.astype(query.dtype), query], axis=-1)
            gated = L.dense(blk["aoa"], cat)
            a, g = jnp.split(gated, 2, axis=-1)
            return a * jax.nn.sigmoid(g), alpha
        return aoa_block(
            params["aoa_dec"], query, encoded.features, encoded.features,
            encoded.mask, cfg.num_heads,
            dropout_aoa=0.0,                       # AoA_Model.py:205
            dropout_dot=cfg.dropout_dot_atten,
            train=train, rng=rng,
            kv_proj=(ex["k_proj"], ex["v_proj"]))

    def init_state(self, params, encoded: Encoded):
        b = encoded.mean.shape[0]
        z = jnp.zeros((b, self.config.hidden_dim), encoded.mean.dtype)
        return {"h": z, "m": z, "ctx": z}

    def step_core(self, params, encoded: Encoded, state,
                  tokens: jnp.ndarray, *, train: bool = False, rng=None,
                  tf_input=None):
        cfg = self.config
        if rng is not None:
            r_emb, r_ctx, r_blk, r_out = jax.random.split(rng, 4)
        else:
            r_emb = r_ctx = r_blk = r_out = None
        ctx_in = encoded.mean + L.dropout(r_ctx, state["ctx"], cfg.dropout, train)
        if tf_input is not None:
            # teacher-forcing weight-stationary path: the embedding half of
            # w_ih was projected outside the scan (tf_inputs); only the
            # ctx rows are read per timestep
            w_ctx = jax.lax.slice_in_dim(params["lstm"]["w_ih"],
                                         cfg.embed_dim,
                                         params["lstm"]["w_ih"].shape[0])
            gates_x = tf_input["emb_gates"] + ctx_in @ w_ctx
            h, m = L.lstm_cell_gates(params["lstm"], gates_x,
                                     state["h"], state["m"])
        else:
            emb = jax.nn.relu(L.embedding(params["embed"], tokens))
            emb = L.dropout(r_emb, emb, cfg.dropout, train)
            h, m = L.lstm_cell(params["lstm"],
                               jnp.concatenate([emb, ctx_in], axis=-1),
                               state["h"], state["m"])
        q = L.layer_norm_std(params["h_norm"], h)[:, None, :]    # (B,1,D)
        ctx, alpha = self._attend(params, q, encoded, train=train,
                                  rng=r_blk)
        ctx = ctx[:, 0, :]
        out = L.dropout(r_out, ctx, cfg.dropout, train)
        return out, {"h": h, "m": m, "ctx": ctx}, alpha[:, 0, :]

    def tf_inputs(self, params, encoded: Encoded, tokens, step_rngs, *,
                  train: bool = False):
        """Embed + dropout + project all teacher-forcing tokens outside the
        scan; the emb half of w_ih (embed_dim of 2*D input rows) is then
        read once per training step instead of per timestep.  Replays
        step_core's rng discipline (r_emb = split(rng, 4)[0]) exactly."""
        lstm = params["lstm"]
        if not L.hoist_lstm_inputs(lstm):
            return None
        cfg = self.config
        emb = jax.nn.relu(L.embedding(params["embed"], tokens))  # (T,B,E)
        if step_rngs is not None:
            r_embs = jax.vmap(lambda k: jax.random.split(k, 4)[0])(step_rngs)
            emb = jax.vmap(
                lambda r, e: L.dropout(r, e, cfg.dropout, train))(r_embs, emb)
        w_emb = jax.lax.slice_in_dim(lstm["w_ih"], 0, cfg.embed_dim)
        return {"emb_gates": emb @ w_emb + lstm["b_ih"]}

    def init_lane_state(self, params, encoded: Encoded, k: int):
        b = encoded.mean.shape[0]
        z = jnp.zeros((b, k, self.config.hidden_dim), encoded.mean.dtype)
        return {"h": z, "m": z, "ctx": z}

    def step_lanes_core(self, params, encoded: Encoded, state, tokens, *,
                        train: bool = False, rng=None):
        """Beam-lane step with SHARED K/V: the k lanes of a sample ride the
        AoA block's query axis, so the sample's (N, D) keys/values are read
        once per step instead of once per lane.  Decode is HBM-bandwidth
        bound and K/V re-reads dominate it (docs/BENCHMARKS.md), making
        this ~40% faster than the lane-flattened default at beam 3.
        Returns the pre-logit ctx (B,k,D); the head is applied by the
        caller (base.step_lanes or the fused top-k kernel)."""
        cfg = self.config
        b, k = tokens.shape
        emb = jax.nn.relu(L.embedding(params["embed"], tokens))   # (B,k,E)
        ctx_in = encoded.mean[:, None, :].astype(state["ctx"].dtype) \
            + state["ctx"]
        x = jnp.concatenate([emb, ctx_in], axis=-1).reshape(b * k, -1)
        h, m = L.lstm_cell(params["lstm"], x,
                           state["h"].reshape(b * k, -1),
                           state["m"].reshape(b * k, -1))
        h = h.reshape(b, k, -1)
        m = m.reshape(b, k, -1)
        q = L.layer_norm_std(params["h_norm"], h)                 # (B,k,D)
        ctx, alpha = self._attend(params, q, encoded, train=train, rng=rng)
        return ctx, {"h": h, "m": m, "ctx": ctx}, alpha


@register("AoASpatial")
class AoASpatialCaptioner(_AoABase):
    has_cnn = True

    def _raw_features(self, params, visual, model_state, train=False):
        if "spatial_feats" in visual:
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


@register("AoADetection")
class AoADetectionCaptioner(_AoABase):
    has_cnn = False

    def _raw_features(self, params, visual, model_state, train=False):
        return visual["bu_feats"], visual.get("bu_masks"), model_state
