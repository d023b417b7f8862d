"""Jit-compiled train / rollout / decode steps.

Each training regime of the reference becomes ONE fused XLA program:

* XE (reference Engine.py:175-188: forward -> LabelSmoothing -> backward ->
  value-clip -> step, with the decoder loop in Python): here encode + a
  ``lax.scan`` teacher-forced decode + masked label-smoothing loss + grad +
  optimizer update, all in a single ``jax.jit``.
* SCST (reference Engine.py:258-272 + Utils.py:319-367: greedy baseline,
  sampled rollout, decode-to-host, string ngrams, CiderD on CPU, reward back
  to GPU): here greedy + multinomial rollouts AND the CIDEr-D reward (hashed
  ngram idf tables in HBM, ops/cider.py) run on device in the same program —
  the host round-trip SURVEY.md §3.2 identifies as the dominant SCST cost is
  gone.

Data parallelism: the host places parameters replicated and the batch
sharded over the mesh's ``data`` axis (parallel/mesh.py); these steps are
ordinary ``jax.jit`` programs, so XLA propagates the shardings and inserts
the gradient all-reduce over ICI automatically.

Learning rates enter as dynamic scalars (see engine/optim.py) so the
staircase schedule never triggers recompilation.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.engine.optim import apply_updates_partitioned
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import Captioner
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.ops.cider import self_critical_reward
from simpleimagecaptionzoo_tpu.ops.losses import (label_smoothing_loss,
                                                  reward_criterion,
                                                  xe_mask_from_lengths)


def make_xe_train_step(model: Captioner, tx, labels,
                       smoothing: float = 0.1, freeze_cnn: bool = False,
                       compute_dtype=None, ss_active: bool = True):
    """Returns jitted ``step(state, batch, rng, ss_prob, lr_main, lr_cnn)``
    -> (state, metrics).  batch: visual dict + captions (B,T) + lengths (B,)
    (+ optional sample_weight (B,) 0/1 for padded final batches).

    ``freeze_cnn=True`` stop-gradients the ResNet backbone so XLA drops its
    entire backward pass — the reference pays it implicitly through
    requires_grad=False; here it's a static recompile at the finetune
    boundary (once per run).

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 (mixed
    precision: f32 master params and optimizer state, bf16 compute — the
    standard TPU training recipe; the loss itself stays f32).  The training
    scan is HBM-bandwidth-bound re-reading weights every timestep, so this
    roughly halves step time at production shapes.

    ``ss_active=False`` statically elides the in-scan scheduled-sampling
    prediction-head applications (the epochs before the ss schedule starts
    never pay them; same loss bit-for-bit — see
    ops/decode.teacher_forced_logits)."""

    def step(state: TrainState, batch: Dict[str, Any], rng,
             ss_prob, lr_main, lr_cnn):
        r_enc, r_dec = jax.random.split(rng)
        captions = batch["captions"]
        n_steps = captions.shape[1] - 1
        mask = xe_mask_from_lengths(batch["lengths"] - 1, n_steps)
        if "sample_weight" in batch:
            mask = mask * batch["sample_weight"][:, None]
        visual = _cast_floats(batch["visual"], compute_dtype)

        def loss_fn(params):
            params = _stop_cnn_grads(params, freeze_cnn)
            params = _cast_floats(params, compute_dtype)
            enc, new_ms = model.encode(params, visual, train=True,
                                       rng=r_enc,
                                       model_state=state.model_state)
            logits = decode.teacher_forced_logits(
                model, params, enc, captions, ss_prob, r_dec, train=True,
                ss_active=ss_active)
            loss = label_smoothing_loss(logits, captions[:, 1:], mask,
                                        smoothing)
            return loss, new_ms

        (loss, new_ms), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_partitioned(state.params, updates, labels,
                                               lr_main, lr_cnn)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  model_state=new_ms, step=state.step + 1)
        metrics = {"loss": loss,
                   "tokens": jnp.sum(mask)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_scst_train_step(model: Captioner, tx, labels,
                         cider_table: dict, probe: int,
                         max_len: int = 20, compute_dtype=None):
    """Returns jitted ``step(state, batch, rng, lr_main, lr_cnn)`` ->
    (state, metrics).  batch: visual dict + ref_ids (B,R,Lr) + ref_lens (B,R)
    (+ optional sample_weight).

    Greedy baseline runs in eval mode (no dropout — reference model.eval(),
    Engine.py:258) and is a constant wrt params; the sampled rollout runs in
    train mode and carries the REINFORCE gradient through its logprobs.
    ``compute_dtype`` — see :func:`make_xe_train_step`."""

    def step(state: TrainState, batch: Dict[str, Any], rng,
             lr_main, lr_cnn):
        r_enc, r_roll = jax.random.split(rng)
        visual = _cast_floats(batch["visual"], compute_dtype)
        weight = batch.get("sample_weight")
        params_c = _cast_floats(state.params, compute_dtype)

        enc_eval, _ = model.encode(params_c, visual, train=False,
                                   model_state=state.model_state)
        greedy_seq, _ = decode.greedy(model, params_c, enc_eval, max_len)
        greedy_seq = jax.lax.stop_gradient(greedy_seq)

        def loss_fn(params):
            params = _stop_cnn_grads(params, freeze=False)
            params = _cast_floats(params, compute_dtype)
            enc, new_ms = model.encode(params, visual, train=True, rng=r_enc,
                                       model_state=state.model_state)
            seq, logp = decode.sample_rl(model, params, enc, max_len, r_roll,
                                         train=True)
            reward = self_critical_reward(
                cider_table, probe, seq, greedy_seq,
                batch["ref_ids"], batch["ref_lens"],
                ref_norms=batch.get("ref_norms"))
            if weight is not None:
                reward = reward * weight
            loss = reward_criterion(logp, seq, reward, sample_weight=weight)
            return loss, (new_ms, reward)

        (loss, (new_ms, reward)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_partitioned(state.params, updates, labels,
                                               lr_main, lr_cnn)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  model_state=new_ms, step=state.step + 1)
        n = (jnp.sum(weight) if weight is not None
             else jnp.float32(reward.shape[0]))
        metrics = {"loss": loss,
                   "reward": jnp.sum(reward) / jnp.maximum(n, 1.0)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def _stop_cnn_grads(params, freeze: bool):
    """Reference finetune scope (NIC_Model.py:233-244): the backbone is
    either fully frozen (``freeze=True``, epochs before cnn_finetune_start)
    or trainable ONLY in layer4 (``children()[7:]``).  Stem + layers 1-3
    params are stop-gradiented in both cases, so XLA dead-code-eliminates
    their whole backward (images carry no gradient path either); their
    zero-update guarantee is enforced independently by the 'cnn_frozen'
    optimizer partition."""
    if "cnn" not in params:
        return params
    if freeze:
        return dict(params, cnn=jax.lax.stop_gradient(params["cnn"]))
    cnn = {k: (v if k == "layer4" else jax.lax.stop_gradient(v))
           for k, v in params["cnn"].items()}
    return dict(params, cnn=cnn)


def _cast_floats(tree, dtype):
    if dtype is None:
        return tree

    def rec(node):
        if isinstance(node, dict):
            if "q" in node and "s" in node:
                # weight-only int8 layer (ops/quant.py): the f32 scales and
                # bias are the quantization's error budget — never downcast
                return node
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    return rec(tree)


def make_greedy_decode(model: Captioner, max_len: int = 20,
                       return_alphas: bool = False, dtype=None):
    """Jitted eval decode: (params, model_state, visual) -> ids (B, max_len)
    [, alphas].  ``dtype=jnp.bfloat16`` runs the whole decode in bf16
    (halves HBM weight traffic — the decode bottleneck); log-softmax in the
    search itself stays f32 (ops/decode.py)."""

    def fn(params, model_state, visual):
        params = _cast_floats(params, dtype)
        visual = _cast_floats(visual, dtype)
        enc, _ = model.encode(params, visual, train=False,
                              model_state=model_state)
        ids, alphas = decode.greedy(model, params, enc, max_len)
        return (ids, alphas) if return_alphas else ids

    return jax.jit(fn)


def make_beam_decode(model: Captioner, beam_size: int = 3,
                     max_steps: int = 50, return_alphas: bool = False,
                     dtype=None):
    """Jitted batched beam decode: (params, model_state, visual) ->
    ids (B, max_steps+1) with column 0 = <sta> [, alphas]."""

    def fn(params, model_state, visual):
        params = _cast_floats(params, dtype)
        visual = _cast_floats(visual, dtype)
        enc, _ = model.encode(params, visual, train=False,
                              model_state=model_state)
        return decode.beam_search(model, params, enc, beam_size, max_steps,
                                  return_alphas=return_alphas)

    return jax.jit(fn)


def make_xe_eval_loss(model: Captioner, smoothing: float = 0.1):
    """Jitted validation loss (no dropout, no scheduled sampling)."""

    def fn(params, model_state, batch):
        captions = batch["captions"]
        n_steps = captions.shape[1] - 1
        mask = xe_mask_from_lengths(batch["lengths"] - 1, n_steps)
        if "sample_weight" in batch:
            mask = mask * batch["sample_weight"][:, None]
        enc, _ = model.encode(params, batch["visual"], train=False,
                              model_state=model_state)
        logits = decode.teacher_forced_logits(model, params, enc, captions,
                                              0.0, None, train=False)
        return label_smoothing_loss(logits, captions[:, 1:], mask, smoothing)

    return jax.jit(fn)
