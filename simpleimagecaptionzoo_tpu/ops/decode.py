"""Model-agnostic on-device decode engine.

All four decoding regimes of the reference are derived here from a single
per-model step function, as fused XLA programs with static shapes:

* :func:`teacher_forced_logits` — XE training forward with scheduled
  sampling inside the scan (reference: per-model Python loops, e.g.
  BUTD_Model.py:121-148, with a length-sorted shrinking batch; we use a
  fixed-shape batch + loss masking instead).
* :func:`greedy` — argmax decode in one ``lax.scan``
  (reference: NIC_Model.py:100-119 etc., Python loop).
* :func:`sample_rl` — multinomial rollout returning (seq, logprobs) with the
  reference's "unfinished" semantics: ids are zeroed from the step where
  ``<end>`` is sampled onward, logprobs recorded at every step
  (NIC_Model.py:121-151).
* :func:`beam_search` — **batched** fixed-k beam search in a
  ``lax.while_loop``, vmapped over the batch.  The reference runs beam
  search per-sentence with a Python loop and dynamic beam shrinking
  (NIC_Model.py:153-212, batch size forced to 1 — Utils.py:72-74).  We
  emulate the exact shrinking-k semantics with static shapes: lanes are
  ranked per step and candidates ranked >= k_remaining are killed, finished
  lanes are parked in a separate fixed-size pool.  Selection = best finished
  beam by raw cumulative logprob (no length normalization), falling back to
  the best live beam if nothing finished — identical to the reference.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu import END_ID, PAD_ID, STA_ID
from simpleimagecaptionzoo_tpu.models.base import Captioner, Encoded

_NEG = -1e18


def _scan_unroll(regime: str = "xe") -> int:
    """Body-replication factor for the training scans (teacher forcing /
    SCST rollout).  ``lax.scan(unroll=k)`` lets XLA CSE the per-timestep
    weight fetches across k adjacent steps — the multi-timestep
    weight-stationary formulation — at the cost of a k× bigger program.

    Defaults are PER-REGIME from the round-4 on-chip sweep
    (docs/BENCHMARKS.md): the SCST rollout scan measured +7% at unroll=4
    while teacher forcing *regresses* under any unroll (bigger program, no
    fusion win — its weight fetches are already hoisted), so ``scst``
    defaults to 4 and ``xe`` to 1.  ``SICZ_TPU_SCAN_UNROLL`` overrides BOTH
    regimes (the round-4 sweep knob, kept for hardware sweeps);
    ``SICZ_TPU_SCAN_UNROLL_XE`` / ``_SCST`` override one.  Read at trace
    time; numerics are unchanged by construction (same ops, same order —
    locked by tests/test_decode_consistency.py)."""
    default = 4 if regime == "scst" else 1
    for var in ("SICZ_TPU_SCAN_UNROLL_" + regime.upper(),
                "SICZ_TPU_SCAN_UNROLL"):
        try:
            return max(1, int(os.environ[var]))
        except (KeyError, ValueError):
            continue
    return default


def _split_or_none(rng, n: int):
    """Per-step rng keys as a scan-able (n,) key array, or None."""
    if rng is None:
        return None
    return jax.random.split(rng, n)


def _categorical(r_draw, logits: jnp.ndarray) -> jnp.ndarray:
    """Multinomial draw over the vocab axis (int32 ids).

    Default path samples by Gumbel-max with uniforms from
    ``lax.rng_bit_generator`` (the backend's native generator) instead of
    ``jax.random.categorical``'s threefry: the SCST rollout draws
    (B, V) = 1.3M gumbels EVERY step inside the serial scan region, where
    threefry's 10+ VPU ops/word are unoverlapped (same finding as the
    attention-dropout masks, models/layers.py:dropout).  The sampled-id
    DISTRIBUTION is unchanged (exact Gumbel-max, f32 — the same scheme
    jax.random.categorical uses); only the bit stream differs, which is
    semantics-neutral for sampling (reference torch draws from its own
    stream too, Utils.py:291-367).  ``SICZ_TPU_FAST_SAMPLE=0`` restores
    the threefry path."""
    if os.environ.get("SICZ_TPU_FAST_SAMPLE", "1") != "0":
        data = (jax.random.key_data(r_draw)
                if jnp.issubdtype(r_draw.dtype, jax.dtypes.prng_key)
                else r_draw).astype(jnp.uint32)
        key4 = jnp.concatenate([data, data ^ jnp.uint32(0x85EBCA6B)])
        _, bits = jax.lax.rng_bit_generator(key4, logits.shape,
                                            dtype=jnp.uint32)
        # uniform in (0, 1): 24 high bits + half-ulp offset keeps log()
        # away from both endpoints
        u = ((bits >> jnp.uint32(8)).astype(jnp.float32)
             * jnp.float32(2 ** -24) + jnp.float32(2 ** -25))
        g = -jnp.log(-jnp.log(u))
        return jnp.argmax(logits.astype(jnp.float32) + g,
                          axis=-1).astype(jnp.int32)
    return jax.random.categorical(r_draw, logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# teacher forcing (XE training forward)
# ---------------------------------------------------------------------------

def teacher_forced_logits(model: Captioner, params, encoded: Encoded,
                          captions: jnp.ndarray, ss_prob,
                          rng, train: bool = True,
                          ss_active: Optional[bool] = None) -> jnp.ndarray:
    """captions (B, T) -> logits (B, T-1, V).

    Step t consumes captions[:, t] (or, from t >= 2 with prob ``ss_prob`` per
    sample, a multinomial draw from the previous step's predictions —
    scheduled sampling, reference NIC_Model.py:79-90) and predicts token t+1.

    The prediction head is HOISTED out of the scan: the scan carries the
    per-step pre-logit hiddens and the loss logits come from ONE
    (B*T, H) @ (H, V) matmul afterwards, so the (H, V) predict weight — the
    largest in every family — is read from HBM once per step-direction
    instead of once per timestep, and the backward pass differentiates one
    matmul instead of T.  Scheduled sampling still needs per-step logits to
    draw from, but sampling is non-differentiable, so those in-scan head
    applications are gradient-free (stop_gradient); pass
    ``ss_active=False`` (a STATIC flag — one recompile at the schedule
    boundary, like the engine's freeze_cnn variants) to elide them entirely
    in the epochs before the schedule starts while keeping ``rng`` for
    dropout.  ``ss_active=None`` infers from ``rng`` presence.
    """
    b, t_total = captions.shape
    n_steps = t_total - 1
    h_dim = model.config.hidden_dim
    state0 = model.init_state(params, encoded)
    rngs = _split_or_none(rng, n_steps)
    ss_prob = jnp.asarray(ss_prob, jnp.float32)
    use_ss = (rng is not None) if ss_active is None \
        else (bool(ss_active) and rng is not None)

    t_idx = jnp.arange(n_steps)
    gt_toks = captions[:, :-1].T                      # (n_steps, B)
    # weight-stationary input hoist: with scheduled sampling inactive the
    # scan's input tokens are the ground truth, known upfront — so the
    # model may embed/dropout/project ALL of them here, outside the scan,
    # and the per-timestep loop stops re-reading the token rows of w_ih
    # from HBM in both forward and backward (Captioner.tf_inputs; numerics
    # bit-identical, tests/test_decode_consistency.py)
    tf_in = None
    if not use_ss:
        step_rngs = None
        if rngs is not None:
            # mirror of the in-body 3-way split's r_step stream
            step_rngs = jax.vmap(lambda k: jax.random.split(k, 3)[2])(rngs)
        tf_in = model.tf_inputs(params, encoded, gt_toks, step_rngs,
                                train=train)

    def body(carry, xs):
        state, prev_hidden = carry
        t, gt_tok, rng_t, tf_t = xs
        if rng_t is not None:
            # 3-way split regardless of use_ss so the dropout stream (and
            # therefore the loss) is bit-identical across the two variants
            r_ss, r_draw, r_step = jax.random.split(rng_t, 3)
            if use_ss:
                use_model = ((jax.random.uniform(r_ss, (b,)) < ss_prob)
                             & (t >= 2))
                prev_logits = jax.lax.stop_gradient(
                    model.predict(params, prev_hidden))
                drawn = _categorical(r_draw, prev_logits)
                tok = jnp.where(use_model, drawn, gt_tok)
            else:
                tok = gt_tok
        else:
            r_step = None
            tok = gt_tok
        hidden, state, _ = model.step_core(params, encoded, state, tok,
                                           train=train, rng=r_step,
                                           tf_input=tf_t)
        return (state, hidden), hidden

    xs = (t_idx, gt_toks, rngs, tf_in)
    # hidden dtype follows the compute dtype (bf16 under mixed precision);
    # the t=0 init value only feeds draws gated off by t >= 2
    init_hidden = jnp.zeros((b, h_dim), encoded.mean.dtype)
    (_, _), hidden_t = jax.lax.scan(body, (state0, init_hidden), xs,
                                    unroll=_scan_unroll("xe"))
    hiddens = jnp.transpose(hidden_t, (1, 0, 2))      # (B, n_steps, H)
    return model.predict(params, hiddens)             # (B, n_steps, V)


# ---------------------------------------------------------------------------
# greedy decode
# ---------------------------------------------------------------------------

def greedy(model: Captioner, params, encoded: Encoded, max_len: int = 20,
           train: bool = False, rng=None
           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (ids (B, max_len), alphas (B, max_len, N) or None).

    Runs as a ``lax.while_loop`` that exits as soon as every lane has
    emitted ``<end>`` — on short-caption batches this skips most of the
    ``max_len`` step budget (the reference decodes all 20 steps
    unconditionally, NIC_Model.py:111-118; its host detok then discards
    everything past ``<end>``).  Lanes are padded with ``<pad>`` after their
    ``<end>``, which also makes the output independent of how long other
    lanes keep the loop alive (batch-size invariance)."""
    from simpleimagecaptionzoo_tpu.ops import fused_head
    b = encoded.mean.shape[0]
    state0 = model.init_state(params, encoded)
    tok0 = jnp.full((b,), STA_ID, jnp.int32)
    rngs = _split_or_none(rng, max_len)
    # fused head->argmax kernel: skips materializing (B, V) logits in HBM
    # every step (static trace-time choice; classic path when unsupported)
    use_fused = fused_head.enabled(params.get("predict"), b, 1,
                                   encoded.mean.dtype)

    # static probe: does this model emit attention alphas?
    alpha_sds = jax.eval_shape(
        lambda p, e, s, t: model.step(p, e, s, t, train=False, rng=None)[2],
        params, encoded, state0, tok0)
    carry0 = dict(t=jnp.int32(0), state=state0, tok=tok0,
                  finished=jnp.zeros((b,), jnp.bool_),
                  ids=jnp.full((b, max_len), PAD_ID, jnp.int32))
    if alpha_sds is not None:
        carry0["alphas"] = jnp.zeros((b, max_len) + alpha_sds.shape[1:],
                                     jnp.float32)

    def cond(c):
        return (c["t"] < max_len) & ~jnp.all(c["finished"])

    def body(c):
        t = c["t"]
        rng_t = None if rngs is None else rngs[t]
        if use_fused:
            hidden, state, alpha = model.step_core(
                params, encoded, c["state"], c["tok"], train=train,
                rng=rng_t)
            nxt = fused_head.topk_head(params["predict"], hidden,
                                       1)[1][:, 0]
        else:
            logits, state, alpha = model.step(params, encoded, c["state"],
                                              c["tok"], train=train,
                                              rng=rng_t)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(c["finished"], PAD_ID, nxt)
        out = dict(t=t + 1, state=state, tok=nxt,
                   finished=c["finished"] | (nxt == END_ID),
                   ids=c["ids"].at[:, t].set(nxt))
        if alpha is not None:
            out["alphas"] = c["alphas"].at[:, t, :].set(
                jnp.where(c["finished"][:, None], 0.0,
                          alpha.astype(jnp.float32)))
        return out

    c = jax.lax.while_loop(cond, body, carry0)
    return c["ids"], c.get("alphas")


# ---------------------------------------------------------------------------
# multinomial rollout (SCST)
# ---------------------------------------------------------------------------

def sample_rl(model: Captioner, params, encoded: Encoded, max_len: int,
              rng, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (seq (B, max_len), logprobs (B, max_len)).

    seq carries the sampled ids with everything from the ``<end>`` step on
    zeroed (including the ``<end>`` itself); logprobs carry the sampled
    token's logprob at every step regardless — exact reference semantics
    (NIC_Model.py:134-150).

    Like :func:`teacher_forced_logits`, the prediction head's BACKWARD is
    hoisted: sampling inside the scan uses gradient-free per-step logits
    (sampling is non-differentiable anyway), and the logprobs REINFORCE
    differentiates come from one (B*T, H) @ (H, V) head application over
    the stacked hiddens — the backward reads the largest weight once
    instead of once per timestep.  Sampled ids are bit-identical to the
    per-step formulation; the recorded logprob values agree to matmul-
    tiling ulps (equivalence-locked in tests/test_decode_consistency.py).
    """
    b = encoded.mean.shape[0]
    state0 = model.init_state(params, encoded)
    tok0 = jnp.full((b,), STA_ID, jnp.int32)
    unfinished0 = jnp.ones((b,), jnp.bool_)
    rngs = jax.random.split(rng, max_len)

    def body(carry, rng_t):
        state, tok, unfinished = carry
        r_step, r_draw = jax.random.split(rng_t)
        hidden, state, _ = model.step_core(params, encoded, state, tok,
                                           train=train, rng=r_step)
        logits = jax.lax.stop_gradient(model.predict(params, hidden))
        drawn = _categorical(r_draw, logits)
        unfinished = unfinished & (drawn != END_ID)
        masked = drawn * unfinished.astype(jnp.int32)
        return (state, masked, unfinished), (masked, drawn, hidden)

    (_, _, _), (seq_t, drawn_t, hid_t) = jax.lax.scan(
        body, (state0, tok0, unfinished0), rngs,
        unroll=_scan_unroll("scst"))
    hiddens = jnp.transpose(hid_t, (1, 0, 2))          # (B, T, H)
    logits_all = model.predict(params, hiddens)        # one head application
    # f32 log-softmax: REINFORCE differentiates through these logprobs;
    # bf16 compute (mixed-precision SCST) would lose gradient precision
    logp_all = jax.nn.log_softmax(logits_all.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp_all, drawn_t.T[..., None],
                                   axis=-1)[..., 0]    # (B, T)
    return seq_t.T, tok_logp


# ---------------------------------------------------------------------------
# batched beam search
# ---------------------------------------------------------------------------

def beam_search(model: Captioner, params, encoded: Encoded,
                beam_size: int = 3, max_steps: int = 50,
                return_alphas: bool = False):
    """Batched beam search.  Returns ids (B, max_steps+1) — column 0 is
    ``<sta>``, the winning sequence ends with ``<end>`` (rest padded) — and,
    if requested, alphas (B, max_steps, N).

    The per-sample search (vmapped over B) reproduces the reference's
    shrinking-k algorithm with static shapes; see module docstring.
    """
    from simpleimagecaptionzoo_tpu.ops import fused_head
    k = beam_size
    b = encoded.mean.shape[0]
    num_feat = encoded.features.shape[1]
    b_rows = jnp.arange(b)[:, None]                       # (B, 1)
    # fused head->log-softmax->top-k: per-lane top-k candidates from the
    # kernel (union of per-lane top-k contains the global top-k, see
    # ops/fused_head.py), merged over (k, k) instead of (k, V) — the
    # (B, k, V) logits tensor is never materialized.  Static trace-time
    # choice; the classic full-logits formulation runs when unsupported.
    use_fused = fused_head.enabled(params.get("predict"), b * k, k,
                                   encoded.mean.dtype)

    def lane_gather(a, prev):
        """Gather lanes: a (B,k,...) indexed by prev (B,k) along axis 1."""
        idx = prev.reshape(prev.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, idx, axis=1)

    state0 = model.init_lane_state(params, encoded, k)
    tokens0 = jnp.full((b, k, max_steps + 1), PAD_ID, jnp.int32
                       ).at[:, :, 0].set(STA_ID)
    scores0 = jnp.tile(jnp.full((k,), _NEG).at[0].set(0.0)[None],
                       (b, 1))                            # lane 0 live
    carry0 = dict(t=jnp.int32(0), tokens=tokens0, scores=scores0,
                  state=state0,
                  fin_tokens=jnp.zeros_like(tokens0),
                  fin_scores=jnp.full((b, k), _NEG),
                  fin_count=jnp.zeros((b,), jnp.int32),
                  k_rem=jnp.full((b,), k, jnp.int32))
    if return_alphas:
        # alphas buffers are only carried when asked for — gathering
        # (B, k, max_steps, N) histories every step is pure loop overhead
        # for the eval path, which only needs ids
        alphas0 = jnp.zeros((b, k, max_steps, num_feat), jnp.float32)
        carry0["alphas"] = alphas0
        carry0["fin_alphas"] = jnp.zeros_like(alphas0)

    def cond(c):
        return (c["t"] < max_steps) & jnp.any(c["k_rem"] > 0)

    def body(c):
        t = c["t"]
        cur_tok = jax.lax.dynamic_index_in_dim(
            c["tokens"], t, axis=2, keepdims=False)       # (B, k)
        if use_fused:
            pre, new_state, alpha = model.step_lanes_core(
                params, encoded, c["state"], cur_tok, train=False, rng=None)
            vals, idx, lse = fused_head.topk_head(
                params["predict"], pre.reshape((b * k,) + pre.shape[2:]), k)
            logp_top = (vals - lse[:, None]).reshape(b, k * k)
            cand = (jnp.repeat(c["scores"], k, axis=1) + logp_top)
            top_scores, flat_idx = jax.lax.top_k(cand, k)  # over k*k cands
            prev = flat_idx // k
            tok = jnp.take_along_axis(idx.reshape(b, k * k), flat_idx,
                                      axis=1).astype(jnp.int32)
        else:
            logits, new_state, alpha = model.step_lanes(
                params, encoded, c["state"], cur_tok, train=False, rng=None)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            v = logp.shape[-1]
            cand = (c["scores"][..., None] + logp).reshape(b, k * v)
            top_scores, flat_idx = jax.lax.top_k(cand, k)     # (B, k)
            prev = flat_idx // v
            tok = (flat_idx % v).astype(jnp.int32)
        valid = jnp.arange(k)[None, :] < c["k_rem"][:, None]   # shrinking k
        is_end = (tok == END_ID) & valid

        new_tokens = lane_gather(c["tokens"], prev)
        new_tokens = jax.lax.dynamic_update_index_in_dim(
            new_tokens, tok, t + 1, axis=2)
        gathered_state = jax.tree_util.tree_map(
            lambda s: lane_gather(s, prev), new_state)

        # park newly finished candidates in the per-sample finished pool
        slot = jnp.where(is_end,
                         c["fin_count"][:, None]
                         + jnp.cumsum(is_end, axis=1) - 1, k)
        fin_tokens = c["fin_tokens"].at[b_rows, slot].set(new_tokens,
                                                          mode="drop")
        fin_scores = c["fin_scores"].at[b_rows, slot].set(top_scores,
                                                          mode="drop")
        n_end = jnp.sum(is_end, axis=1).astype(jnp.int32)
        live_scores = jnp.where(valid & ~is_end, top_scores, _NEG)
        out = dict(t=t + 1, tokens=new_tokens, scores=live_scores,
                   state=gathered_state,
                   fin_tokens=fin_tokens, fin_scores=fin_scores,
                   fin_count=c["fin_count"] + n_end,
                   k_rem=c["k_rem"] - n_end)
        if return_alphas:
            if alpha is None:
                alpha = jnp.zeros((b, k, num_feat), jnp.float32)
            new_alphas = lane_gather(c["alphas"], prev)
            new_alphas = jax.lax.dynamic_update_index_in_dim(
                new_alphas, lane_gather(alpha, prev).astype(jnp.float32),
                t, axis=2)
            out["alphas"] = new_alphas
            out["fin_alphas"] = c["fin_alphas"].at[b_rows, slot].set(
                new_alphas, mode="drop")
        return out

    c = jax.lax.while_loop(cond, body, carry0)
    # pick: best finished beam, else best live beam (NIC_Model.py:204-211)
    any_fin = c["fin_count"] > 0
    fin_best = jnp.argmax(c["fin_scores"], axis=1)
    live_best = jnp.argmax(c["scores"], axis=1)

    def pick(pool, live, best_fin, best_live):
        chosen_fin = lane_gather(pool, best_fin[:, None])[:, 0]
        chosen_live = lane_gather(live, best_live[:, None])[:, 0]
        sel = any_fin.reshape((b,) + (1,) * (chosen_fin.ndim - 1))
        return jnp.where(sel, chosen_fin, chosen_live)

    ids = pick(c["fin_tokens"], c["tokens"], fin_best, live_best)
    if not return_alphas:
        return ids
    alphas = pick(c["fin_alphas"], c["alphas"], fin_best, live_best)
    return ids, alphas


# ---------------------------------------------------------------------------
# convenience jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3))
def greedy_jit(model, params, encoded, max_len):
    return greedy(model, params, encoded, max_len)[0]


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def beam_search_jit(model, params, encoded, beam_size, max_steps):
    return beam_search(model, params, encoded, beam_size, max_steps)
