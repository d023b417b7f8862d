"""Training losses.

* :func:`label_smoothing_loss` — the reference's LabelSmoothingLoss
  (Utils.py:258-286): KL divergence between log-softmax predictions and a
  smoothed one-hot with mass ``eps/(V-1)`` off-target, averaged over real
  tokens.  The reference packs variable-length sequences
  (pack_padded_sequence); we keep static shapes and mask instead — identical
  per-token math, identical mean (sum over valid tokens / count).
  The KL's constant entropy term ``sum td*log(td)`` is included so reported
  loss values match the reference numerically.
* :func:`reward_criterion` — SCST REINFORCE loss (Utils.py:291-317):
  ``-logprob * reward`` masked up to and including the step where ``<end>``
  was emitted (mask = (seq > 0) shifted right one step with a leading 1),
  normalized by the mask sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         mask: jnp.ndarray, smoothing: float = 0.1
                         ) -> jnp.ndarray:
    """logits (B, T, V); targets (B, T) int; mask (B, T) {0,1} floats.

    Returns scalar: mean KL(true_dist || softmax(logits)) over valid tokens.
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    off = smoothing / (v - 1)
    # sum_i td_i * (log td_i - logp_i), computed without materializing (B,T,V)
    # one-hot: split the sum into the uniform-off-mass part and the target
    # correction.
    target_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    sum_logp = jnp.sum(logp, axis=-1)
    # cross-entropy part: -sum td*logp
    xent = -(off * (sum_logp - target_logp) + confidence * target_logp)
    # entropy part: sum td*log(td) (constant wrt params; kept for loss parity)
    ent = 0.0
    if off > 0:
        ent += (v - 1) * off * jnp.log(off)
    if confidence > 0:
        ent += confidence * jnp.log(confidence)
    per_token = xent + ent
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_token * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def xe_mask_from_lengths(lengths: jnp.ndarray, n_steps: int) -> jnp.ndarray:
    """lengths (B,) = caption_len - 1 (reference Engine.py:178) ->
    (B, n_steps) validity mask over prediction steps."""
    return (jnp.arange(n_steps)[None, :] < lengths[:, None]).astype(jnp.float32)


def reward_criterion(sample_logprobs: jnp.ndarray, seq: jnp.ndarray,
                     reward: jnp.ndarray,
                     sample_weight: jnp.ndarray = None) -> jnp.ndarray:
    """sample_logprobs (B, L); seq (B, L) ids (0 after <end>);
    reward (B, L) or (B,) broadcast.  Scalar loss.

    ``sample_weight`` (B,) 0/1 marks real vs filler rows in a padded final
    batch; filler rows are excluded from both the numerator and the
    mask-sum denominator (the reference never pads, Utils.py:291-317, so a
    weighted mask is the parity-preserving treatment — matching the XE
    step's handling)."""
    if reward.ndim == 1:
        reward = reward[:, None] * jnp.ones_like(sample_logprobs)
    mask = (seq > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
    if sample_weight is not None:
        mask = mask * sample_weight[:, None]
    out = -sample_logprobs * reward * mask
    return jnp.sum(out) / jnp.maximum(jnp.sum(mask), 1.0)
