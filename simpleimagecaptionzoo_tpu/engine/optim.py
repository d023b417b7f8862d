"""Optimizer layer (reference Utils.py:217-250 + Engine.py:126-138 semantics).

Reference behavior to preserve:
* SGD(momentum .9, weight_decay 1e-5) or Adam(.9/.999, eps 1e-8, wd 0)
  factories (Utils.py:222-229) with **two parameter groups** — the ResNet
  backbone at ``cnn_finetune_lr`` and everything else at the main LR
  (get_param_groups, NIC_Model.py:221-231);
* hard elementwise gradient *value* clamp before the step (±0.1 XE, ±0.25
  SCST; Engine.py:187,271 — a clamp, not a norm clip);
* the optimizer is **re-created every epoch** with the staircase-decayed LRs
  (Engine.py:135-138), i.e. momenta reset at epoch boundaries;
* the CNN partition is frozen (lr effectively 0) until
  ``epoch > cnn_finetune_start``.

TPU design: one jit-stable ``GradientTransformation`` producing *unscaled*
update directions; the per-partition learning rates enter the jitted train
step as **dynamic scalars** (no recompile when the schedule moves, no
hyperparam surgery inside optax states).  Epoch-boundary re-creation =
re-initializing the opt state, which the host loop does in one line.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def make_grad_transform(name: str, grad_clip: float) -> optax.GradientTransformation:
    """Direction-only transform: value-clamp then Adam/SGD moment logic.
    The caller multiplies by the (dynamic, per-partition) learning rate."""
    n = name.lower()
    if n == "adam":
        return optax.chain(
            optax.clip(grad_clip),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if n == "sgd":
        return optax.chain(
            optax.clip(grad_clip),
            optax.add_decayed_weights(1e-5),
            optax.trace(decay=0.9, nesterov=False),
        )
    raise ValueError(f"unknown optimizer {name!r} (Adam|SGD)")


def apply_updates_partitioned(params: Dict[str, Any], updates: Dict[str, Any],
                              labels: Dict[str, Any],
                              lr_main, lr_cnn) -> Dict[str, Any]:
    """p <- p - lr[label] * update, with lr_main / lr_cnn dynamic scalars.
    ``labels`` is the per-leaf 'main'/'cnn'/'cnn_frozen' tree from
    :meth:`Captioner.param_labels`.  'cnn_frozen' leaves (ResNet stem +
    layers 1-3) return untouched — the reference never places them in an
    optimizer param group, so even SGD weight decay must not move them."""
    lr_main = jnp.asarray(lr_main, jnp.float32)
    lr_cnn = jnp.asarray(lr_cnn, jnp.float32)

    def upd(p, u, lbl):
        if lbl == "cnn_frozen":
            return p
        lr = lr_cnn if lbl == "cnn" else lr_main
        return (p - lr * u).astype(p.dtype)

    return jax.tree_util.tree_map(upd, params, updates, labels)
