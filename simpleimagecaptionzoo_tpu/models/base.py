"""Captioner base contract + registry.

The reference gives every captioner six entry points (forward / sampler /
sampler_rl / beam_search_sampler / eval_test_image / get_param_groups,
SURVEY.md §1 "Models" row).  Here a captioner defines only *encode* and one
*decoder step*; training teacher-forcing, greedy, multinomial and beam
decoding are all derived from the step function by the shared engine in
``ops/decode.py`` — so they can't drift apart, and each is a single fused
XLA program instead of a Python loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.config import ModelConfig


@dataclasses.dataclass
class Encoded:
    """Output of a captioner's encode pass.

    features: (B, N, D) refined visual features the decoder attends over
              (N=1 row holding the embedded image for NIC).
    mean:     (B, D) pooled feature fed to the first LSTM / context mix.
    mask:     optional (B, N) 0/1 mask over feature rows ('adaptive'
              bottom-up features; None == all valid).
    """

    features: jnp.ndarray
    mean: jnp.ndarray
    mask: Optional[jnp.ndarray] = None
    extras: Optional[dict] = None
    """Model-specific encode-time precomputation (e.g. BUTD attention keys,
    AoA K/V projections) — computed ONCE here instead of per decode step as
    the reference does (BUTD_Model.py:57 recomputes enc_att every step)."""


jax.tree_util.register_pytree_node(
    Encoded,
    lambda e: ((e.features, e.mean, e.mask, e.extras), None),
    lambda _, xs: Encoded(*xs),
)


class Captioner:
    """Base class — concrete models implement the four methods below as pure
    functions of their parameter pytrees."""

    def __init__(self, config: ModelConfig) -> None:
        self.config = config

    # -- to implement -------------------------------------------------------
    def init_params(self, rng) -> Dict[str, Any]:
        raise NotImplementedError

    def encode(self, params, visual: Dict[str, jnp.ndarray], *,
               train: bool = False, rng=None,
               model_state: Optional[dict] = None
               ) -> Tuple[Encoded, Optional[dict]]:
        """visual dict -> (Encoded, updated model_state).

        ``model_state`` carries BatchNorm running statistics for models with a
        CNN head; pass-through (returned unchanged) in eval or for models
        without BN."""
        raise NotImplementedError

    def init_state(self, params, encoded: Encoded) -> Any:
        raise NotImplementedError

    def step(self, params, encoded: Encoded, state, tokens: jnp.ndarray, *,
             train: bool = False, rng=None):
        """One decode step: (logits (B,V), new_state, alpha (B,N) or None)."""
        raise NotImplementedError

    def init_model_state(self) -> dict:
        """BatchNorm running statistics etc.; {} when stateless."""
        return {}

    # -- shared helpers ------------------------------------------------------
    def param_labels(self, params) -> Dict[str, Any]:
        """Label every leaf 'cnn' (ResNet backbone) or 'main' for the
        two-LR optimizer partition (reference get_param_groups,
        NIC_Model.py:221-231)."""
        def label(path, _leaf):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return "cnn" if top == "cnn" else "main"
        return jax.tree_util.tree_map_with_path(label, params)


_REGISTRY: Dict[str, type] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_captioner(config: ModelConfig) -> Captioner:
    """Factory matching reference model_construction (Utils.py:161-203)."""
    # imports deferred to avoid cycles; importing registers the classes
    from simpleimagecaptionzoo_tpu.models import nic, butd, aoa  # noqa: F401
    if config.model_type not in _REGISTRY:
        raise ValueError("unknown model_type %r (have %s)"
                         % (config.model_type, sorted(_REGISTRY)))
    return _REGISTRY[config.model_type](config)
