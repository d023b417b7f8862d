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
        # target side for device-resized fast-ingest batches (visual dicts
        # carrying "img_hw"; ops/image.prepare_images).  The engine sets
        # this to train_cfg.img_size; 224 is the reference default.
        self.ingest_out_size = 224

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

    def step_core(self, params, encoded: Encoded, state,
                  tokens: jnp.ndarray, *, train: bool = False, rng=None,
                  tf_input=None):
        """One decode step up to (but not including) the prediction head:
        (pre_logits (B,H), new_state, alpha (B,N) or None).

        Splitting the head out lets the teacher-forcing trainer apply it
        ONCE over the stacked per-step hiddens instead of re-reading the
        (H, V) predict weight from HBM every timestep of the scan — the
        single largest weight in every family (ops/decode.py).

        ``tf_input``, when given, is this timestep's slice of
        :meth:`tf_inputs` — precomputed input projections the step consumes
        instead of recomputing (and, crucially, instead of re-reading their
        weight slices from HBM inside the scan)."""
        raise NotImplementedError

    def tf_inputs(self, params, encoded: Encoded, tokens: jnp.ndarray,
                  step_rngs, *, train: bool = False):
        """Precompute per-timestep input projections for TEACHER-FORCED
        decoding, where — unlike free-running decode — every step's input
        token is known upfront.

        ``tokens`` (T, B) are the scan-major ground-truth inputs and
        ``step_rngs`` (T,) the per-step rng keys step_core would receive
        (or None); implementations must reproduce their own in-step rng
        split/dropout discipline exactly so losses are bit-identical to
        the in-scan formulation.  Returns a pytree of (T, ...) arrays the
        trainer scans alongside the tokens and feeds back as step_core's
        ``tf_input``, or None when the model cannot hoist (e.g. quantized
        decode params).  The win is weight traffic: the token-embedding
        rows of each cell's w_ih are then read from HBM once per training
        step instead of once per timestep in both forward and backward
        (docs/BENCHMARKS.md roofline).  Only valid when scheduled sampling
        is inactive — with ss draws the input tokens are not known upfront
        (ops/decode.teacher_forced_logits gates on that)."""
        return None

    def predict(self, params, pre_logits: jnp.ndarray) -> jnp.ndarray:
        """Prediction head: pre_logits (..., H) -> logits (..., V).
        All three families share the weight-norm linear head
        (NIC_Model.py:49, BUTD_Model.py:84, AoA_Model.py:212)."""
        from simpleimagecaptionzoo_tpu.models import layers as L
        return L.dense_wn(params["predict"], pre_logits)

    def step(self, params, encoded: Encoded, state, tokens: jnp.ndarray, *,
             train: bool = False, rng=None):
        """One decode step: (logits (B,V), new_state, alpha (B,N) or None)."""
        out, new_state, alpha = self.step_core(params, encoded, state,
                                               tokens, train=train, rng=rng)
        return self.predict(params, out), new_state, alpha

    def init_model_state(self) -> dict:
        """BatchNorm running statistics etc.; {} when stateless."""
        return {}

    # -- grouped-lanes protocol (beam search) ---------------------------------
    def init_lane_state(self, params, encoded: Encoded, k: int) -> Any:
        """Decoder state with a lanes axis: every leaf (B, k, ...).

        Default: init a flat (B*k) state from lane-broadcast encodings and
        fold the lanes axis back in."""
        enc_k = _broadcast_lanes(encoded, k)
        b = encoded.mean.shape[0]
        flat = self.init_state(params, _flatten_lanes(enc_k))
        return jax.tree_util.tree_map(
            lambda s: s.reshape((b, k) + s.shape[1:]), flat)

    def step_lanes_core(self, params, encoded: Encoded, state, tokens, *,
                        train: bool = False, rng=None):
        """One decode step over (B, k) lanes up to (but not including) the
        prediction head: (pre_logits (B,k,H), new_state (B,k,...),
        alpha (B,k,N)|None).

        The default flattens lanes into the batch axis and broadcasts the
        encoding — correct everywhere, but it re-reads each sample's
        attention K/V once *per lane* per step.  Attention models override
        this to put lanes on the query axis instead, reading K/V once per
        sample per step (the decode bandwidth bottleneck — see
        docs/BENCHMARKS.md).  The head split mirrors :meth:`step_core`: the
        beam engine can route the pre-logits through the fused
        head->log-softmax->top-k kernel (ops/fused_head.py) instead of
        materializing (B, k, V) logits."""
        b, k = tokens.shape
        enc_k = _flatten_lanes(_broadcast_lanes(encoded, k))
        flat_state = jax.tree_util.tree_map(
            lambda s: s.reshape((b * k,) + s.shape[2:]), state)
        pre, new_state, alpha = self.step_core(
            params, enc_k, flat_state, tokens.reshape(b * k),
            train=train, rng=rng)
        unflat = lambda x: x.reshape((b, k) + x.shape[1:])
        return (unflat(pre),
                jax.tree_util.tree_map(unflat, new_state),
                None if alpha is None else unflat(alpha))

    def step_lanes(self, params, encoded: Encoded, state, tokens, *,
                   train: bool = False, rng=None):
        """One decode step over (B, k) lanes that SHARE each sample's
        encoding: (logits (B,k,V), new_state (B,k,...), alpha (B,k,N)|None).
        """
        b, k = tokens.shape
        pre, new_state, alpha = self.step_lanes_core(
            params, encoded, state, tokens, train=train, rng=rng)
        logits = self.predict(params,
                              pre.reshape((b * k,) + pre.shape[2:]))
        return logits.reshape((b, k) + logits.shape[1:]), new_state, alpha

    # -- shared helpers ------------------------------------------------------
    #: layer dicts re-read from HBM every decode step (quantizable hot set);
    #: encode-side layers are deliberately excluded — they run once per
    #: batch, so int8 there is quality risk with no bandwidth payoff.
    decode_quant_paths: Tuple[Tuple[str, ...], ...] = ()

    def quantize_decode_params(self, params) -> Dict[str, Any]:
        """Weight-only int8 copy of ``params`` for the decode step loop
        (opt-in eval/serving speedup — see ops/quant.py).  The returned tree
        drops into any decode fn unchanged; non-listed layers stay at full
        precision."""
        from simpleimagecaptionzoo_tpu.ops import quant
        if not self.decode_quant_paths:
            return params
        return quant.quantize_tree(params, self.decode_quant_paths)

    def param_labels(self, params) -> Dict[str, Any]:
        """Label every leaf 'main', 'cnn', or 'cnn_frozen' for the
        two-LR optimizer partition (reference get_param_groups,
        NIC_Model.py:221-231).

        The reference's staged finetune unfreezes ONLY ResNet layer4
        (``feature_extractor.children()[7:]``, NIC_Model.py:238): the stem
        and layers 1-3 never enter any optimizer param group, so they see
        neither gradient updates nor SGD weight decay for the entire run.
        'cnn_frozen' reproduces that — :func:`apply_updates_partitioned`
        returns those leaves untouched, and the train steps stop-gradient
        them so XLA drops the sub-layer4 backward entirely."""
        def label(path, _leaf):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            if top != "cnn":
                return "main"
            sub = path[1].key if hasattr(path[1], "key") else str(path[1])
            return "cnn" if sub == "layer4" else "cnn_frozen"
        return jax.tree_util.tree_map_with_path(label, params)


def _broadcast_lanes(encoded: Encoded, k: int) -> Encoded:
    """Insert a lanes axis: every array leaf (B, ...) -> (B, k, ...)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], k) + x.shape[1:]),
        encoded)


def _flatten_lanes(tree):
    """(B, k, ...) leaves -> (B*k, ...)."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), tree)


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
