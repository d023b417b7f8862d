"""TPU-native captioner model families.

Each model family (NIC / BUTD / AoA) is a pure-functional captioner exposing
the step-function contract consumed by the model-agnostic on-device decode
engine (``ops/decode.py``):

* ``init_params(rng)`` -> parameter pytree
* ``encode(params, visual, train, rng)`` -> :class:`Encoded` (features, mean,
  mask)
* ``init_state(params, encoded)`` -> per-sample decoder state pytree
* ``step(params, encoded, state, tokens, train, rng)`` -> (logits, state, alpha)

This replaces the reference's per-model ``forward`` / ``sample`` /
``sample_rl`` / ``beam_search_sample`` quadruplicate Python loops
(e.g. Models/NIC_Model.py:58-212) with ONE step function per model and ONE
scan/while_loop-based decode engine shared by all of them.
"""
from simpleimagecaptionzoo_tpu.models.base import Encoded, get_captioner  # noqa: F401
