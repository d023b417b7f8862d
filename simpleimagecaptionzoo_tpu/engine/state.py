"""Functional training state (replaces torch's in-place module/optimizer)."""
from __future__ import annotations

from typing import Any, Optional

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any          # BatchNorm running stats etc. (non-trainable)
    step: Any                 # global step counter (int32 scalar)

    @classmethod
    def create(cls, params, tx, model_state=None):
        import jax.numpy as jnp
        return cls(params=params, opt_state=tx.init(params),
                   model_state=model_state if model_state is not None else {},
                   step=jnp.int32(0))

    def reset_optimizer(self, tx) -> "TrainState":
        """Epoch-boundary optimizer re-creation (reference Engine.py:135-138
        builds a fresh optimizer each epoch, resetting momenta)."""
        return self.replace(opt_state=tx.init(self.params))
