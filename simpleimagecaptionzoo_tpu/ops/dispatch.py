"""Shared dispatch helpers for the optional Pallas kernels
(ops/pallas_lstm.py, ops/quant.py): one place for the env-var mode toggle
and the backend probe, so adding a backend name updates every kernel
dispatch site at once."""
from __future__ import annotations

import os

import jax


def kernel_mode(env_var: str) -> str:
    """'auto' (kernel on TPU when shapes align), 'off', or 'interpret'
    (force the kernel in interpreter mode — tests)."""
    return os.environ.get(env_var, "auto")


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False
