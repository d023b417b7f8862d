"""Shared dispatch helpers for the optional Pallas kernels
(ops/pallas_lstm.py, ops/quant.py): one place for the env-var mode toggle
and the backend probe, so adding a backend name updates every kernel
dispatch site at once."""
from __future__ import annotations

import os

import jax


def kernel_mode(env_var: str, default: str = "auto") -> str:
    """'auto' (kernel on TPU when shapes align), 'off', or 'interpret'
    (force the kernel in interpreter mode — tests).  ``default`` lets a
    kernel ship opt-in when measurement rejected it on the reference
    hardware (e.g. int8 K/V attention, docs/BENCHMARKS.md)."""
    return os.environ.get(env_var, default)


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False
