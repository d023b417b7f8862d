"""Shared dispatch helpers for the optional Pallas kernels
(ops/pallas_lstm.py, ops/quant.py): one place for the env-var mode toggle
and the backend probe, so adding a backend name updates every kernel
dispatch site at once."""
from __future__ import annotations

import os

import jax


_WARNED: set = set()


def kernel_mode(env_var: str, default: str = "auto") -> str:
    """'auto' (kernel on TPU when shapes align), 'off', or 'interpret'
    (force the kernel in interpreter mode — tests).  ``default`` lets a
    kernel ship opt-in when measurement rejected it on the reference
    hardware (e.g. int8 K/V attention, docs/BENCHMARKS.md).

    Values normalize case-insensitively and the usual falsey spellings
    ('0', 'false', 'no', 'disable[d]') mean 'off' — a kill switch the user
    reached for must never be silently ignored.  Anything unrecognized
    warns once and falls back to ``default``."""
    raw = os.environ.get(env_var)
    if raw is None:
        return default
    val = raw.strip().lower()
    if val in ("0", "false", "no", "disable", "disabled"):
        return "off"
    if val in ("auto", "off", "interpret"):
        return val
    if (env_var, raw) not in _WARNED:
        _WARNED.add((env_var, raw))
        import warnings
        warnings.warn("%s=%r not recognized (auto|off|interpret); using %r"
                      % (env_var, raw, default))
    return default


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False
