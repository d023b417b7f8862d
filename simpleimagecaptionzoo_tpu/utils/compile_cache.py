"""Persistent XLA compilation cache.

Every process in this framework (trainer, gate runs, bench, serving,
multi-host workers) pays 60-140 s of XLA compile time per program on a
cold start.  JAX ships a persistent on-disk compilation cache keyed on
the (HLO, compile options, backend version) fingerprint; enabling it
makes every run after the first hit warm-cache compiles (~100 ms of
deserialization instead of minutes of XLA work).  The reference has no
equivalent — torch eager pays no compile, but also gets no XLA fusion;
this is the TPU-native answer to that trade (SURVEY §6 perf notes).

Enabled automatically on package import (see ``__init__``).  Controls:

* ``SICZ_TPU_COMPILE_CACHE=0``   — disable entirely.
* ``SICZ_TPU_COMPILE_CACHE_DIR`` — override the cache directory
  (default ``~/.cache/simpleimagecaptionzoo_tpu/xla``).

The cache is shared across processes (JAX uses atomic renames), so
multi-host workers and serialized chip jobs all benefit from one
another's compiles.
"""
from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Idempotent; returns the cache dir, or None when disabled by env or
    when this jax build lacks the config knobs.
    """
    global _ENABLED
    if os.environ.get("SICZ_TPU_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = os.environ.get(
        "SICZ_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "simpleimagecaptionzoo_tpu", "xla"))
    if _ENABLED:
        return cache_dir
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took real compile work; sub-second
        # compiles aren't worth the disk round trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    _ENABLED = True
    return cache_dir
