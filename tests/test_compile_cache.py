"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference has no compile step to cache; this is TPU-native
infrastructure: cold-start compiles (60-140 s/program on the chip)
become ~100 ms deserializations on every later run.  Verified here on
the CPU backend with an artificially low write threshold.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax, jax.numpy as jnp, os, sys
import simpleimagecaptionzoo_tpu  # enables the cache on import
# force every compile to be cacheable for the test
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
f(jnp.ones((64, 64))).block_until_ready()
os.makedirs(sys.argv[1], exist_ok=True)
print("ENTRIES", len([e for e in os.listdir(sys.argv[1])
                      if e.endswith("-cache")]))
"""


def _run(cache_dir, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               SICZ_TPU_COMPILE_CACHE_DIR=cache_dir,
               PYTHONPATH=REPO)
    env.update(extra_env or {})
    return subprocess.run([sys.executable, "-c", _PROBE, cache_dir],
                          capture_output=True, text=True, env=env,
                          timeout=300)


def test_cache_writes_and_hits(tmp_path):
    cache_dir = str(tmp_path / "xla")
    r1 = _run(cache_dir)
    assert r1.returncode == 0, r1.stderr
    n1 = int(r1.stdout.split("ENTRIES")[1])
    assert n1 >= 1, r1.stdout   # helper programs may add extra entries
    # second process: same programs must all HIT (entry count unchanged)
    r2 = _run(cache_dir)
    assert r2.returncode == 0, r2.stderr
    n2 = int(r2.stdout.split("ENTRIES")[1])
    assert n2 == n1, (r1.stdout, r2.stdout)


def test_cache_kill_switch(tmp_path):
    cache_dir = str(tmp_path / "xla")
    r = _run(cache_dir, {"SICZ_TPU_COMPILE_CACHE": "0"})
    assert r.returncode == 0, r.stderr
    assert "ENTRIES 0" in r.stdout, r.stdout
