"""Fast-dropout path (``SICZ_TPU_FAST_DROPOUT``, models/layers.py:dropout).

The BUTD/AoA training scans draw a (B, N, A) attention dropout mask every
timestep (BUTD_Model.py:49-62 semantics); generating those Bernoulli bits
with ``lax.rng_bit_generator`` instead of threefry measured 1.27-1.31x on
the full XE train step across families (docs/BENCHMARKS.md).  These tests
pin the contract that makes the fast path safe to ship as the default:
torch-matching inverted-dropout semantics, per-key determinism, correct
keep-rate statistics, and BIT-IDENTICAL masks between the vmapped
teacher-forcing-hoist call and the in-scan call (the hoist's loss-parity
contract, models/butd.py:tf_inputs).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.models import layers as L


@pytest.fixture(params=["fast", "legacy"])
def dropout_mode(request, monkeypatch):
    monkeypatch.setenv("SICZ_TPU_FAST_DROPOUT",
                       "1" if request.param == "fast" else "0")
    return request.param


def test_noop_when_eval_or_rate_zero(dropout_mode):
    x = jnp.arange(12.0).reshape(3, 4)
    r = jax.random.PRNGKey(0)
    assert L.dropout(r, x, 0.5, False) is x
    assert L.dropout(r, x, 0.0, True) is x


def test_inverted_dropout_semantics_and_rate(dropout_mode):
    """Surviving elements scale by 1/keep; keep fraction ~= keep."""
    x = jnp.ones((500, 200), jnp.float32)
    for rate in (0.5, 0.3, 0.1):
        y = L.dropout(jax.random.PRNGKey(3), x, rate, True)
        vals = np.unique(np.asarray(y))
        assert all(min(abs(v), abs(v - 1.0 / (1 - rate))) < 1e-5
                   for v in vals), (rate, vals)
        keep_frac = float((y != 0).mean())
        assert abs(keep_frac - (1 - rate)) < 0.01, (rate, keep_frac)


def test_deterministic_per_key_and_varies_across_keys(dropout_mode):
    x = jnp.ones((64, 64))
    a = L.dropout(jax.random.PRNGKey(7), x, 0.5, True)
    b = L.dropout(jax.random.PRNGKey(7), x, 0.5, True)
    c = L.dropout(jax.random.PRNGKey(8), x, 0.5, True)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert (np.asarray(a) != np.asarray(c)).any()


def test_vmap_bit_identical_to_unbatched(dropout_mode):
    """The tf-hoist vmaps dropout over per-step keys OUTSIDE the scan;
    step_core draws the same mask INSIDE the scan.  Same key -> same mask
    in both contexts or the hoist's bit-identical-loss contract breaks."""
    keys = jax.random.split(jax.random.PRNGKey(11), 7)
    xs = jnp.ones((7, 33, 65), jnp.float32)
    via_vmap = jax.vmap(lambda k, e: L.dropout(k, e, 0.5, True))(keys, xs)
    direct = jnp.stack([L.dropout(keys[i], xs[i], 0.5, True)
                        for i in range(7)])
    assert (np.asarray(via_vmap) == np.asarray(direct)).all()


def test_grad_is_mask_over_keep(dropout_mode):
    x = jnp.ones((32, 32))
    r = jax.random.PRNGKey(5)
    g = jax.grad(lambda xx: L.dropout(r, xx, 0.5, True).sum())(x)
    y = L.dropout(r, x, 0.5, True)
    assert (np.asarray(g) == np.asarray(y)).all()      # x==1: y == mask/keep


def test_works_under_jit_and_scan(dropout_mode):
    x = jnp.ones((16, 24), jnp.bfloat16)

    def body(carry, k):
        return carry, L.dropout(k, x, 0.5, True).astype(jnp.float32).sum()

    _, sums = jax.jit(lambda ks: jax.lax.scan(body, 0, ks))(
        jax.random.split(jax.random.PRNGKey(0), 4))
    s = np.asarray(sums)
    assert np.isfinite(s).all() and (s > 0).all()
    # distinct per-step masks
    assert len(set(s.tolist())) > 1


def test_fast_and_legacy_agree_statistically():
    """Different bit streams, same distribution: mean of the inverted-
    dropout output stays ~1 under both paths."""
    x = jnp.ones((400, 400))
    outs = {}
    for flag in ("0", "1"):
        os.environ["SICZ_TPU_FAST_DROPOUT"] = flag
        try:
            outs[flag] = float(L.dropout(jax.random.PRNGKey(2), x, 0.3,
                                         True).mean())
        finally:
            os.environ.pop("SICZ_TPU_FAST_DROPOUT", None)
    assert abs(outs["0"] - 1.0) < 0.01
    assert abs(outs["1"] - 1.0) < 0.01
