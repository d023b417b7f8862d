"""Pure-JAX layer library with PyTorch-matching math and initializers.

Parameters are plain nested dicts of ``jnp.ndarray`` so they compose freely
with ``jax.grad``/``optax``/sharding without framework friction inside
``lax.scan`` decode loops.

Initializer parity notes (so converted reference checkpoints and
from-scratch training both behave):
* ``dense`` — torch ``nn.Linear`` default: W, b ~ U(-1/sqrt(fan_in), +)
* ``dense_wn`` — torch ``weight_norm(nn.Linear)`` (dim=0): direction ``v``
  plus per-row gain ``g``; effective ``W = g * v / ||v||_row``
  (reference: NIC_Model.py:24,49; BUTD_Model.py:43-45,84; AoA_Model.py:212)
* ``lstm_cell`` — torch ``nn.LSTMCell``: gate order i,f,g,o; two bias
  vectors; all params ~ U(-1/sqrt(H), +)
* ``layer_norm_std`` — AoA's hand-rolled LayerNorm normalizes by the
  *unbiased std* and adds eps to the std, not the variance
  (AoA_Model.py:14-25) — subtly different from standard LN; reproduced
  exactly.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def dense_init(rng, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(k1, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_dim,), bound)
    return p


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "q" in params:            # weight-only int8 decode path (ops/quant.py)
        from simpleimagecaptionzoo_tpu.ops import quant
        return quant.quant_matmul(x, params)
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def dense_wn_init(rng, in_dim: int, out_dim: int, bias: bool = True,
                  zero_bias: bool = False) -> dict:
    """Weight-norm parameterization: v (in,out), g (out,) with g initialized
    to ||v||_col so the initial effective weight equals v (torch semantics).
    ``zero_bias`` matches the reference's ``predict.bias.data.fill_(0)``
    re-init (BUTD_Model.py:90, AoA_Model.py:221) — weight_norm's hook makes
    the *weight* re-init a no-op, but the bias zeroing is real."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    v = _uniform(k1, (in_dim, out_dim), bound)
    g = jnp.linalg.norm(v, axis=0)
    p = {"v": v, "g": g}
    if bias:
        p["b"] = (jnp.zeros((out_dim,)) if zero_bias
                  else _uniform(k2, (out_dim,), bound))
    return p


def dense_wn(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "q" in params:            # weight-only int8 decode path (ops/quant.py)
        from simpleimagecaptionzoo_tpu.ops import quant
        return quant.quant_matmul(x, params)
    v = params["v"]
    # column norms in f32 even under a bf16 param cast: a bf16 sum of 1024
    # squares drifts ~0.3% and scales whole output columns; f32 here is
    # free (loop-invariant — XLA hoists the effective-weight computation)
    norm = jnp.linalg.norm(v.astype(jnp.float32), axis=0).astype(v.dtype)
    w = v * (params["g"] / (norm + 1e-12))
    y = x @ w
    if "b" in params:
        y = y + params["b"]
    return y


def embedding_init(rng, vocab_size: int, dim: int,
                   scale: Optional[float] = None) -> dict:
    """torch nn.Embedding default N(0,1); BUTD/AoA re-init U(-0.1,0.1)
    (BUTD_Model.py:88, AoA_Model.py:219) — pass ``scale=0.1`` for those."""
    if scale is None:
        table = jax.random.normal(rng, (vocab_size, dim))
    else:
        table = _uniform(rng, (vocab_size, dim), scale)
    return {"table": table}


def embedding(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


def lstm_cell_init(rng, in_dim: int, hidden_dim: int) -> dict:
    ks = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(hidden_dim)
    return {
        "w_ih": _uniform(ks[0], (in_dim, 4 * hidden_dim), bound),
        "w_hh": _uniform(ks[1], (hidden_dim, 4 * hidden_dim), bound),
        "b_ih": _uniform(ks[2], (4 * hidden_dim,), bound),
        "b_hh": _uniform(ks[3], (4 * hidden_dim,), bound),
    }


def _pallas_lstm_mode() -> str:
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_PALLAS_LSTM")


def _on_tpu() -> bool:
    from simpleimagecaptionzoo_tpu.ops.dispatch import on_tpu
    return on_tpu()


def lstm_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """torch nn.LSTMCell gate math (i, f, g, o packed along dim 0 of the
    weights; here along the output dim).

    Dispatches to the fused Pallas kernel (ops/pallas_lstm.py) on TPU when
    shapes meet the tiling constraints; the jnp fallback below is the
    semantic reference."""
    if "q" in params:            # weight-only int8 decode path (ops/quant.py)
        from simpleimagecaptionzoo_tpu.ops import quant
        gates = quant.quant_matmul(jnp.concatenate([x, h], axis=-1), params)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new
    mode = _pallas_lstm_mode()
    if mode != "off":
        from simpleimagecaptionzoo_tpu.ops import pallas_lstm
        if pallas_lstm.supported(params, x, h) and (
                mode == "interpret" or _on_tpu()):
            return pallas_lstm.lstm_cell_fused(
                params, x, h, c, interpret=(mode == "interpret"))
    gates = (x @ params["w_ih"] + params["b_ih"]
             + h @ params["w_hh"] + params["b_hh"])
    return _gate_math(gates, c)


def _gate_math(gates: jnp.ndarray, c: jnp.ndarray):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell_gates(params: dict, gates_x: jnp.ndarray, h: jnp.ndarray,
                    c: jnp.ndarray):
    """LSTM cell whose input-projection contribution arrives precomputed.

    ``gates_x`` = (the caller's partial sums of) x @ w_ih + b_ih.  Used by
    the weight-stationary step paths: a timestep-CONSTANT slice of the
    input (e.g. BUTD's pooled mean feature — 2048 of the td-LSTM's 4096
    input rows) is projected ONCE per sequence outside the scan, so its
    w_ih rows are read from HBM once instead of once per timestep in both
    the forward and backward passes (docs/BENCHMARKS.md roofline; VERDICT
    r3 next #2).  Callers must NOT use this with quantized ('q') or
    Pallas-fused cells — those consume the full-width concat input; models
    guard every hoist site with ``hoist_lstm_inputs``."""
    return _gate_math(gates_x + h @ params["w_hh"] + params["b_hh"], c)


def hoist_lstm_inputs(params: dict) -> bool:
    """Shared guard for the weight-stationary input-projection hoists.

    The hoist deliberately supersedes the fused Pallas cell: dropping
    timestep-constant w_ih rows from the per-step HBM read saves more
    bandwidth than the fusion does, so under the default ``auto`` mode the
    hoisted jnp path wins.  Two exceptions route back to ``lstm_cell``:
    int8-packed cells (the quant kernel consumes the full concat input)
    and ``SICZ_TPU_PALLAS_LSTM=interpret`` — the one spelling that
    explicitly forces the kernel (kernel-coverage tests drive the model
    paths under it; a switch the user reached for must never be silently
    ignored, ops/dispatch.py)."""
    return "q" not in params and _pallas_lstm_mode() != "interpret"


def layer_norm_std_init(dim: int) -> dict:
    return {"gain": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm_std(params: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """AoA_Model.py:22-25: unbiased std, eps added to std.

    Statistics are computed in f32 (bf16 variance is too coarse) and the
    result is cast back to the input dtype — a no-op in f32 mode, keeps
    bf16 decode actually bf16 (dtype discipline; see docs/BENCHMARKS.md)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    out = (params["gain"].astype(jnp.float32) * (xf - mean) / (std + eps)
           + params["bias"].astype(jnp.float32))
    return out.astype(x.dtype)


def _fast_dropout() -> bool:
    import os
    return os.environ.get("SICZ_TPU_FAST_DROPOUT", "1") != "0"


def _fast_mask_fn(shape, thresh: int):
    """Bernoulli mask via ``lax.rng_bit_generator`` (the backend's native
    bit generator — on TPU the hardware RNG) instead of threefry.

    Motivation: the BUTD/AoA training scans draw a (B, N, A) attention
    dropout mask EVERY timestep (BUTD_Model.py:49-62 semantics) — at
    B=512 that is 18.9M Bernoulli draws x 21 steps per forward, and
    threefry costs 10+ VPU ops per 32-bit word in the serial region of
    the scan.  The native generator produces the same volume at near
    memory rate.  Determinism: bits are a fixed function of (key, shape)
    for a given backend, so losses remain reproducible run-to-run on the
    same platform; the stream differs from the threefry path and across
    backends (dropout needs i.i.d. Bernoulli, not a particular stream —
    the reference's torch RNG stream differs too).  Set
    ``SICZ_TPU_FAST_DROPOUT=0`` for the threefry path.

    The ``custom_vmap`` rule exists for the teacher-forcing hoist, which
    vmaps dropout over the T step keys outside the scan
    (models/butd.py:tf_inputs): it replays the unbatched call per lane
    via ``lax.map`` so the hoisted mask stays BIT-IDENTICAL to the
    in-scan mask for the same per-step key (the hoist's loss-parity
    contract, tests/test_decode_consistency.py).
    """
    thresh32 = jnp.uint32(thresh)

    def raw(key4):
        return jax.lax.rng_bit_generator(key4, shape,
                                         dtype=jnp.uint32)[1] < thresh32

    @jax.custom_batching.custom_vmap
    def mask_fn(key4):
        return raw(key4)

    @mask_fn.def_vmap
    def _rule(axis_size, in_batched, keys):
        del axis_size
        return jax.lax.map(raw, keys), True

    return mask_fn


def dropout(rng, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics). No-op when not training or rate=0."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if _fast_dropout():
        data = (jax.random.key_data(rng)
                if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                else rng).astype(jnp.uint32)
        key4 = jnp.concatenate([data, data ^ jnp.uint32(0x9E3779B9)])
        # uint32 threshold: exact to 2^-32 (finer than the f32-uniform
        # comparison in jax.random.bernoulli); keep < 1 so no overflow
        thresh = min(int(round(keep * 4294967296.0)), 4294967295)
        mask = _fast_mask_fn(x.shape, thresh)(key4)
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray],
                   axis: int = -1) -> jnp.ndarray:
    """Softmax with additive -1e9 masking (AoA_Model.py:63-64 convention)."""
    if mask is not None:
        scores = jnp.where(mask == 0, -1e9, scores)
    return jax.nn.softmax(scores, axis=axis)
