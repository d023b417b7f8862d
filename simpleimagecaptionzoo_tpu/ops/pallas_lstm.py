"""Fused LSTM cell as a Pallas TPU kernel.

The reference's per-step decode is a chain of small torch ops (LSTMCell +
gates); under ``lax.scan`` XLA already fuses well, but the cell is still two
GEMMs plus five elementwise passes over the (B, 4H) gate block.  This kernel
computes::

    gates = [x, h] @ W + b;   c' = sig(f)*c + sig(i)*tanh(g);  h' = sig(o)*tanh(c')

in ONE pass: a K-tiled MXU matmul accumulating into a VMEM scratch with the
gate nonlinearities and state update applied as the epilogue of the final
K-step — the (B, 4H) gate block never round-trips to HBM.

Autodiff: ``lstm_cell_fused`` carries a custom VJP whose backward
recomputes the gates in plain jnp (one extra GEMM) and returns exact
gradients, so the kernel is usable inside SCST/XE training as well as
greedy/beam decode.

Alignment: requires H % 128 == 0 and B % 8 == 0 (f32 sublane x lane tiling,
pallas_guide.md "Tiling Constraints"); callers fall back to the jnp cell
otherwise (layers.lstm_cell).  K = E + H is zero-padded to the K-tile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TILE = 256
_VMEM_BUDGET = 14 * 1024 * 1024   # leave headroom under the ~16MB scoped cap


def _supported(in_dim: int, hidden: int, batch: int,
               itemsize: int = 4) -> bool:
    # native TPU tiling is (8,128) for f32 but (16,128) for bf16 — a bf16
    # batch that is only 8-aligned would rely on sublane padding
    min_batch = 16 if itemsize == 2 else 8
    if hidden % 128 != 0 or batch % min_batch != 0:
        return False
    # double-buffered xh + w tiles, f32 accumulator, c in, h/c out
    vmem = (2 * (batch * K_TILE + K_TILE * 4 * hidden) * itemsize
            + batch * 4 * hidden * 4 + 3 * batch * hidden * itemsize)
    return vmem <= _VMEM_BUDGET


def _kernel(xh_ref, w_ref, b_ref, c_ref, h_out, c_out, acc):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(xh_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(0) - 1)
    def _epilogue():
        hdim = h_out.shape[-1]
        gates = acc[:] + b_ref[:].astype(jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
        f = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
        g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
        o = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
        c_new = f * c_ref[:].astype(jnp.float32) + i * g
        h_out[:] = (o * jnp.tanh(c_new)).astype(h_out.dtype)
        c_out[:] = c_new.astype(c_out.dtype)


def _forward(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
             *, interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, hidden = h.shape
    xh = jnp.concatenate([x, h], axis=-1)
    w = jnp.concatenate([params["w_ih"], params["w_hh"]], axis=0)
    bias = (params["b_ih"] + params["b_hh"]).reshape(1, -1)
    k_total = xh.shape[-1]
    pad = (-k_total) % K_TILE
    if pad:
        xh = jnp.pad(xh, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
    n_k = (k_total + pad) // K_TILE
    out4h = 4 * hidden

    h_new, c_new = pl.pallas_call(
        _kernel,
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((b, K_TILE), lambda k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, out4h), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out4h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hidden), h.dtype),
            jax.ShapeDtypeStruct((b, hidden), c.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, out4h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (k_total + pad) * out4h,
            bytes_accessed=(xh.size + w.size + 2 * b * hidden) * 4,
            transcendentals=4 * b * hidden,
        ),
        interpret=interpret,
    )(xh, w, bias, c)
    return h_new, c_new


def _gates_jnp(params, x, h):
    return (x @ params["w_ih"] + params["b_ih"]
            + h @ params["w_hh"] + params["b_hh"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cell(params, x, h, c, interpret):
    return _forward(params, x, h, c, interpret=interpret)


def _cell_fwd(params, x, h, c, interpret):
    out = _forward(params, x, h, c, interpret=interpret)
    return out, (params, x, h, c)


def _cell_bwd(interpret, res, cotangents):
    """Exact LSTM-cell gradients; gates recomputed in jnp (one extra GEMM)
    instead of being saved from the kernel — VMEM stays free during fwd."""
    del interpret
    params, x, h, c = res
    dh_new, dc_new = cotangents
    hidden = h.shape[-1]
    gates = _gates_jnp(params, x, h)
    zi, zf, zg, zo = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(zi), jax.nn.sigmoid(zf), jax.nn.sigmoid(zo)
    g = jnp.tanh(zg)
    c_new = f * c + i * g
    tc = jnp.tanh(c_new)

    dh_new = dh_new.astype(jnp.float32)
    dc_total = dc_new.astype(jnp.float32) + dh_new * o * (1.0 - tc * tc)
    d_zo = dh_new * tc * o * (1.0 - o)
    d_zi = dc_total * g * i * (1.0 - i)
    d_zf = dc_total * c * f * (1.0 - f)
    d_zg = dc_total * i * (1.0 - g * g)
    d_gates = jnp.concatenate([d_zi, d_zf, d_zg, d_zo], axis=-1)
    # every cotangent must match its primal's dtype (custom_vjp contract),
    # including under mixed bf16/f32 encoder/decoder boundaries
    dx = (d_gates @ params["w_ih"].T).astype(x.dtype)
    dh = (d_gates @ params["w_hh"].T).astype(h.dtype)
    dc = (dc_total * f).astype(c.dtype)
    db = jnp.sum(d_gates, axis=0)
    dparams = {
        "w_ih": (x.astype(d_gates.dtype).T
                 @ d_gates).astype(params["w_ih"].dtype),
        "w_hh": (h.astype(d_gates.dtype).T
                 @ d_gates).astype(params["w_hh"].dtype),
        "b_ih": db.astype(params["b_ih"].dtype),
        "b_hh": db.astype(params["b_hh"].dtype),
    }
    del hidden
    return dparams, dx, dh, dc


_cell.defvjp(_cell_fwd, _cell_bwd)


def lstm_cell_fused(params: dict, x: jnp.ndarray, h: jnp.ndarray,
                    c: jnp.ndarray, interpret: bool = False):
    """Drop-in replacement for layers.lstm_cell backed by the Pallas kernel
    (falls back to the caller's jnp path when shapes are unaligned —
    callers check :func:`_supported`)."""
    return _cell(params, x, h, c, interpret)


def supported(params: dict, x: jnp.ndarray, h: jnp.ndarray) -> bool:
    # the kernel concatenates [x, h] and multiplies by params["w"]: all
    # three promote to the WIDEST dtype, so the VMEM estimate must size
    # tiles by that (a bf16 x with f32 h/params runs the kernel in f32 —
    # sizing by x alone would undercount VMEM 2x and fail Mosaic
    # compilation instead of falling back to the jnp cell)
    itemsize = max(x.dtype.itemsize, h.dtype.itemsize,
                   np.dtype(params["w_ih"].dtype).itemsize)
    return _supported(x.shape[-1], h.shape[-1], x.shape[0],
                      itemsize=itemsize)
