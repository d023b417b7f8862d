"""Int8 K/V attention kernel for the AoA decode loop.

After weight-only int8 (ops/quant.py) and the fused top-k head
(ops/fused_head.py), the decoder AoA block's hoisted K/V projections are
the largest remaining per-step HBM read: (B, N, D) bf16 x2 — ~38 MB/step
at production shapes (B=256, N=36, D=1024), re-read every one of ~20
decode steps.  Storing them int8 with a per-row scale halves that term.

XLA cannot keep the encoding int8 through a decode loop: a
``kq.astype(bf16) * s`` dequant inside ``lax.while_loop`` is
loop-invariant, so XLA hoists it and materializes the bf16 copy once —
the loop then reads bf16 again (same failure as weights, see
ops/quant.py).  The dequant therefore lives inside this attention kernel,
between the HBM->VMEM copy and the compute:

    scores = (q @ kq^T) * k_s / sqrt(dh)   -- per-row scale folds into
    p      = softmax(mask(scores))            the scores
    out    = (p * v_s) @ vq                -- per-row scale folds into p

Quantization error affects only eval/serving decode (the same contract as
``--decode_dtype int8``); per-(sample, row) symmetric scales keep it at
int8-roundoff level.  Grid: (B/G samples, H heads) — each head windows
its dh-slice of the minor axis (blocks take the FULL row axis N, so no
tile-divisibility issue at N=36); per-head softmax runs over the row
axis; mean-head attention (the visualization alphas) accumulates across
the sequential h grid axis.

Env toggle: ``SICZ_TPU_INT8_KV=auto|off|interpret``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
_VMEM_BUDGET = 14 * 1024 * 1024


def _mode() -> str:
    # default OFF: measured -11% end to end on the reference chip (the
    # per-sample tiny matmuls cost more than the halved K/V traffic buys
    # back through this tunnel's degraded HBM; docs/BENCHMARKS.md "int8
    # K/V attention").  Opt in with SICZ_TPU_INT8_KV=auto on parts where
    # HBM bandwidth, not issue rate, is the binding constraint.
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_INT8_KV", default="off")


def _on_tpu() -> bool:
    from simpleimagecaptionzoo_tpu.ops.dispatch import on_tpu
    return on_tpu()


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, D) float -> (int8 (B, N, D), scales f32 (B, N)).
    Symmetric per-row scale; all-zero rows get scale eps and quantize to
    exact zeros."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref,
            out_ref, pmean_ref, *, heads: int, inv_sqrt_dh: float,
            g_block: int):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        pmean_ref[:] = jnp.zeros_like(pmean_ref)

    for g in range(g_block):
        q = q_ref[g].astype(jnp.float32)                    # (k, dh)
        kd = kq_ref[g].astype(jnp.float32)                  # (N, dh)
        scores = jax.lax.dot_general(
            q, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (k, N)
        scores = scores * ks_ref[g][None, :] * inv_sqrt_dh
        scores = jnp.where(mask_ref[g][None, :] > 0, scores, _NEG)
        p = jax.nn.softmax(scores, axis=-1)                 # (k, N)
        pv = p * vs_ref[g][None, :]
        vd = vq_ref[g].astype(jnp.float32)                  # (N, dh)
        out = jax.lax.dot_general(
            pv, vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (k, dh)
        out_ref[g] = out.astype(out_ref.dtype)
        pmean_ref[g] += p / heads


def _pick_g(b: int, k: int, n: int, dh: int) -> Optional[int]:
    for g in (16, 8, 4, 2, 1):
        if b % g:
            continue
        vmem = g * (k * dh * 4                  # q block (f32 upper bound)
                    + 2 * 2 * n * dh            # double-buffered int8 k,v
                    + 2 * n * dh * 4            # dequantized f32 k,v
                    + 3 * n * 4                 # scales + mask
                    + k * dh * 4 + k * n * 4    # out + pmean
                    + 2 * k * n * 4)            # scores/softmax temps
        if vmem <= _VMEM_BUDGET:
            return g
    return None


def encode_should_quantize(b: int, n: int, d: int, heads: int) -> bool:
    """Encode-time decision: only store int8 K/V when the step-time kernel
    will actually engage — the jnp fallback's in-loop dequant would be
    hoisted by XLA into a materialized f32 copy, making int8 storage
    strictly worse than bf16 extras."""
    mode = _mode()
    if mode == "off":
        return False
    if not (mode == "interpret" or _on_tpu()):
        return False
    return supported(b, 4, n, d, heads)     # k<=4 covers greedy + beam 3


def supported(b: int, k: int, n: int, d: int, heads: int) -> bool:
    if _mode() == "off":
        return False
    if heads <= 0 or d % heads:
        return False
    dh = d // heads
    if dh % 128 or n > 2048:
        return False
    return _pick_g(b, k, n, dh) is not None


def lanes_attention_int8(q: jnp.ndarray, kq: jnp.ndarray, ks: jnp.ndarray,
                         vq: jnp.ndarray, vs: jnp.ndarray,
                         mask: Optional[jnp.ndarray], num_heads: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q (B, k, D) x int8 K/V (B, N, D) + scales (B, N) -> (attended
    (B, k, D) in q.dtype, mean-head attention (B, k, N) f32).

    Kernel on TPU when shapes align; jnp fallback with identical math
    otherwise (dequant to f32, same op order)."""
    b, k, d = q.shape
    n = kq.shape[1]
    dh = d // num_heads
    mask_f = (jnp.ones((b, n), jnp.float32) if mask is None
              else mask.astype(jnp.float32))
    mode = _mode()
    use_kernel = (supported(b, k, n, d, num_heads)
                  and (mode == "interpret" or _on_tpu()))
    if use_kernel:
        g = _pick_g(b, k, n, dh)
        kern = functools.partial(_kernel, heads=num_heads,
                                 inv_sqrt_dh=1.0 / math.sqrt(dh),
                                 g_block=g)
        # blocks take the FULL k / N axes (always legal) and window the
        # minor D axis per head: (g, k|N, dh) at (i, 0, h)
        out, pmean = pl.pallas_call(
            kern,
            grid=(b // g, num_heads),
            in_specs=[
                pl.BlockSpec((g, k, dh), lambda i, h: (i, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n, dh), lambda i, h: (i, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n), lambda i, h: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n, dh), lambda i, h: (i, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n), lambda i, h: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n), lambda i, h: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g, k, dh), lambda i, h: (i, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, k, n), lambda i, h: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, k, d), q.dtype),
                jax.ShapeDtypeStruct((b, k, n), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * b * k * n * d,
                bytes_accessed=(q.size * q.dtype.itemsize + kq.size * 2
                                + b * n * 12),
                transcendentals=b * num_heads * k * n,
            ),
            interpret=(mode == "interpret"),
        )(q, kq, ks, vq, vs, mask_f)
        return out, pmean
    # fallback: identical math in plain jnp
    kf = kq.astype(jnp.float32) * ks[..., None]
    vf = vq.astype(jnp.float32) * vs[..., None]
    q4 = q.astype(jnp.float32).reshape(b, k, num_heads, dh)
    k4 = kf.reshape(b, n, num_heads, dh)
    v4 = vf.reshape(b, n, num_heads, dh)
    scores = jnp.einsum("bqhd,bnhd->bhqn", q4, k4) / math.sqrt(dh)
    scores = jnp.where(mask_f[:, None, None, :] > 0, scores, _NEG)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqn,bnhd->bqhd", p, v4).reshape(b, k, d)
    return out.astype(q.dtype), jnp.mean(p, axis=1)
