"""Weight-only int8 quantization for the decode-step hot weights.

Beam/greedy decode on this hardware is HBM-bandwidth bound: every decode
step re-reads the full step-loop weight set (LSTM gates, attention
projections, prediction head — ~56 MB bf16 for AoADetection at production
dims) while the MXU sits mostly idle (docs/BENCHMARKS.md).  Storing those
weights as int8 with a per-output-channel scale halves the dominant HBM
traffic term.  XLA cannot express this: a ``(q.astype(bf16) * s)``
dequantize inside the decode loop is loop-invariant, so XLA hoists it out
and materializes a full bf16 copy — the loop then reads bf16 weights again
and the int8 encoding saves nothing.  The dequantize therefore has to live
*inside the matmul kernel*, fused between the HBM→VMEM copy and the MXU:

    out = (x @ dequant(q)) * s + b     -- one Pallas kernel, int8 in HBM,
                                          bf16 only ever in VMEM.

This is an opt-in eval/serving optimization (captioner decode quality under
weight-only int8 is an approximation, not bit-parity with f32/bf16 — the
reference has no analogue); training and the default decode path are
untouched.  Quantized layer dicts are ordinary pytrees ``{"q": int8 (Kp,Np),
"s": f32 (N,), "b": f32 (N,)}`` that ``layers.dense`` / ``layers.dense_wn``
/ ``layers.lstm_cell`` dispatch on, so every decode regime (greedy, beam,
sample) works unchanged on quantized params.

Alignment: K is padded to a multiple of 128 and N to a multiple of 512 at
quantization time (int8 native tile (32, 128), pallas_guide.md "Tiling
Constraints"); rows are required to be 8-aligned, otherwise — and on
non-TPU backends — a numerically identical jnp fallback runs instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_ALIGN = 128
N_ALIGN = 512                    # lcm of the candidate N tiles
_N_TILES = (512, 256, 128)
_VMEM_BUDGET = 14 * 1024 * 1024


def _mode() -> str:
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_PALLAS_QUANT")


def _on_tpu() -> bool:
    from simpleimagecaptionzoo_tpu.ops.dispatch import on_tpu
    return on_tpu()


# ---------------------------------------------------------------------------
# quantizers (host/jit-once, not in the decode loop)
# ---------------------------------------------------------------------------

def _quantize(w: jnp.ndarray, bias) -> dict:
    """w (K, N) float -> {"q" int8 (Kp, Np), "s" f32 (N,), "b" f32 (N,)}.

    Per-output-channel symmetric scale s_n = max|w[:, n]| / 127; zero-padded
    K/N columns quantize to 0 exactly and never affect the product."""
    w = w.astype(jnp.float32)
    k, n = w.shape
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    kp = -(-k // K_ALIGN) * K_ALIGN
    np_ = -(-n // N_ALIGN) * N_ALIGN
    q = jnp.pad(q, ((0, kp - k), (0, np_ - n)))
    b = (jnp.zeros((n,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    return {"q": q, "s": s.astype(jnp.float32), "b": b}


def quantize_dense(p: dict) -> dict:
    """layers.dense params {"w", "b"?} -> quantized dict."""
    return _quantize(p["w"], p.get("b"))


def quantize_dense_wn(p: dict) -> dict:
    """layers.dense_wn params {"v", "g", "b"?}: quantize the effective
    weight W = v * g / ||v||_col (loop-invariant, so folding it into the
    int8 encoding loses nothing)."""
    v = p["v"].astype(jnp.float32)
    w = v * (p["g"].astype(jnp.float32)
             / (jnp.linalg.norm(v, axis=0) + 1e-12))
    return _quantize(w, p.get("b"))


def quantize_lstm(p: dict) -> dict:
    """layers.lstm_cell params -> quantized packed form: the cell then runs
    ``gates = quant_matmul([x, h], q) ; nonlinearities`` (the same packed
    [W_ih; W_hh] layout the fused Pallas LSTM kernel uses)."""
    w = jnp.concatenate([p["w_ih"], p["w_hh"]], axis=0)
    return _quantize(w, p["b_ih"] + p["b_hh"])


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and "q" in p and "s" in p


# ---------------------------------------------------------------------------
# fused dequant-matmul kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, q_ref, s_ref, b_ref, out_ref):
    acc = jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    out_ref[:] = (acc * s_ref[:] + b_ref[:]).astype(out_ref.dtype)


def _pick_tile(m: int, kp: int, xbytes: int):
    for nt in _N_TILES:
        vmem = (m * kp * xbytes            # x, resident across the grid
                + 2 * kp * nt              # double-buffered int8 tiles
                + kp * nt * xbytes         # dequantized tile
                + 2 * m * nt * xbytes      # double-buffered out tiles
                + 2 * 2 * nt * 4)          # s, b tiles
        if vmem <= _VMEM_BUDGET:
            return nt
    return None


def supported(x: jnp.ndarray, qp: dict) -> bool:
    if _mode() == "off":
        return False
    m = x.shape[0]
    min_rows = 16 if x.dtype.itemsize == 2 else 8
    if m % min_rows != 0:
        return False
    return _pick_tile(m, qp["q"].shape[0], x.dtype.itemsize) is not None


def _matmul_pallas(x, q, s_pad, b_pad, *, interpret: bool):
    m, kp = x.shape
    np_ = q.shape[1]
    nt = _pick_tile(m, kp, x.dtype.itemsize)
    return pl.pallas_call(
        _kernel,
        grid=(np_ // nt,),
        in_specs=[
            pl.BlockSpec((m, kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, nt), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nt), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, np_), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kp * np_,
            bytes_accessed=(x.size * x.dtype.itemsize + q.size
                            + m * np_ * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, s_pad, b_pad)


def quant_matmul(x: jnp.ndarray, qp: dict) -> jnp.ndarray:
    """x (..., K) @ dequant(qp) + b -> (..., N) in x.dtype.

    Kernel on TPU when aligned; otherwise a numerically identical jnp
    fallback (dequantize to x.dtype, then matmul with f32 accumulation —
    the same op order as the kernel, so both paths agree bit-for-bit)."""
    # scales/bias always f32 even under a blanket bf16 param cast — their
    # precision is free (tiny vectors) and protects the int8 error budget
    q = qp["q"]
    s = qp["s"].astype(jnp.float32)
    b = qp["b"].astype(jnp.float32)
    n = s.shape[0]
    kp, np_ = q.shape
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if k != kp:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))

    mode = _mode()
    if mode != "off" and supported(x2, qp) and (mode == "interpret"
                                                or _on_tpu()):
        s_pad = jnp.pad(s, (0, np_ - n)).reshape(1, np_)
        b_pad = jnp.pad(b, (0, np_ - n)).reshape(1, np_)
        out = _matmul_pallas(x2, q, s_pad, b_pad,
                             interpret=(mode == "interpret"))
        out = out[:, :n]
    else:
        acc = jax.lax.dot_general(
            x2, q.astype(x.dtype)[:, :n], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = ((acc * s[None, :] + b[None, :]).astype(x.dtype))
    return out.reshape(lead + (n,))


# ---------------------------------------------------------------------------
# model-level transform
# ---------------------------------------------------------------------------

def quantize_tree(params: dict, paths) -> dict:
    """Return a copy of ``params`` with each ``paths`` entry (a tuple of
    dict keys addressing one layer dict) replaced by its quantized form.
    Layer kind is inferred from the leaf dict's keys."""
    def convert(leaf: dict) -> dict:
        if "w_ih" in leaf:
            return quantize_lstm(leaf)
        if "v" in leaf:
            return quantize_dense_wn(leaf)
        if "w" in leaf:
            return quantize_dense(leaf)
        raise ValueError(f"not a quantizable layer dict: {list(leaf)}")

    def rec(node, path):
        if not path:
            return convert(node)
        out = dict(node)
        out[path[0]] = rec(node[path[0]], path[1:])
        return out

    out = params
    for p in paths:
        out = rec(out, tuple(p))
    return out
