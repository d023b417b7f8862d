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


def _tiled_allowed() -> bool:
    """Hidden-tiled plans (Ht < H) ship OPT-IN (`SICZ_TPU_PALLAS_LSTM_TILED
    =auto`): the on-chip A/B at the flagship beam shape (B=768, E=2048,
    H=1024, 20-step scan, 2026-08-19) measured the tiled kernel at 288.8
    µs/cell-step f32 (XLA 235.2, 0.81×) and 254.3 µs bf16 (XLA 238.5,
    0.94×) — the per-gate 4-way matmul split plus the per-tile xh
    re-stream under-fills the MXU by more than the fused epilogue buys
    back.  Auto-dispatch therefore keeps the round-3 behavior: whole-row
    kernel where it fits (and wins, +16% bf16 at B=192), XLA fallback at
    shapes that would need tiling (docs/BENCHMARKS.md)."""
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_PALLAS_LSTM_TILED", default="off") != "off"


def _gate_tiled_mode() -> str:
    """The round-4 GATE-TILED kernel (docs/BENCHMARKS.md "N-tiled fused
    cell" sketch): xh resident in VMEM, grid over (hidden-tile, gate,
    K-tile) with ONE full-width dot per grid step and per-gate epilogues
    in processing order i->g->f->o so a single (B, Hs) stash carries the
    running combine.  Unlike the rejected hidden-tiled kernel it never
    re-streams xh and never splits a grid step's matmul four ways.

    Measured ON-CHIP at the flagship beam shape (B=768 bf16, corrected
    harness 2026-08-20) and REJECTED as a default: 138.8 µs/cell-step vs
    XLA's 128.8 — the XLA cell is already at the matmul bound (a Pallas
    matmul-only kernel with identical tiling times 128.6 µs), so there
    is no epilogue overlap left to win.  Stays opt-in for future parts
    where the balance differs (docs/BENCHMARKS.md)."""
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_PALLAS_LSTM_GATE", default="off")


def _plan_gate_tile(in_dim: int, hidden: int, batch: int,
                    itemsize: int = 4,
                    allow_gate: bool | None = None) -> int | None:
    """Widest hidden-subtile Hs for the gate-tiled kernel that fits VMEM.

    Working set: xh RESIDENT (the big term — read once for all 4*n_h*n_k
    grid steps), double-buffered (K_TILE, Hs) weight tiles, one f32
    accumulator + one f32 stash of (B, Hs), the c-in tile and the two
    output tiles, plus headroom for Mosaic's stack-allocated epilogue
    temporaries (sized like the hidden-tiled planner learned to)."""
    min_batch = 16 if itemsize == 2 else 8
    if hidden % 128 != 0 or batch % min_batch != 0:
        return None
    if allow_gate is None:
        allow_gate = _gate_tiled_mode() != "off"
    if not allow_gate:
        return None
    k_total = in_dim + hidden
    k_pad = -(-k_total // K_TILE) * K_TILE
    for div in (1, 2, 4, 8):
        if hidden % div:
            continue
        hs = hidden // div
        if hs % 128:
            continue
        vmem = (batch * k_pad * itemsize            # xh, resident
                + 2 * K_TILE * hs * itemsize        # w tiles, 2-buf
                + 2 * 2 * hs * itemsize             # bias tiles, 2-buf
                + 2 * batch * hs * itemsize         # c-in tile, 2-buf
                + 2 * 2 * batch * hs * itemsize     # h/c out tiles, 2-buf
                + 2 * batch * hs * 4                # f32 acc + stash
                + 2 * batch * hs * 4)               # epilogue temporaries
        if vmem <= _VMEM_BUDGET:
            return hs
    return None


def _plan_h_tile(in_dim: int, hidden: int, batch: int,
                 itemsize: int = 4,
                 allow_tiled: bool | None = None) -> int | None:
    """Pick the widest hidden-tile whose working set fits VMEM.

    The output (4H gate block) is tiled along the HIDDEN axis: the four
    gate column-slices for a tile are fetched with four per-gate
    BlockSpec index maps over the SAME (K, 4H) weight array, so the i/f/
    g/o columns a tile's epilogue needs arrive together without any
    [K, 4, H] relayout.  Ht = hidden (one tile) reproduces the round-3
    whole-row kernel; smaller tiles make B=768+ (the flagship beam
    shape) *compile* — but measurement rejected them as a default (see
    :func:`_tiled_allowed`), so divs > 1 are considered only when the
    opt-in is set."""
    min_batch = 16 if itemsize == 2 else 8
    if hidden % 128 != 0 or batch % min_batch != 0:
        return None
    # div=1 (whole-row): the round-3 single-dot kernel's formula, proven
    # in practice at its win shapes (B=192 f32/bf16) — double-buffered
    # xh + w tiles, one (B, 4H) f32 accumulator, c in, h/c out
    vmem_wholerow = (
        2 * (batch * K_TILE + K_TILE * 4 * hidden) * itemsize
        + batch * 4 * hidden * 4 + 3 * batch * hidden * itemsize)
    if vmem_wholerow <= _VMEM_BUDGET:
        return hidden
    if allow_tiled is None:
        allow_tiled = _tiled_allowed()
    if not allow_tiled:
        return None
    for div in (2, 4, 8):
        if hidden % div:
            continue
        ht = hidden // div
        if ht % 128:
            continue
        vmem = (
            2 * batch * K_TILE * itemsize          # xh, double-buffered
            + 8 * K_TILE * ht * itemsize           # 4 gate w tiles, 2-buf
            + 4 * batch * ht * 4                   # f32 accumulators
            + 2 * batch * ht * itemsize            # c-in tile
            + 4 * batch * ht * itemsize            # h/c out tiles
            + 8 * 2 * ht * itemsize                # bias tiles
            # Mosaic stack-allocates the epilogue's f32 temporaries
            # (i/f/g/o after the transcendentals) alongside the live
            # accumulators; omitting this term under-planned bf16 B=768
            # by exactly 4*B*Ht*4 (measured: 20.06M actual vs 13.9M
            # planned at Ht=512, scoped limit 16M)
            + 4 * batch * ht * 4)
        if vmem <= _VMEM_BUDGET:
            return ht
    return None


def _supported(in_dim: int, hidden: int, batch: int,
               itemsize: int = 4) -> bool:
    return (_plan_h_tile(in_dim, hidden, batch, itemsize) is not None
            or _plan_gate_tile(in_dim, hidden, batch, itemsize) is not None)


def _kernel_wholerow(xh_ref, w_ref, b_ref, c_ref, h_out, c_out, acc):
    """Round-3 whole-row kernel: ONE (B, K_TILE) @ (K_TILE, 4H) dot per
    K-step (the measured-win form at its default-on shapes: +16% bf16 at
    B=192 in-scan); epilogue slices the packed gate accumulator."""
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


# gate PROCESSING order for the gate-tiled kernel: i, g, f, o — chosen so
# one (B, Hs) stash suffices: stash = sig(i) -> sig(i)*tanh(g) -> tanh(c')
# (c' needs i and g before f; h' needs tanh(c') before o).  Weight columns
# are stored i, f, g, o (torch LSTMCell order), so processing step n reads
# weight-column block _GATE_COL[n].
_GATE_COL = (0, 2, 1, 3)


def _gate_col(n):
    """Processing step n -> stored gate column, as traced arithmetic
    (BlockSpec index maps may not capture constant arrays).  Must equal
    ``_GATE_COL`` — locked by tests/test_pallas_lstm.py."""
    return jnp.where(n == 1, 2, jnp.where(n == 2, 1, n))


def _kernel_gate_tiled(xh_ref, w_ref, b_ref, c_ref, h_out, c_out,
                       acc, stash):
    """One full-width (B, K_TILE) @ (K_TILE, Hs) dot per grid step; grid is
    (hidden-tile h, gate n, K-tile k) with k innermost.  xh is a resident
    block (constant index map — fetched once), so unlike the rejected
    hidden-tiled kernel nothing is re-streamed and the MXU always sees a
    single unbroken dot.  The per-gate epilogue at each gate's final
    K-step is ~1/4 of the whole-row kernel's epilogue, giving Mosaic VPU
    work it can overlap with the next gate's weight DMA + MXU pipeline."""
    n = pl.program_id(1)
    k = pl.program_id(2)
    k_tile = xh_ref.shape[-1] // pl.num_programs(2)
    hs = h_out.shape[-1]

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    xh_k = xh_ref[:, pl.dslice(k * k_tile, k_tile)]
    acc[:] += jnp.dot(xh_k, w_ref[:], preferred_element_type=jnp.float32)

    last_k = k == pl.num_programs(2) - 1

    @pl.when(last_k & (n == 0))
    def _gate_i():
        stash[:] = jax.nn.sigmoid(acc[:] + b_ref[:].astype(jnp.float32))

    @pl.when(last_k & (n == 1))
    def _gate_g():
        stash[:] *= jnp.tanh(acc[:] + b_ref[:].astype(jnp.float32))

    @pl.when(last_k & (n == 2))
    def _gate_f():
        f = jax.nn.sigmoid(acc[:] + b_ref[:].astype(jnp.float32))
        c_new = f * c_ref[:].astype(jnp.float32) + stash[:]
        c_out[:] = c_new.astype(c_out.dtype)
        stash[:] = jnp.tanh(c_new)

    @pl.when(last_k & (n == 3))
    def _gate_o():
        o = jax.nn.sigmoid(acc[:] + b_ref[:].astype(jnp.float32))
        h_out[:] = (o * stash[:]).astype(h_out.dtype)
    del hs


def _kernel_tiled(xh_ref, wi_ref, wf_ref, wg_ref, wo_ref,
                  bi_ref, bf_ref, bg_ref, bo_ref, c_ref, h_out, c_out,
                  acc_i, acc_f, acc_g, acc_o):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_i[:] = jnp.zeros_like(acc_i)
        acc_f[:] = jnp.zeros_like(acc_f)
        acc_g[:] = jnp.zeros_like(acc_g)
        acc_o[:] = jnp.zeros_like(acc_o)

    xh = xh_ref[:]
    acc_i[:] += jnp.dot(xh, wi_ref[:], preferred_element_type=jnp.float32)
    acc_f[:] += jnp.dot(xh, wf_ref[:], preferred_element_type=jnp.float32)
    acc_g[:] += jnp.dot(xh, wg_ref[:], preferred_element_type=jnp.float32)
    acc_o[:] += jnp.dot(xh, wo_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _epilogue():
        i = jax.nn.sigmoid(acc_i[:] + bi_ref[:].astype(jnp.float32))
        f = jax.nn.sigmoid(acc_f[:] + bf_ref[:].astype(jnp.float32))
        g = jnp.tanh(acc_g[:] + bg_ref[:].astype(jnp.float32))
        o = jax.nn.sigmoid(acc_o[:] + bo_ref[:].astype(jnp.float32))
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

    itemsize = max(x.dtype.itemsize, h.dtype.itemsize, w.dtype.itemsize)
    # dispatch precedence: whole-row where it fits (the proven default
    # winner), then the gate-tiled plan (opt-in), then the hidden-tiled
    # plan (opt-in), else the jnp cell
    ht = _plan_h_tile(x.shape[-1], hidden, b, itemsize, allow_tiled=False)
    if ht is None:
        hs = _plan_gate_tile(x.shape[-1], hidden, b, itemsize)
        if hs is not None:
            return _forward_gate_tiled(xh, w, bias, c, h.dtype, hidden, hs,
                                       n_k, interpret=interpret)
        ht = _plan_h_tile(x.shape[-1], hidden, b, itemsize)
    if ht is None:               # callers check supported(); be safe
        gates = _gates_jnp(params, x, h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = (jax.nn.sigmoid(f) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new
    if ht == hidden:
        out4h = 4 * hidden
        h_new, c_new = pl.pallas_call(
            _kernel_wholerow,
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
                bytes_accessed=(xh.size + w.size
                                + 2 * b * hidden) * itemsize,
                transcendentals=4 * b * hidden,
            ),
            interpret=interpret,
        )(xh, w, bias, c)
        return h_new, c_new
    n_h = hidden // ht

    # four per-gate views of the SAME (K, 4H) weight/bias arrays: gate j,
    # hidden-tile n starts at column j*hidden + n*ht = (j*n_h + n) blocks
    def w_spec(j):
        return pl.BlockSpec((K_TILE, ht), lambda n, k, j=j: (k, j * n_h + n),
                            memory_space=pltpu.VMEM)

    def b_spec(j):
        return pl.BlockSpec((1, ht), lambda n, k, j=j: (0, j * n_h + n),
                            memory_space=pltpu.VMEM)

    h_new, c_new = pl.pallas_call(
        _kernel_tiled,
        grid=(n_h, n_k),         # k innermost: accumulate, then epilogue
        in_specs=[
            pl.BlockSpec((b, K_TILE), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            w_spec(0), w_spec(1), w_spec(2), w_spec(3),
            b_spec(0), b_spec(1), b_spec(2), b_spec(3),
            pl.BlockSpec((b, ht), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, ht), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, ht), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hidden), h.dtype),
            jax.ShapeDtypeStruct((b, hidden), c.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, ht), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (k_total + pad) * 4 * hidden,
            bytes_accessed=(xh.size * n_h + w.size
                            + 2 * b * hidden) * itemsize,
            transcendentals=4 * b * hidden,
        ),
        interpret=interpret,
    )(xh, w, w, w, w, bias, bias, bias, bias, c)
    return h_new, c_new


def _forward_gate_tiled(xh, w, bias, c, h_dtype, hidden: int, hs: int,
                        n_k: int, *, interpret: bool):
    """pallas_call for :func:`_kernel_gate_tiled`.  ``xh``/``w`` arrive
    K-padded from :func:`_forward`; ``hs`` divides ``hidden``."""
    b = xh.shape[0]
    k_pad = xh.shape[-1]
    n_h = hidden // hs

    def w_idx(h_i, n, k):
        return (k, _gate_col(n) * n_h + h_i)

    h_new, c_new = pl.pallas_call(
        _kernel_gate_tiled,
        grid=(n_h, 4, n_k),      # k innermost; gates in processing order
        in_specs=[
            # resident: constant index map -> fetched once for the whole
            # grid (the formulation's point: nothing is ever re-streamed)
            pl.BlockSpec((b, k_pad), lambda h_i, n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, hs), w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs), lambda h_i, n, k: (0, _gate_col(n) * n_h
                                                     + h_i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs), lambda h_i, n, k: (0, h_i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, hs), lambda h_i, n, k: (0, h_i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs), lambda h_i, n, k: (0, h_i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hidden), h_dtype),
            jax.ShapeDtypeStruct((b, hidden), c.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, hs), jnp.float32),
                        pltpu.VMEM((b, hs), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k_pad * 4 * hidden,
            bytes_accessed=(xh.size + w.size + 2 * b * hidden)
            * max(xh.dtype.itemsize, w.dtype.itemsize),
            transcendentals=5 * b * hidden,
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
