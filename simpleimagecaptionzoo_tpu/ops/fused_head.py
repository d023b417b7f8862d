"""Fused prediction-head -> log-softmax -> top-k Pallas kernel.

Every decode step ends with the (H, V) prediction head (the largest weight
in every family: 1024 x 10102 for AoA/COCO14) followed by a softmax-family
reduction and a tiny selection: argmax for greedy decode, per-lane top-k +
score merge for beam search.  The classic XLA path materializes the full
(m, V) logits tensor in HBM (e.g. 768 x 10102 bf16 ~ 15 MB per beam step,
written once and re-read by log_softmax AND top_k) — pure bandwidth on a
decode loop that is already HBM-bound (docs/BENCHMARKS.md).

This kernel streams the head's V dimension in VMEM tiles and never writes
logits to HBM at all:

    for each V-tile (sequential TPU grid):
        logits_tile = (x @ dequant(w_tile)) * s + b        -- MXU, f32 acc
        online logsumexp update (running max / rescaled sum)
        tile top-k -> merged into the running (m, k) candidate list

outputs: top-k raw logits (m, k) f32, their vocab indices (m, k) i32, and
logsumexp (m, 1) f32 — enough to reconstruct the exact top-k log-softmax
values (``vals - lse``) without the (m, V) intermediate.  Works for both
the bf16/f32 weight-norm head and the weight-only int8 head (ops/quant.py)
— int8 dequant happens between the HBM->VMEM copy and the MXU, so the loop
reads 1 byte/weight.

Beam-search equivalence: the global top-k over all k lanes' k*V candidates
equals the top-k over the union of each lane's per-lane top-k (any global
winner ranks >= all but k-1 others, hence is in its own lane's top-k), so
the engine merges (k, k) per-lane candidates instead of (k, V) — the same
two-stage reduction, but with stage 1 fused into the matmul.

The jnp fallback (non-TPU backends / unsupported shapes) computes the same
f32 quantities from materialized logits, matching the kernel to matmul-
tiling ulps.  Env toggle: ``SICZ_TPU_FUSED_HEAD=auto|off|interpret``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_ALIGN = 128                   # x feature axis alignment
V_TILE = 512                    # base vocab tile (matches quant.py N_ALIGN)
V_TILE_WIDE = 1024              # preferred tile when vp divides and VMEM fits
_NEG = -1e30                    # python scalar: jnp constants would be
                                # captured consts inside the pallas kernel
_VMEM_BUDGET = 14 * 1024 * 1024


def _mode() -> str:
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    return kernel_mode("SICZ_TPU_FUSED_HEAD")


def _on_tpu() -> bool:
    from simpleimagecaptionzoo_tpu.ops.dispatch import on_tpu
    return on_tpu()


# ---------------------------------------------------------------------------
# head preparation (loop-invariant; XLA hoists it out of decode loops)
# ---------------------------------------------------------------------------

def prepare_head(head: dict, dtype) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray, int]:
    """Head param dict -> (w (Kp, Vp), s (1, Vp) f32, b (1, Vp) f32, V).

    Accepts the weight-norm head ``{"v", "g", "b"}`` (effective weight
    materialized in ``dtype``; scale 1), a plain dense ``{"w", "b"}``, or
    the int8 quantized form ``{"q", "s", "b"}`` (kept int8; per-channel
    scale).  Padding columns carry scale 0 and bias ``_NEG`` so the pad
    mask is baked into the epilogue FMA (``0 * acc + _NEG``) — one fewer
    full-width VPU pass per tile than an explicit column-index ``where``
    (measured 2026-08-20: part of the 615 -> 317 us head-kernel win)."""
    if "q" in head:                          # ops/quant.py layout, pre-padded
        q = head["q"]
        s = head["s"].astype(jnp.float32)
        b = head["b"].astype(jnp.float32)
        v = s.shape[0]
        kp, vp = q.shape
        s = jnp.pad(s, (0, vp - v)).reshape(1, vp)
        b = jnp.pad(b, (0, vp - v), constant_values=_NEG).reshape(1, vp)
        return q, s, b, v
    if "v" in head:                          # weight-norm dense
        vv = head["v"].astype(jnp.float32)
        w = vv * (head["g"].astype(jnp.float32)
                  / (jnp.linalg.norm(vv, axis=0) + 1e-12))
    else:
        w = head["w"].astype(jnp.float32)
    k, v = w.shape
    kp = -(-k // K_ALIGN) * K_ALIGN
    vp = -(-v // V_TILE) * V_TILE
    w = jnp.pad(w, ((0, kp - k), (0, vp - v))).astype(dtype)
    s = jnp.pad(jnp.ones((v,), jnp.float32), (0, vp - v)).reshape(1, vp)
    bias = (head["b"].astype(jnp.float32) if "b" in head
            else jnp.zeros((v,), jnp.float32))
    b = jnp.pad(bias, (0, vp - v), constant_values=_NEG).reshape(1, vp)
    return w, s, b, v


# ---------------------------------------------------------------------------
# in-kernel small-k selection helpers
# ---------------------------------------------------------------------------

def _top_k_iter(vals, col, k: int, payload=None):
    """k rounds of (max, mask) — no gather ops (Mosaic's TPU lowering has
    no general gather; selection uses where+min reductions instead).

    vals (m, n) f32, col (m, n) i32 -> (m, k) descending values + columns;
    ties resolve to the smallest column (lax.top_k order).  ``payload``
    (m, n) i32, if given, is reduced at the winning position instead of
    ``col`` — used when merging candidate lists whose positions differ
    from the vocab ids they carry."""
    big = jnp.int32(2**31 - 1)
    carry = col if payload is None else payload
    out_v, out_i = [], []
    for _ in range(k):
        best = jnp.max(vals, axis=1, keepdims=True)
        at = jnp.where(vals == best, col, big)
        pos = jnp.min(at, axis=1, keepdims=True)         # winning column
        won = col == pos
        out_v.append(best)
        out_i.append(jnp.min(jnp.where(won, carry, big), axis=1,
                             keepdims=True))
        vals = jnp.where(won, _NEG, vals)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _top_k_cheap(vals, col, k: int):
    """Tile-stage top-k where the payload IS the column: the ``at``-min
    already yields the smallest winning column, so ``_top_k_iter``'s
    ``won``/payload-min passes are redundant — 2 fewer full-width VPU
    passes per round (measured 2026-08-20: the largest single piece of
    the 615 -> 317 us head-kernel win at the flagship beam shape)."""
    big = jnp.int32(2**31 - 1)
    out_v, out_i = [], []
    for _ in range(k):
        best = jnp.max(vals, axis=1, keepdims=True)
        at = jnp.where(vals == best, col, big)
        pos = jnp.min(at, axis=1, keepdims=True)             # winning column
        out_v.append(best)
        out_i.append(pos)
        vals = jnp.where(col == pos, _NEG, vals)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, w_ref, s_ref, b_ref, vals_ref, idx_ref, lse_ref,
            max_ref, sum_ref, *, k: int, nt: int, ngrid: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _NEG)
        idx_ref[:] = jnp.zeros_like(idx_ref)
        max_ref[:] = jnp.full_like(max_ref, _NEG)
        sum_ref[:] = jnp.zeros_like(sum_ref)

    acc = jnp.dot(x_ref[:], w_ref[:].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    # pad columns: scale 0, bias _NEG -> logit _NEG (mask baked into the FMA)
    logits = acc * s_ref[:] + b_ref[:]                       # (m, nt) f32
    col = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
           + j * nt)

    # online logsumexp
    tmax = jnp.max(logits, axis=1, keepdims=True)            # (m, 1)
    nmax = jnp.maximum(max_ref[:], tmax)
    sum_ref[:] = (sum_ref[:] * jnp.exp(max_ref[:] - nmax)
                  + jnp.sum(jnp.exp(logits - nmax), axis=1, keepdims=True))
    max_ref[:] = nmax

    # tile top-k merged with the running candidates
    tv, ti = _top_k_cheap(logits, col, k)
    mv = jnp.concatenate([vals_ref[:], tv], axis=1)          # (m, 2k)
    mi = jnp.concatenate([idx_ref[:], ti], axis=1)
    # running entries come first, so equal values keep the earlier
    # (smaller-column) candidate — lax.top_k tie order.  The vocab id
    # rides as the payload (no gather in Mosaic).
    pos = jax.lax.broadcasted_iota(jnp.int32, mv.shape, 1)
    sel_v, sel_i = _top_k_iter(mv, pos, k, payload=mi)
    vals_ref[:] = sel_v
    idx_ref[:] = sel_i

    @pl.when(j == ngrid - 1)
    def _finish():
        lse_ref[:] = max_ref[:] + jnp.log(sum_ref[:])


def _run_kernel(x, w, s, b, k: int, *, interpret: bool):
    m, kp = x.shape
    vp = w.shape[1]
    nt = _pick_tile(m, kp, vp, x.dtype.itemsize, w.dtype.itemsize)
    ngrid = vp // nt
    kern = functools.partial(_kernel, k=k, nt=nt, ngrid=ngrid)
    vals, idx, lse = pl.pallas_call(
        kern,
        grid=(ngrid,),
        in_specs=[
            pl.BlockSpec((m, kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, nt), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((m, k), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 1), jnp.float32),       # running max
            pltpu.VMEM((m, 1), jnp.float32),       # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kp * vp,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + m * k * 8),
            transcendentals=m * vp,
        ),
        interpret=interpret,
    )(x, w, s, b)
    return vals, idx, lse[:, 0]


def _vmem_need(m: int, kp: int, nt: int, xbytes: int, wbytes: int) -> int:
    # The f32 logits tile carries a 1.5x factor: Mosaic reuses the buffer
    # for the exp/epilogue (a full second temp never materializes — the
    # flagship m=1152, nt=1024 bf16 shape compiles and runs on-chip, which
    # a 2x accounting would put over the 16MB scoped cap), but 1x alone
    # leaves no margin for reduction temps.  Dequantized tile only exists
    # when the weights arrive narrower than x (int8 head).
    dequant = kp * nt * xbytes if wbytes < xbytes else 0
    return (m * kp * xbytes                 # x resident
            + 2 * kp * nt * wbytes          # double-buffered weight tiles
            + dequant
            + m * nt * 6                    # f32 logits tile (x1.5, above)
            + 4 * 2 * nt * 4                # s, b tiles
            + m * 64)                       # carried candidates / reductions


def _pick_tile(m: int, kp: int, vp: int, xbytes: int, wbytes: int) -> int:
    """Widest vocab tile that divides vp and fits the VMEM budget.  Wider
    tiles amortize the per-tile top-k/lse epilogue over a bigger matmul
    (2026-08-20 on-chip A/B at m=1152: 512 -> 1024 is 430 -> 317 us)."""
    if (vp % V_TILE_WIDE == 0
            and _vmem_need(m, kp, V_TILE_WIDE, xbytes, wbytes)
            <= _VMEM_BUDGET):
        return V_TILE_WIDE
    return V_TILE


def _vmem_ok(m: int, kp: int, xbytes: int, wbytes: int) -> bool:
    return _vmem_need(m, kp, V_TILE, xbytes, wbytes) <= _VMEM_BUDGET


def supported(m: int, k: int, xbytes: int, head: dict) -> bool:
    """Static shape gate for the kernel path."""
    if _mode() == "off" or k > 16:
        return False
    min_rows = 16 if xbytes == 2 else 8
    if m % min_rows != 0:
        return False
    if "q" in head:
        kp, wbytes = head["q"].shape[0], 1
    else:
        w = head["v"] if "v" in head else head["w"]
        kp = -(-w.shape[0] // K_ALIGN) * K_ALIGN
        wbytes = xbytes
    return _vmem_ok(m, kp, xbytes, wbytes)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def enabled(head, m: int, k: int, dtype) -> bool:
    """Static trace-time decision: will ``topk_head`` take the kernel path
    for these shapes on this backend?  The decode engine uses this to pick
    between the fused and the classic (materialized-logits) formulation."""
    if not isinstance(head, dict) or not ({"q", "v", "w"} & set(head)):
        return False
    mode = _mode()
    itemsize = jnp.dtype(dtype).itemsize
    return (mode != "off" and supported(m, k, itemsize, head)
            and (mode == "interpret" or _on_tpu()))


def topk_head(head: dict, x: jnp.ndarray, k: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x (m, H) -> (top-k raw logits (m, k) f32 descending, vocab ids
    (m, k) i32, logsumexp (m,) f32).  ``vals - lse[:, None]`` are the exact
    top-k log-softmax values; ``idx[:, 0]`` is the argmax."""
    m = x.shape[0]
    use_kernel = enabled(head, m, k, x.dtype)
    w, s, b, _ = prepare_head(head, x.dtype)
    kp = w.shape[0]
    if x.shape[1] != kp:
        x = jnp.pad(x, ((0, 0), (0, kp - x.shape[1])))
    if use_kernel:
        return _run_kernel(x, w, s, b, k,
                           interpret=(_mode() == "interpret"))
    # fallback: identical f32 math on materialized logits (pad columns are
    # already _NEG via the masked bias from prepare_head)
    acc = jax.lax.dot_general(x, w.astype(x.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    logits = acc * s + b
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    return vals, idx.astype(jnp.int32), lse
