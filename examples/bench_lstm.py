"""In-scan Pallas-LSTM A/B at production decode shapes (VERDICT r2 #9).

The fused cell's earlier 3.7x claim was measured f32 in isolation; the
flagship paths run bf16 inside scan/while loops.  This measures the cell
where it actually lives — a 20-step ``lax.scan`` at the AoA decoder's
shapes — for (pallas on|off) x (f32|bf16), interleaved trials.

Methodology (corrected 2026-08-20): inputs are generated OUTSIDE the timed
region and held loop-invariant; the carry chains through h0 so XLA cannot
hoist the scan.  The previous harness drew (steps, batch, in_dim) normals
per timed iteration, inflating the in-scan cell by ~100 us/step at B=768
— the source of round 4's bogus "228 vs 118 us epilogue headroom" claim
(clean numbers: XLA cell 128.8 us = 76% MFU, at the matmul bound; see
docs/BENCHMARKS.md).

    python examples/bench_lstm.py [--batch 768] [--trials 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(batch, in_dim, hidden, dtype, mode, steps, inner, gate="off"):
    os.environ["SICZ_TPU_PALLAS_LSTM"] = mode
    os.environ["SICZ_TPU_PALLAS_LSTM_GATE"] = gate
    from simpleimagecaptionzoo_tpu.models import layers as L
    params = L.lstm_cell_init(jax.random.PRNGKey(0), in_dim, hidden)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    # inputs generated OUTSIDE the timed region (loop-invariant in-scan);
    # the h0 chain below keeps the scan non-hoistable
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, batch, in_dim),
                           dtype)

    @jax.jit
    def many(p, seed):
        def one(carry, i):
            h0 = c0 = jnp.zeros((batch, hidden), dtype)
            h0 = h0 + carry.astype(dtype) * jnp.asarray(1e-20, dtype)

            def step(hc, x):
                h, c = L.lstm_cell(p, x, *hc)
                return (h, c), ()
            (h, c), _ = jax.lax.scan(step, (h0, c0), xs)
            return carry + jnp.sum(h.astype(jnp.float32)), ()
        return jax.lax.scan(one, jnp.float32(seed), jnp.arange(inner))[0]

    np.asarray(many(params, jnp.int32(77_000)))       # trace under env

    # report which plan actually dispatches at this shape (ADVICE r4 #3:
    # at shapes where the whole-row plan fits, the 'gate' variant silently
    # measures the whole-row kernel — make that visible)
    from simpleimagecaptionzoo_tpu.ops import pallas_lstm as PL
    itemsize = jnp.dtype(dtype).itemsize
    if mode == "off":
        plan = "xla"
    elif PL._plan_h_tile(in_dim, hidden, batch, itemsize,
                         allow_tiled=False) is not None:
        plan = "whole-row"
    elif gate != "off" and PL._plan_gate_tile(in_dim, hidden, batch,
                                              itemsize) is not None:
        hs = PL._plan_gate_tile(in_dim, hidden, batch, itemsize)
        plan = f"gate-tiled(Hs={hs})"
    elif PL._plan_h_tile(in_dim, hidden, batch, itemsize) is not None:
        plan = "hidden-tiled"
    else:
        plan = "xla (no plan fits)"
    return lambda seed: many(params, jnp.int32(seed)), plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768,
                    help="256 x beam 3 lanes (the AoA decode cell shape)")
    ap.add_argument("--in_dim", type=int, default=2048)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--dtypes", default="f32,bf16",
                    help="comma list from: f32 bf16")
    args = ap.parse_args()
    print("devices:", jax.devices())

    want = {d.strip() for d in args.dtypes.split(",") if d.strip()}
    variants = []
    for dtype, tag_d in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        if tag_d not in want:
            continue
        for mode, gate, tag_m in (("off", "off", "xla"),
                                  ("auto", "off", "pallas"),
                                  ("auto", "auto", "gate")):
            tag = f"{tag_d}-{tag_m}"
            fn, plan = build(args.batch, args.in_dim, args.hidden, dtype,
                             mode, args.steps, args.inner, gate=gate)
            variants.append((tag, fn))
            print(f"built {tag} (dispatches: {plan})", flush=True)

    times = {t: [] for t, _ in variants}
    seed = 1
    for trial in range(args.trials):
        for tag, fn in variants:
            t0 = time.perf_counter()
            np.asarray(fn(seed))
            times[tag].append((time.perf_counter() - t0)
                              / (args.inner * args.steps))
            seed += 1
        print(f"trial {trial + 1}/{args.trials}", flush=True)

    print(f"\n{'variant':<14} {'us/cell-step':>12} {'std':>8}")
    for tag, _ in variants:
        t = np.asarray(times[tag])
        print(f"{tag:<14} {t.mean() * 1e6:>12.1f} {t.std(ddof=1) * 1e6:>8.1f}")
    for d in ("f32", "bf16"):
        if f"{d}-xla" not in times:
            continue
        a = np.asarray(times[f"{d}-xla"]).mean()
        for m in ("pallas", "gate"):
            if f"{d}-{m}" not in times:
                continue
            b = np.asarray(times[f"{d}-{m}"]).mean()
            print(f"{d}: {m} is {a / b:.2f}x vs xla "
                  f"({'faster' if b < a else 'slower'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
