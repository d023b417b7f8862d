"""Streaming HBM bandwidth probe (read+write), for roofline denominators.

The earlier calibration in docs/BENCHMARKS.md measured 119 GB/s with 20
chained REDUCTIONS over a 256 MB array — a read-only, reduction-latency-
flavored number.  Training-step traffic is stream-shaped (large reads AND
writes: weight fetches, activation saves, gradient accumulator
read-modify-write), so the honest roofline denominator is a streaming
triad.  This runs ``c = c * s + b`` chained N times inside ONE jit (the
dispatch floor is ~25-35 ms through the tunnel; one call amortizes it):
per iteration traffic = read c + read b + write c = 3 x array bytes.

    python examples/bench_hbm.py [--mb 256] [--iters 40]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    n = args.mb * (1 << 20) // np.dtype(
        np.float32 if dt == jnp.float32 else np.float16).itemsize
    a = jnp.arange(n, dtype=jnp.float32).astype(dt) * 1e-9
    b = jnp.ones((n,), dt)

    @jax.jit
    def f(c, b):
        def body(c, _):
            return c * dt.dtype.type(1.000001) + b, None
        c, _ = jax.lax.scan(body, c, None, length=args.iters)
        return c

    # compile + warm: slice ON DEVICE before the readback — np.asarray of
    # the full output would drag 256 MB through the ~0.03 GB/s D2H tunnel
    np.asarray(f(a, b)[:1])
    # force real execution (runtime may reuse same-input results): distinct
    # input second run, timed
    a2 = a + dt.dtype.type(1e-6)
    t0 = time.perf_counter()
    out = f(a2, b)
    out.block_until_ready()
    dt_s = time.perf_counter() - t0
    gb = 3 * a.nbytes * args.iters / 1e9
    print(f"streaming triad {args.dtype}: {gb:.1f} GB in {dt_s*1e3:.1f} ms "
          f"-> {gb/dt_s:.0f} GB/s")


if __name__ == "__main__":
    main()
