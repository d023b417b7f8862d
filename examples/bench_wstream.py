"""Matmul weight-streaming probe: the honest decode-cell roofline.

The decode-cell roofline argument in docs/BENCHMARKS.md ("XLA's cell is
~92% of the bandwidth floor") used the 119 GB/s reduction-probe number
as its denominator.  The streaming triad (`bench_hbm.py`) later measured
349 GB/s — so the question becomes: what bandwidth does a *matmul weight
fetch* actually achieve?  That is the denominator that prices a decode
step, where each timestep must pull the full weight set from HBM.

This times ``y = x @ W_i`` over N DISTINCT stacked weights inside one
jit (distinct so the fetch cannot be cached in VMEM across iterations;
one jit so the ~25-35 ms tunnel dispatch floor amortizes).  Reports
effective weight GB/s and TFLOP/s at decode-relevant shapes:

    python examples/bench_wstream.py [--b 768 1152] [--n 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(b: int, e: int, h4: int, n: int, dtype) -> None:
    k = jax.random.PRNGKey(0)
    ws = jax.random.normal(k, (n, e, h4), dtype) * 0.01
    reps = 3
    # distinct inputs per rep (the tunnel runtime caches repeated
    # same-input jitted calls) and a SCALAR output (a full [b, h4]
    # readback through the ~0.03 GB/s D2H tunnel would dominate).
    xs = [jnp.full((b, e), 1.0 + 1e-3 * i, dtype) for i in range(reps + 1)]

    # enough steps per call that the ~25-35 ms tunnel dispatch floor is
    # noise: passes x n weight fetches inside ONE jit.  Each pass
    # rescales x so XLA cannot hoist or reuse a pass's result.
    passes = max(1, int(2048 / n))

    @jax.jit
    def f(x, ws):
        def one_pass(p, carry):
            xp = carry * (1.0 + 1e-6 * p)
            def body(acc, w):
                return acc + (xp @ w).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.zeros((b, h4), jnp.float32), ws)
            # fold the pass result back into the carry so no pass can be
            # dead-code-eliminated or hoisted
            return carry + 1e-9 * jnp.mean(s).astype(dtype)
        out = jax.lax.fori_loop(0, passes, one_pass, x)
        return jnp.sum(out[0])

    float(f(xs[-1], ws))  # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        float(f(xs[i], ws))
    dt = (time.perf_counter() - t0) / (reps * n * passes)  # per fetch
    wbytes = e * h4 * np.dtype(np.float32 if dtype == jnp.float32
                               else np.float16).itemsize
    flops = 2.0 * b * e * h4
    print(f"B={b:5d} [{e}x{h4}] {'f32' if dtype == jnp.float32 else 'bf16'}: "
          f"{dt * 1e6:7.1f} us/step | weights {wbytes / 1e6:6.1f} MB "
          f"-> {wbytes / dt / 1e9:6.1f} GB/s | {flops / dt / 1e12:6.2f} TFLOP/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[192, 768, 1152])
    ap.add_argument("--e", type=int, default=3072)
    ap.add_argument("--h4", type=int, default=4096)
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()
    for b in args.b:
        probe(b, args.e, args.h4, args.n, jnp.bfloat16)


if __name__ == "__main__":
    main()
