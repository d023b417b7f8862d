"""Probe: XLA autodiff of the hoisted NIC LSTM scan vs a manual-BPTT
custom_vjp whose backward carries only (dh, dc) and hoists dW_hh / db_hh
into single stacked matmuls.

Hypothesis: XLA's scan transpose carries the (H, 4H) dW_hh accumulator
(16 MB f32) through HBM every timestep and re-reads W_hh per step in both
directions; manual BPTT removes the accumulator traffic entirely and reads
W_hh once per direction (the weight itself still streams per step in the
sequential recurrences, but the accumulator read+write disappears).

Run on the TPU chip:  python examples/_probe_scan_vjp.py [--dtype bfloat16]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp


def gate_math(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def scan_auto(w_hh, b_hh, gates_x, h0, c0):
    """Plain lax.scan; XLA autodiff transposes it."""
    def body(carry, gx):
        h, c = carry
        h, c = gate_math(gx + h @ w_hh + b_hh, c)
        return (h, c), h
    (_, _), hs = jax.lax.scan(body, (h0, c0), gates_x)
    return hs


@jax.custom_vjp
def scan_manual(w_hh, b_hh, gates_x, h0, c0):
    return scan_auto(w_hh, b_hh, gates_x, h0, c0)


def _fwd(w_hh, b_hh, gates_x, h0, c0):
    def body(carry, gx):
        h, c = carry
        h2, c2 = gate_math(gx + h @ w_hh + b_hh, c)
        return (h2, c2), (h2, c2)
    (_, _), (hs, cs) = jax.lax.scan(body, (h0, c0), gates_x)
    return hs, (w_hh, b_hh, gates_x, h0, c0, hs, cs)


def _bwd(res, dhs):
    w_hh, b_hh, gates_x, h0, c0, hs, cs = res
    t, b, hdim = hs.shape
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)       # (T, B, H)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    # recompute gates for all steps in ONE matmul (reads w_hh once)
    gates_all = gates_x + h_prev @ w_hh + b_hh                   # (T, B, 4H)

    w_hh_T = w_hh.T

    def body(carry, xs):
        dh_rec, dc = carry
        gates, cprev, cnew, dh_out = xs
        zi, zf, zg, zo = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(zi), jax.nn.sigmoid(zf), jax.nn.sigmoid(zo)
        g = jnp.tanh(zg)
        tc = jnp.tanh(cnew)
        dh = (dh_out + dh_rec).astype(jnp.float32)
        dct = dc + dh * o.astype(jnp.float32) * (1.0 - tc.astype(jnp.float32) ** 2)
        d_zo = dh * tc.astype(jnp.float32) * (o * (1 - o)).astype(jnp.float32)
        d_zi = dct * (g * i * (1 - i)).astype(jnp.float32)
        d_zf = dct * (cprev.astype(jnp.float32)) * (f * (1 - f)).astype(jnp.float32)
        d_zg = dct * (i.astype(jnp.float32)) * (1.0 - g.astype(jnp.float32) ** 2)
        d_gates = jnp.concatenate([d_zi, d_zf, d_zg, d_zo], axis=-1)
        d_gates = d_gates.astype(gates.dtype)
        dh_rec_new = d_gates @ w_hh_T
        dc_new = dct * f.astype(jnp.float32)
        return (dh_rec_new, dc_new), d_gates

    dh0 = jnp.zeros_like(h0)
    dc0 = jnp.zeros((h0.shape[0], hdim), jnp.float32)
    (dh_last, dc_last), d_gates_all = jax.lax.scan(
        body, (dh0, dc0), (gates_all, c_prev, cs, dhs), reverse=True)
    # hoisted weight gradients: one matmul over the stacked steps
    dW = jnp.einsum("tbh,tbk->hk", h_prev.astype(d_gates_all.dtype),
                    d_gates_all).astype(w_hh.dtype)
    db = jnp.sum(d_gates_all, axis=(0, 1)).astype(b_hh.dtype)
    return dW, db, d_gates_all.astype(gates_x.dtype), \
        dh_last.astype(h0.dtype), dc_last.astype(c0.dtype)


scan_manual.defvjp(_fwd, _bwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=21)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    B, H, T = args.batch, args.hidden, args.steps
    w_hh = (jax.random.normal(ks[0], (H, 4 * H)) * 0.02).astype(dt)
    b_hh = jnp.zeros((4 * H,), dt)
    gates_x = (jax.random.normal(ks[1], (T, B, 4 * H)) * 0.1).astype(dt)
    h0 = jnp.zeros((B, H), dt)
    c0 = jnp.zeros((B, H), dt)

    def make_loss(fn):
        def loss(w, b, gx):
            hs = fn(w, b, gx, h0, c0)
            return jnp.sum(hs.astype(jnp.float32) ** 2)
        return loss

    # numerics check first
    la, lm = make_loss(scan_auto), make_loss(scan_manual)
    ga = jax.grad(la, argnums=(0, 1, 2))(w_hh, b_hh, gates_x)
    gm = jax.grad(lm, argnums=(0, 1, 2))(w_hh, b_hh, gates_x)
    for name, a, m in zip(("dW", "db", "dgx"), ga, gm):
        a32, m32 = a.astype(jnp.float32), m.astype(jnp.float32)
        denom = jnp.maximum(jnp.max(jnp.abs(a32)), 1e-6)
        rel = float(jnp.max(jnp.abs(a32 - m32)) / denom)
        print(f"  grad {name}: max rel diff {rel:.3e}")

    # timing: scan over distinct gates_x batches inside one jit
    n = args.iters
    gx_all = (jax.random.normal(ks[2], (n, T, B, 4 * H)) * 0.1).astype(dt)

    def bench(fn, tag):
        g = jax.grad(make_loss(fn), argnums=(0, 1, 2))

        @jax.jit
        def run(w, b, gxs):
            def step(acc, gx):
                dw, db_, dgx = g(w, b, gx)
                return acc + jnp.sum(dw.astype(jnp.float32)) \
                    + jnp.sum(dgx.astype(jnp.float32)[0, 0, :4]), None
            acc, _ = jax.lax.scan(step, 0.0, gxs)
            return acc

        r = run(w_hh, b_hh, gx_all).block_until_ready()
        t0 = time.perf_counter()
        r = run(w_hh, b_hh, gx_all).block_until_ready()
        el = time.perf_counter() - t0
        print(f"  {tag}: {el / n * 1e3:.3f} ms per fwd+bwd scan "
              f"({el:.3f}s total, acc={float(r):.3e})")
        return el / n

    print(f"B={B} H={H} T={T} dtype={dt}")
    ta = bench(scan_auto, "autodiff scan ")
    tm = bench(scan_manual, "manual BPTT   ")
    print(f"  speedup: {ta / tm:.2f}x")


if __name__ == "__main__":
    main()
