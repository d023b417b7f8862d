"""Isolate the cost split inside cider_d_device at SCST production shapes."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.ops import cider as C

B, R, L, LR = 128, 5, 20, 22
rng = np.random.default_rng(0)
n_ngrams = 1_300_000
h = rng.integers(0, 2**32, size=(2, n_ngrams), dtype=np.uint64)
table = C.CiderDTable(h[0].astype(np.uint32), h[1].astype(np.uint32),
                      rng.integers(1, 500, n_ngrams).astype(np.float32),
                      float(np.log(113_287)))
tdev, probe = table.device_arrays(), table.probe
print("probe =", probe, "table entries =", len(table.h1))

sample = jnp.asarray(rng.integers(4, 9000, size=(B, L)).astype(np.int32))
greedy = jnp.asarray(rng.integers(4, 9000, size=(B, L)).astype(np.int32))
refs = jnp.asarray(rng.integers(4, 9000, size=(B, R, LR)).astype(np.int32))
ref_lens = jnp.asarray(rng.integers(6, 20, size=(B, R)).astype(np.int32))


def bench(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt


full = jax.jit(lambda s, g: C.self_critical_reward(tdev, probe, s, g,
                                                   refs, ref_lens))
bench("full reward", full, sample, greedy)

# idf_lookup alone at the three query shapes
h1h, h2h = C.ngram_hashes(sample)
h1r, h2r = C.ngram_hashes(refs.reshape(B * R, LR))
lk = jax.jit(lambda a, b: C.idf_lookup(tdev, a, b, probe))
bench("idf_lookup hyp  (128x4x20)", lk, h1h, h2h)
bench("idf_lookup refs (640x4x22)", lk, h1r, h2r)

# searchsorted alone
ss = jax.jit(lambda a: jnp.searchsorted(tdev["h1"], a, side="left"))
bench("searchsorted hyp ", ss, h1h)
bench("searchsorted refs", ss, h1r)

# cider_d with idf stubbed to 1.0 (no table at all)
def cider_noidf(s, g):
    t1 = {"h1": tdev["h1"][:2], "h2": tdev["h2"][:2],
          "df": tdev["df"][:2], "log_ref_len": tdev["log_ref_len"]}
    return (C.cider_d_device(t1, 1, s, C.seq_length_sampled(s), refs, ref_lens)
            - C.cider_d_device(t1, 1, g, C.seq_length_greedy(g), refs,
                               ref_lens))
bench("reward with 2-entry table", jax.jit(cider_noidf), sample, greedy)
