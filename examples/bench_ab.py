"""Calibrated A/B decode benchmark — the multi-run methodology that
docs/BENCHMARKS.md prescribes for accepting/rejecting decode levers whose
individual effect can sit near this environment's noise floor (repeated
on-chip timings vary +/-15-20% through the tunnel).

Methodology
-----------
* every variant is a separately traced program (env toggles are read at
  trace time), warmed before any timing;
* trials are INTERLEAVED round-robin (A B C A B C ...) so slow drift in
  the shared tunnel/host hits all variants equally;
* every call runs ``--inner`` decode batches inside one jit program with
  device-generated per-seed inputs (defeats result caching, amortizes the
  ~30 ms dispatch floor), and only ids are copied back;
* output: mean +/- std per variant, % delta vs the first variant, and
  Welch's t so a "win" under the noise floor is visibly not significant.

    python examples/bench_ab.py [--batch 256] [--beam 3] [--trials 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode as D


def build_variant(model, params, b, n_box, k, nb, *, fused: str,
                  int8: bool, int8_kv: str = "off"):
    """Trace one decode-many program under the given toggles."""
    os.environ["SICZ_TPU_FUSED_HEAD"] = fused
    os.environ["SICZ_TPU_INT8_KV"] = int8_kv
    p = params
    if int8:
        p = model.quantize_decode_params(params)

    @jax.jit
    def many(p, seed):
        feats = jax.random.normal(jax.random.PRNGKey(seed),
                                  (nb, b, n_box, 2048), jnp.bfloat16)
        masks = jnp.ones((nb, b, n_box), jnp.bfloat16)

        def body(_, fm):
            enc, _ = model.encode(p, {"bu_feats": fm[0], "bu_masks": fm[1]},
                                  train=False)
            if k > 1:
                return 0, D.beam_search(model, p, enc, beam_size=k,
                                        max_steps=20)
            return 0, D.greedy(model, p, enc, max_len=20)[0]
        return jax.lax.scan(body, 0, (feats, masks))[1]

    np.asarray(many(p, jnp.int32(10_000)))     # trace NOW under this env
    return lambda seed: many(p, jnp.int32(seed))


def welch_t(a, b):
    a, b = np.asarray(a), np.asarray(b)
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    return (a.mean() - b.mean()) / max(np.sqrt(va + vb), 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=10102)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--variants", default="classic,fused,classic-int8,fused-int8",
                    help="comma list from: classic fused classic-int8 fused-int8")
    args = ap.parse_args()
    print("devices:", jax.devices())

    b, k, nb = args.batch, args.beam, args.inner
    cfg = ModelConfig(model_type="AoADetection", vocab_size=args.vocab,
                      embed_dim=1024, hidden_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=36)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    spec = {"classic": dict(fused="off", int8=False),
            "fused": dict(fused="auto", int8=False),
            "classic-int8": dict(fused="off", int8=True),
            "fused-int8": dict(fused="auto", int8=True),
            "fused-int8-kv": dict(fused="auto", int8=True,
                                  int8_kv="auto")}
    names = [n.strip() for n in args.variants.split(",") if n.strip()]
    variants = []
    for name in names:
        t0 = time.perf_counter()
        fn = build_variant(model, params, b, 36, k, nb, **spec[name])
        print(f"built {name} ({time.perf_counter() - t0:.0f}s compile)")
        variants.append((name, fn))

    times = {name: [] for name, _ in variants}
    seed = 1
    for trial in range(args.trials):
        for name, fn in variants:
            t0 = time.perf_counter()
            np.asarray(fn(seed))
            times[name].append((time.perf_counter() - t0) / nb)
            seed += 1
        print(f"trial {trial + 1}/{args.trials} done", flush=True)

    base_name = variants[0][0]
    base = np.asarray(times[base_name])
    print(f"\n{'variant':<14} {'ms/batch':>10} {'std':>8} {'captions/s':>11}"
          f" {'vs ' + base_name:>12} {'t':>6}")
    for name, _ in variants:
        t = np.asarray(times[name])
        delta = (base.mean() - t.mean()) / base.mean() * 100
        tstat = welch_t(base, t)
        print(f"{name:<14} {t.mean() * 1e3:>10.2f} {t.std(ddof=1) * 1e3:>8.2f}"
              f" {b / t.mean():>11.0f} {delta:>+11.1f}% {tstat:>6.1f}")
    print("\n(positive delta = faster than baseline; |t| > ~2.4 is "
          "significant at these trial counts)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
