"""Headline benchmark: captions/sec at beam=3 on the flagship captioner.

Metric: batched on-device beam-search decode throughput (captions/sec/chip)
for AoADetection at production dimensions (embed/hidden 1024, 6 refine
layers, vocab 10102, 36 bottom-up boxes), beam=3, bf16 decode — the
configuration BASELINE.json targets ("captions/sec/chip at beam=3").

Methodology: distinct pre-staged input batches each iteration (defeats any
same-input result reuse in the runtime); decode calls are dispatched as a
depth-bounded pipeline and every result is copied back to host (the real
eval loop, engine.eval_captions_json_generation, streams exactly this way
— the host->device->host round trip through the accelerator tunnel costs
~30ms/call if synchronized per batch, which would dominate the measurement
and is overlap-able in any serving/eval loop).

``vs_baseline`` is measured on the SAME chip: the baseline is the
reference's decode architecture — beam search one image at a time
(eval_batch_size forced to 1 under beam, reference Utils.py:72-74), f32 —
run as a B=1 jitted program per image (generous: the reference also pays a
Python loop per *step*).  The denominator is PINNED to the median of all
recorded baseline measurements (BASELINE_SAMPLES.json, appended each run)
so the published ratio doesn't carry the B=1 emulation's run-to-run noise
on top of the numerator's (driver r04 observed 261x vs the committed
snapshot's 290x from denominator draw alone).  The current run's raw
measurement is still reported as ``baseline_this_run``.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.models.base import get_captioner

BATCH = 384     # throughput-optimal on one chip with the fused top-k head
                # (256/384/512 sweep: 8340/8587/7909 captions/sec — the
                # fused head removed the (B,k,V) candidate pipeline cost
                # that previously put the knee at 256; examples/bench_ab.py)
BEAM = 3
MAX_STEPS = 20          # reference decode length cap (Engine.py:260,286)
VOCAB = 10102   # the real COCO14 production head: len(caption_vocab.pkl)
                # at /root/reference/Data/MSCOCO/2014 (locked by
                # tests/test_vocab_and_metrics.py::test_reference_vocab_pickles)
N_BOX = 36
ITERS = 8
BASELINE_IMAGES = 8     # sequential-B1 baseline sample size


def _probe_chip(attempts: int = 6, probe_timeout: int = 150,
                wait: int = 120) -> None:
    """The axon tunnel can wedge — a fresh process sometimes hangs on a
    device RPC at ~0% CPU (docs/STATUS.md "Known gaps"; scripts/run_gate.sh
    carries the same defense for the quality gates).  Probe the chip with a
    tiny matmul in a SUBPROCESS (so a wedged connection can't hang this
    process), retry with backoff, and fail fast with a clear message
    instead of hanging the driver's unattended round-end run.  Skippable
    via SICZ_BENCH_NO_PROBE=1; instant no-op on CPU-only hosts."""
    if os.environ.get("SICZ_BENCH_NO_PROBE"):
        return
    import subprocess
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)));"
            "print('ok')")
    fast_failures = 0
    for a in range(attempts):
        err = b""
        try:
            t_start = time.perf_counter()
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr or b""
            # a fast nonzero exit is a deterministic failure (broken jax
            # install, bad flags), not a wedge — backing off won't fix it
            if time.perf_counter() - t_start < 15:
                fast_failures += 1
                if fast_failures >= 2:
                    print("[bench] probe fails deterministically; stderr "
                          "tail:\n" + err.decode(errors="replace")[-2000:],
                          file=sys.stderr, flush=True)
                    sys.exit(75)
        except subprocess.TimeoutExpired:
            fast_failures = 0
        print(f"[bench] chip probe failed (attempt {a + 1}/{attempts}); "
              f"waiting {wait}s", file=sys.stderr, flush=True)
        if err:
            print("[bench] probe stderr tail: "
                  + err.decode(errors="replace")[-500:],
                  file=sys.stderr, flush=True)
        if a + 1 < attempts:
            time.sleep(wait)
    print("[bench] device never answered the probe; aborting instead of "
          "hanging", file=sys.stderr, flush=True)
    sys.exit(75)


def main():
    _probe_chip()
    cfg = ModelConfig(model_type="AoADetection", vocab_size=VOCAB,
                      embed_dim=1024, hidden_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=N_BOX)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    rng = np.random.default_rng(0)
    masks = jnp.ones((BATCH, N_BOX))
    batches = [
        {"bu_feats": jax.device_put(
            rng.normal(size=(BATCH, N_BOX, 2048)).astype(np.float32)),
         "bu_masks": masks}
        for _ in range(ITERS + 2)]

    beam = S.make_beam_decode(model, beam_size=BEAM, max_steps=MAX_STEPS,
                              dtype=jnp.bfloat16)
    # warm on two dedicated batches so every TIMED input is first-seen
    np.asarray(beam(params, {}, batches[-2]))  # compile + warm
    np.asarray(beam(params, {}, batches[-1]))
    t0 = time.perf_counter()
    pending = []
    for visual in batches[:ITERS]:
        pending.append(beam(params, {}, visual))
        if len(pending) > 2:                  # depth-2 pipeline
            np.asarray(pending.pop(0))        # ids D2H copy (sync point)
    for out in pending:
        np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    batched_cps = BATCH / dt

    # roofline accounting: analytic matmul FLOPs of one decode batch (XLA's
    # cost analysis counts while-loop bodies once, so it can't be used here;
    # see utils/flops.py) -> achieved TFLOP/s and MFU vs the assumed bf16
    # peak.  Beam decode is expected to land at LOW MFU — each of the ~20
    # while_loop steps is a chain of (B*k, 1024)-row matmuls, so the op mix
    # is HBM-bandwidth and dispatch bound, not MXU bound
    # (see docs/BENCHMARKS.md).
    from simpleimagecaptionzoo_tpu.utils.flops import decode_flops
    from simpleimagecaptionzoo_tpu.utils.profiling import mfu
    flops = decode_flops(cfg, BATCH, N_BOX, MAX_STEPS, beam=BEAM)
    roof = mfu(flops, dt, "bf16") or {}

    # baseline: one image at a time, f32 (reference decode architecture).
    # Warm on the warm-dedicated batch (batches[-1]) so the first TIMED
    # input below (batches[0] row 0) is first-seen, same as the batched path
    beam1 = S.make_beam_decode(model, beam_size=BEAM, max_steps=MAX_STEPS)
    vw = batches[-1]
    np.asarray(beam1(params, {},
                     {"bu_feats": vw["bu_feats"][:1],
                      "bu_masks": vw["bu_masks"][:1]}))  # compile
    t0 = time.perf_counter()
    for i in range(BASELINE_IMAGES):
        vi = batches[i % len(batches)]
        np.asarray(beam1(params, {},
                         {"bu_feats": vi["bu_feats"][i:i + 1],
                          "bu_masks": vi["bu_masks"][i:i + 1]}))
    seq_cps = BASELINE_IMAGES / (time.perf_counter() - t0)

    # pin the ratio's denominator: median over every recorded baseline
    # sample plus this run (VERDICT r4 weak #4 — both numerator and
    # denominator were re-drawn each run, so the published ratio wobbled
    # 261-290x on denominator noise alone)
    import statistics
    samples_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BASELINE_SAMPLES.json")
    samples = []
    try:
        with open(samples_path) as f:
            store = json.load(f)
        samples = [float(s["value"]) for s in store.get("samples", [])]
    except (OSError, ValueError, KeyError):
        store = None
    seq_cps_median = statistics.median(samples + [seq_cps])
    if store is not None:
        try:
            store["samples"].append(
                {"source": "bench.py run", "value": round(seq_cps, 2)})
            with open(samples_path, "w") as f:
                json.dump(store, f, indent=2)
                f.write("\n")
        except OSError:
            pass                      # read-only checkout: median still pinned

    # the engine's real beam cap is 50 (config.beam_max_steps, reference
    # NIC_Model.py:169); random bench weights never early-exit, so this row
    # is the exactly-50-step WORST CASE (trained models emit <end> and the
    # while_loop's all-finished exit fires much earlier — measured ~10-14
    # steps on gate-trained models, docs/BENCHMARKS.md).  Reported so the
    # cap-20 headline's early-exit assumption is data, not hope
    # (VERDICT r3 next #5).
    beam50 = S.make_beam_decode(model, beam_size=BEAM, max_steps=50,
                                dtype=jnp.bfloat16)
    np.asarray(beam50(params, {}, batches[-2]))  # compile + warm
    np.asarray(beam50(params, {}, batches[-1]))
    iters50 = max(ITERS // 2, 2)
    t0 = time.perf_counter()
    pending = []
    for visual in batches[:iters50]:
        pending.append(beam50(params, {}, visual))
        if len(pending) > 2:
            np.asarray(pending.pop(0))
    for p in pending:
        np.asarray(p)
    cap50_cps = BATCH / ((time.perf_counter() - t0) / iters50)

    out = {
        "metric": "captions_per_sec_beam3_aoadet",
        "value": round(batched_cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(batched_cps / max(seq_cps_median, 1e-9), 2),
        "value_cap50_no_early_exit": round(cap50_cps, 2),
        "baseline_this_run": round(seq_cps, 2),
        "baseline_median": round(seq_cps_median, 2),
        "baseline_n": len(samples) + 1,
    }
    if flops:
        out["decode_flops_per_batch"] = flops
        out.update({"decode_" + k: v for k, v in roof.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
