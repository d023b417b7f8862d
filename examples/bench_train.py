"""Training throughput at COCO-production shapes on the local chip(s).

Measures XE and SCST steps/sec for BUTDDetection (batch 128, 36x2048
bottom-up features, vocab 9962, captions padded to 22 — the reference's
defaults, Main.py:160-175) with synthetic device-resident data, isolating
device step time from host IO.  SCST includes both rollouts AND the
on-device CIDEr-D reward — the path the reference pays a host round-trip
for every batch (SURVEY.md §3.2).

    python examples/bench_train.py [--model BUTDDetection] [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops.cider import CiderDTable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BUTDDetection")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=9962)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="training compute dtype (mixed precision)")
    ap.add_argument("--ss", default="on", choices=["on", "off"],
                    help="scheduled-sampling active (the reference's "
                         "post-schedule epochs) vs statically elided "
                         "(pre-schedule epochs; enables the tf_inputs "
                         "weight-stationary hoist)")
    ap.add_argument("--from_pixels", action="store_true",
                    help="feed 224x224 uint8 images through the full "
                         "ResNet-101 (Spatial/NIC models) instead of "
                         "precomputed bottom-up features")
    ap.add_argument("--device_ingest", action="store_true",
                    help="with --from_pixels: feed fast-ingest padded "
                         "boxes (B, 512, 512, 3) + img_hw so the step "
                         "includes the device-side triangle resample "
                         "(ops/image.resize_normalize)")
    args = ap.parse_args()
    print("devices:", jax.devices())

    b, v, t, n_box = args.batch, args.vocab, 22, 36
    cfg = ModelConfig(model_type=args.model, vocab_size=v, embed_dim=1024,
                      hidden_dim=1024, atten_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=n_box)
    model = get_captioner(cfg)
    from_pixels = args.from_pixels
    if from_pixels and not model.has_cnn:
        raise SystemExit(f"{args.model} has no CNN; --from_pixels needs a "
                         "Spatial/NIC model")
    params = model.init_params(jax.random.PRNGKey(0),
                               include_cnn=from_pixels)
    labels = model.param_labels(params)
    rng = np.random.default_rng(0)

    caps = rng.integers(4, v, size=(b, t)).astype(np.int32)
    caps[:, 0] = 1
    lens = rng.integers(8, t, size=(b,)).astype(np.int32)
    for i, l in enumerate(lens):
        caps[i, l - 1] = 2
        caps[i, l:] = 0
    if from_pixels and args.device_ingest:
        # the realistic fast-ingest shape: a 1/2 DCT-scaled 640x480 COCO
        # decode (240x320) in its 512 pad box, resized on device
        visual = {"img_tensors": jnp.asarray(
            rng.integers(0, 256, size=(b, 512, 512, 3)).astype(np.uint8)),
            "img_hw": jnp.asarray(
                np.tile(np.asarray([240, 320], np.int32), (b, 1)))}
    elif from_pixels:     # full ResNet-101 fwd+bwd incl. train-mode BN
        visual = {"img_tensors": jnp.asarray(
            rng.integers(0, 256, size=(b, 224, 224, 3)).astype(np.uint8))}
    elif args.model == "NIC":     # pooled (B, 2048) CNN features
        visual = {"features": jnp.asarray(
            rng.normal(size=(b, 2048)).astype(np.float32))}
    else:
        visual = {"bu_feats": jnp.asarray(
            rng.normal(size=(b, n_box, 2048)).astype(np.float32)),
            "bu_masks": jnp.ones((b, n_box), jnp.float32)}
    batch = {"visual": visual, "captions": jnp.asarray(caps),
             "lengths": jnp.asarray(lens)}

    # a realistic idf table: COCO14-train has ~1.3M distinct ngrams; refs
    # are random token ids over a small range so some ngrams do match the
    # rollouts (the absolute reward value is irrelevant to throughput)
    n_ngrams = 1_300_000
    h = rng.integers(0, 2**32, size=(2, n_ngrams), dtype=np.uint64)
    table = CiderDTable(h[0].astype(np.uint32), h[1].astype(np.uint32),
                        rng.integers(1, 500, n_ngrams).astype(np.float32),
                        float(np.log(113_287)))
    ref_ids = rng.integers(4, 50, size=(b, 5, 22)).astype(np.int32)
    ref_lens = rng.integers(6, 20, size=(b, 5)).astype(np.int32)
    scst_batch = {"visual": visual, "ref_ids": jnp.asarray(ref_ids),
                  "ref_lens": jnp.asarray(ref_lens)}
    # production engines precompute ref norms once per dataset
    # (engine.py SCST setup); the bench batch mirrors that
    from simpleimagecaptionzoo_tpu.ops.cider import ref_norms_device
    scst_batch["ref_norms"] = jax.jit(
        lambda i, l: ref_norms_device(table.device_arrays(), table.probe,
                                      i, l))(
        scst_batch["ref_ids"], scst_batch["ref_lens"])

    params_host = jax.tree_util.tree_map(np.asarray, params)

    from simpleimagecaptionzoo_tpu.utils.flops import (scst_train_flops,
                                                       xe_train_flops)
    from simpleimagecaptionzoo_tpu.utils.profiling import mfu

    stats_host = jax.tree_util.tree_map(np.asarray, model.init_model_state())

    def run(name, step_fn, batch, *extra):
        tx_args = extra
        # fresh device copies each run: the jitted steps donate their state
        fresh = jax.tree_util.tree_map(jnp.asarray, params_host)
        ms = jax.tree_util.tree_map(jnp.asarray, stats_host)
        state = TrainState.create(fresh, tx, model_state=ms)
        # analytic matmul FLOPs (XLA cost analysis counts loop bodies once
        # — unusable for scan/while programs; see utils/flops.py).  The
        # estimator covers the captioner only, so MFU is not reported for
        # --from_pixels runs (the ResNet FLOPs would be missing).
        est = xe_train_flops if name == "XE" else scst_train_flops
        flops = 0 if from_pixels else est(cfg, b, n_box,
                                          t - 1 if name == "XE" else 20)
        t0 = time.time()
        state, m = step_fn(state, batch, jax.random.PRNGKey(0), *tx_args)
        jax.block_until_ready(m["loss"])
        print(f"{name}: compile {time.time() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step_fn(state, batch, jax.random.PRNGKey(i + 1),
                               *tx_args)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        kind = "bf16" if cdtype is not None else "f32"
        roof = mfu(flops, dt, kind)
        extra_s = ""
        if roof:
            extra_s = (f" | {flops / 1e12:.2f} TFLOP/step -> "
                       f"{roof['achieved_tflops']:.1f} TFLOP/s "
                       f"= {roof['mfu']:.1%} of assumed "
                       f"{roof['peak_tflops_assumed']:.0f} TFLOP/s "
                       f"{kind} peak")
        print(f"{name}: {1.0 / dt:.2f} steps/sec "
              f"({b / dt:.0f} samples/sec, batch {b}) "
              f"loss={float(m['loss']):.4f}{extra_s}")
        return 1.0 / dt

    cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    tx = make_grad_transform("Adam", 0.1)
    # --ss off measures the pre-schedule epochs (the engine passes
    # ss_active=False until the ss schedule starts, engine.py): scheduled-
    # sampling draws are statically elided AND the weight-stationary
    # teacher-forcing hoist engages (Captioner.tf_inputs — the token rows
    # of each cell's w_ih leave the scan)
    ss_on = args.ss == "on"
    xe_step = S.make_xe_train_step(model, tx, labels, compute_dtype=cdtype,
                                   ss_active=ss_on)
    xe_sps = run("XE", xe_step, batch, 0.25 if ss_on else 0.0, 4e-4, 0.0)

    tx = make_grad_transform("Adam", 0.25)
    scst_step = S.make_scst_train_step(model, tx, labels,
                                       table.device_arrays(), table.probe,
                                       max_len=20, compute_dtype=cdtype)
    scst_sps = run("SCST", scst_step, scst_batch, 1e-5, 0.0)
    print(f"SUMMARY xe_steps_per_sec={xe_sps:.2f} "
          f"scst_steps_per_sec={scst_sps:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
