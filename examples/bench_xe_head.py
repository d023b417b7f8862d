"""On-chip decomposition of the XE step's head+loss cost at production shapes.

The sizing probe behind the REJECTED fused label-smoothing-CE training
kernel (the training-side sibling of ops/fused_head.py).  Times three
jitted programs at BUTD/AoA COCO14 production shapes (B=128, T=21
prediction steps, H=1024, V=10102):

  1. full XE train step (bf16 mixed precision) for the family
  2. head+loss fwd+bwd alone: grad of label_smoothing_loss(x @ W + b)
     wrt x and head params, from device-resident hidden states
  3. one raw (m, H) x (H, V) bf16 matmul pass (roofline calibration)

Measured on-chip (2026-08-17): head+loss fwd+bwd = 2.75 ms = **2.99
matmul-pass equivalents** — exactly the 3-pass ideal (fwd, dx, dW), so
XLA already fuses the log-softmax/loss elementwise into the passes and
the (B*T, V) logits HBM traffic costs nothing measurable.  A fused-CE
Pallas kernel cannot store logits for backward (that IS the traffic it
exists to avoid), so it must recompute them: >= 4 matmul passes
(~3.7 ms) — a guaranteed loss.  Decision recorded in docs/BENCHMARKS.md.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.ops.losses import label_smoothing_loss

B, T, H, V = 128, 21, 1024, 10102
m = B * T

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
w = jnp.asarray((rng.normal(size=(H, V)) * 0.02).astype(np.float32))
b = jnp.asarray(np.zeros((V,), np.float32))
tgt = jnp.asarray(rng.integers(4, V, size=(B, T)).astype(np.int32))
mask = jnp.asarray((rng.random((B, T)) < 0.8).astype(np.float32))


def head_loss(params, xx):
    xb = xx.astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        xb.reshape(m, H), params["w"].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + params["b"]
    return label_smoothing_loss(logits.reshape(B, T, V), tgt, mask, 0.1)


grad_fn = jax.jit(jax.value_and_grad(head_loss, argnums=(0, 1)))
params = {"w": w, "b": b}


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


dt_head = bench(grad_fn, params, x)
print(f"head+loss fwd+bwd: {dt_head*1e3:.3f} ms")

xb = x.reshape(m, H).astype(jnp.bfloat16)
wb = w.astype(jnp.bfloat16)
mm = jax.jit(lambda a, c: jax.lax.dot_general(
    a, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
dt_mm = bench(mm, xb, wb)
flops = 2 * m * H * V
print(f"raw matmul pass:   {dt_mm*1e3:.3f} ms "
      f"({flops/dt_mm/1e12:.1f} TFLOP/s)")
print(f"head+loss = {dt_head/dt_mm:.2f} matmul-pass equivalents "
      f"(classic ideal ~3 passes: fwd, dx, dW)")

# full XE step for two families
from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import get_captioner

for family in ("BUTDDetection", "AoADetection"):
    cfg = ModelConfig(model_type=family, vocab_size=V, embed_dim=1024,
                      hidden_dim=1024, atten_dim=1024, enc_dim=2048,
                      num_heads=8, num_refine_layers=6, max_bu_len=36)
    model = get_captioner(cfg)
    params_f = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    labels = model.param_labels(params_f)
    caps = rng.integers(4, V, size=(B, 22)).astype(np.int32)
    caps[:, 0] = 1
    lens = rng.integers(8, 22, size=(B,)).astype(np.int32)
    for i, l in enumerate(lens):
        caps[i, l - 1] = 2
        caps[i, l:] = 0
    batch = {"visual": {"bu_feats": jnp.asarray(
                 rng.normal(size=(B, 36, 2048)).astype(np.float32)),
                 "bu_masks": jnp.ones((B, 36), jnp.float32)},
             "captions": jnp.asarray(caps), "lengths": jnp.asarray(lens)}
    tx = make_grad_transform("Adam", 0.1)
    step = S.make_xe_train_step(model, tx, labels,
                                compute_dtype=jnp.bfloat16)

    def run_step(st):
        st2, mtr = step(st, batch, jax.random.PRNGKey(1), 0.25, 4e-4, 0.0)
        return st2, mtr

    state = TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, params_f), tx,
        model_state=model.init_model_state())
    state, mtr = run_step(state)
    jax.block_until_ready(mtr["loss"])
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        state, mtr = run_step(state)
    jax.block_until_ready(mtr["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{family}: XE step {dt*1e3:.2f} ms ({1/dt:.2f} steps/s) | "
          f"head+loss share ~{dt_head/dt:.1%}")
