"""On-chip ablation of the SCST step's cost at production shapes.

Times the full SCST step and three ablated variants (constant reward /
constant baseline / both) to decompose the bf16 step into greedy
baseline decode, rollout fwd+bwd, and on-device CIDEr-D reward cost.
``--norms`` feeds precomputed per-image ref norms
(ops.cider.ref_norms_device), mirroring the production engine's SCST
setup — the measurement that motivated the reward-path rework recorded
in docs/BENCHMARKS.md (reward 24.5 -> 9.1 ms, step 56 -> 41 ms).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine.optim import (apply_updates_partitioned,
                                                    make_grad_transform)
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import decode
from simpleimagecaptionzoo_tpu.ops.cider import CiderDTable, self_critical_reward
from simpleimagecaptionzoo_tpu.ops.losses import reward_criterion

B, V, T, NBOX, MAXLEN = 128, 10102, 22, 36, 20
rng = np.random.default_rng(0)

cfg = ModelConfig(model_type="BUTDDetection", vocab_size=V, embed_dim=1024,
                  hidden_dim=1024, atten_dim=1024, enc_dim=2048,
                  num_heads=8, num_refine_layers=6, max_bu_len=NBOX)
model = get_captioner(cfg)
params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
labels = model.param_labels(params)

n_ngrams = 1_300_000
h = rng.integers(0, 2**32, size=(2, n_ngrams), dtype=np.uint64)
table = CiderDTable(h[0].astype(np.uint32), h[1].astype(np.uint32),
                    rng.integers(1, 500, n_ngrams).astype(np.float32),
                    float(np.log(113_287)))
tdev, probe = table.device_arrays(), table.probe
ref_ids = jnp.asarray(rng.integers(4, 50, size=(B, 5, 22)).astype(np.int32))
ref_lens = jnp.asarray(rng.integers(6, 20, size=(B, 5)).astype(np.int32))
from simpleimagecaptionzoo_tpu.ops.cider import ref_norms_device
ref_norms = jax.jit(lambda i, l: ref_norms_device(tdev, probe, i, l))(
    ref_ids, ref_lens) if "--norms" in __import__("sys").argv else None
visual = {"bu_feats": jnp.asarray(
    rng.normal(size=(B, NBOX, 2048)).astype(np.float32)),
    "bu_masks": jnp.ones((B, NBOX), jnp.float32)}
batch = {"visual": visual, "ref_ids": ref_ids, "ref_lens": ref_lens}
if ref_norms is not None:
    batch["ref_norms"] = ref_norms
    print("using precomputed ref norms")

CD = jnp.bfloat16


def _cast(tree):
    from simpleimagecaptionzoo_tpu.engine.steps import _cast_floats
    return _cast_floats(tree, CD)


def make_step(use_reward: bool, use_baseline: bool, do_rollout: bool = True):
    def step(state, batch, rng, lr_main, lr_cnn):
        r_enc, r_roll = jax.random.split(rng)
        vis = _cast(batch["visual"])
        params_c = _cast(state.params)
        if use_baseline:
            enc_eval, _ = model.encode(params_c, vis, train=False,
                                       model_state=state.model_state)
            greedy_seq, _ = decode.greedy(model, params_c, enc_eval, MAXLEN)
            greedy_seq = jax.lax.stop_gradient(greedy_seq)
        else:
            greedy_seq = jnp.zeros((B, MAXLEN), jnp.int32)

        def loss_fn(params):
            params = _cast(params)
            enc, new_ms = model.encode(params, vis, train=True, rng=r_enc,
                                       model_state=state.model_state)
            seq, logp = decode.sample_rl(model, params, enc, MAXLEN, r_roll,
                                         train=True)
            if use_reward:
                reward = self_critical_reward(tdev, probe, seq, greedy_seq,
                                              batch["ref_ids"],
                                              batch["ref_lens"],
                                              ref_norms=batch.get("ref_norms"))
            else:
                reward = jnp.ones((seq.shape[0],), jnp.float32)
            loss = reward_criterion(logp, seq, reward)
            return loss, (new_ms, reward)

        (loss, (new_ms, reward)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_partitioned(state.params, updates, labels,
                                               lr_main, lr_cnn)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  model_state=new_ms, step=state.step + 1)
        return new_state, {"loss": loss}
    return jax.jit(step, donate_argnums=(0,))


tx = make_grad_transform("Adam", 0.25)
params_host = jax.tree_util.tree_map(np.asarray, params)


def bench(name, step, iters=30):
    fresh = jax.tree_util.tree_map(jnp.asarray, params_host)
    state = TrainState.create(fresh, tx, model_state=model.init_model_state())
    state, m = step(state, batch, jax.random.PRNGKey(0), 1e-5, 0.0)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i + 1), 1e-5, 0.0)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms ({1/dt:.2f} steps/s)")
    return dt


full = bench("full SCST (baseline+reward)", make_step(True, True))
norew = bench("no reward (const 1.0)     ", make_step(False, True))
nobase = bench("no baseline (zeros seq)   ", make_step(True, False))
neither = bench("rollout+bwd only          ", make_step(False, False))
print(f"reward cost  ~{(full-norew)*1e3:.2f} ms")
print(f"baseline cost ~{(full-nobase)*1e3:.2f} ms")
print(f"rollout+bwd   ~{neither*1e3:.2f} ms")
