"""Train-step tests: XE + SCST steps compile and run, losses are finite,
parameters actually move, frozen-partition lr=0 leaves the cnn partition
untouched, and the whole thing runs sharded over an 8-device CPU mesh
(SURVEY.md §4 implication: multi-chip tests on a virtual mesh)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.config import ModelConfig
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops.cider import CiderDTable
from simpleimagecaptionzoo_tpu.parallel import (get_mesh, replicate_tree,
                                                shard_batch)

V = 30
B = 8
T = 9


def build(model_type="BUTDDetection"):
    cfg = ModelConfig(model_type=model_type, vocab_size=V, embed_dim=16,
                      hidden_dim=16, atten_dim=12, enc_dim=10, enc_img_size=3,
                      num_heads=4, num_refine_layers=2)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=False)
    return cfg, model, params


def xe_batch(rng):
    caps = rng.integers(4, V, size=(B, T)).astype(np.int32)
    caps[:, 0] = 1
    lengths = rng.integers(4, T, size=(B,)).astype(np.int32)
    for i, l in enumerate(lengths):
        caps[i, l - 1] = 2
        caps[i, l:] = 0
    mask = np.ones((B, 6), np.float32)
    mask[0, 4:] = 0
    return {
        "visual": {"bu_feats": rng.normal(size=(B, 6, 10)).astype(np.float32),
                   "bu_masks": mask},
        "captions": caps,
        "lengths": lengths,
    }


def test_xe_step_runs_and_learns(rng):
    _, model, params = build()
    tx = make_grad_transform("Adam", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx)
    step = S.make_xe_train_step(model, tx, labels)
    batch = xe_batch(rng)
    p0 = jax.tree_util.tree_map(lambda x: np.array(x), params)
    losses = []
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(i), 0.0, 1e-2, 0.0)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "loss did not decrease on a fixed batch"
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.array(a) - b).max()), state.params, p0)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_frozen_cnn_partition(rng, monkeypatch):
    """lr_cnn=0 must leave 'cnn'-labelled leaves bit-identical."""
    from simpleimagecaptionzoo_tpu.models import resnet
    # 1-block-per-stage ResNet so the CPU test compiles in seconds
    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    cfg = ModelConfig(model_type="NIC", vocab_size=V, embed_dim=8,
                      hidden_dim=8, enc_dim=2048)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=True)
    tx = make_grad_transform("Adam", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx,
                              model_state=model.init_model_state())
    step = S.make_xe_train_step(model, tx, labels)
    batch = xe_batch(rng)
    batch["visual"] = {
        "img_tensors": rng.normal(size=(B, 32, 32, 3)).astype(np.float32)}
    cnn0 = jax.tree_util.tree_map(lambda x: np.array(x), params["cnn"])
    emb0 = np.array(params["embed"]["table"])  # snapshot: step donates params
    state, _ = step(state, batch, jax.random.PRNGKey(0), 0.0, 1e-2, 0.0)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.array(a) - b).max()),
        state.params["cnn"], cnn0)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    # non-cnn moved
    emb_moved = np.abs(np.array(state.params["embed"]["table"]) - emb0).max()
    assert emb_moved > 0


def test_freeze_cnn_static_variant(rng, monkeypatch):
    """freeze_cnn=True stop-gradients the backbone: cnn leaves identical,
    loss finite, non-cnn leaves move (engine switches variants at the
    finetune boundary)."""
    from simpleimagecaptionzoo_tpu.models import resnet
    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    cfg = ModelConfig(model_type="NIC", vocab_size=V, embed_dim=8,
                      hidden_dim=8, enc_dim=2048)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=True)
    tx = make_grad_transform("Adam", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx,
                              model_state=model.init_model_state())
    step = S.make_xe_train_step(model, tx, labels, freeze_cnn=True)
    batch = xe_batch(rng)
    batch["visual"] = {
        "img_tensors": rng.integers(0, 255, size=(B, 32, 32, 3)
                                    ).astype(np.uint8)}
    cnn0 = jax.tree_util.tree_map(lambda x: np.array(x), params["cnn"])
    emb0 = np.array(params["embed"]["table"])
    # nonzero lr_cnn on purpose: stop_gradient must freeze regardless
    state, m = step(state, batch, jax.random.PRNGKey(0), 0.0, 1e-2, 1e-2)
    assert np.isfinite(float(m["loss"]))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.array(a) - b).max()),
        state.params["cnn"], cnn0)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    assert np.abs(np.array(state.params["embed"]["table"]) - emb0).max() > 0


def test_scst_step(rng):
    _, model, params = build()
    tx = make_grad_transform("Adam", 0.25)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx)
    refs = [[[4, 5, 6, 7], [4, 6, 8]], [[9, 10, 11]]]
    table = CiderDTable.from_ref_corpus(refs)
    ref_ids = np.zeros((B, 5, 12), np.int32)
    ref_lens = np.zeros((B, 5), np.int32)
    for i in range(B):
        ref_ids[i, 0, :4] = [4, 5, 6, 7]
        ref_lens[i, 0] = 4
        ref_ids[i, 1, :3] = [9, 10, 11]
        ref_lens[i, 1] = 3
    batch = {"visual": xe_batch(rng)["visual"],
             "ref_ids": ref_ids, "ref_lens": ref_lens}
    step = S.make_scst_train_step(model, tx, labels,
                                  table.device_arrays(), table.probe,
                                  max_len=8)
    state, m = step(state, batch, jax.random.PRNGKey(0), 1e-3, 0.0)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["reward"]))


def test_xe_step_sharded_over_mesh(rng):
    """Same step under explicit data-parallel placement on the 8-device CPU
    mesh; per-shard batch = 1."""
    assert jax.device_count() >= 8
    _, model, params = build()
    mesh = get_mesh()
    tx = make_grad_transform("Adam", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx)
    state = TrainState(params=replicate_tree(mesh, state.params),
                       opt_state=replicate_tree(mesh, state.opt_state),
                       model_state={}, step=state.step)
    batch = shard_batch(mesh, xe_batch(rng))
    step = S.make_xe_train_step(model, tx, labels)
    state2, m = step(state, batch, jax.random.PRNGKey(0), 0.0, 1e-2, 0.0)
    assert np.isfinite(float(m["loss"]))
    # and the result params remain replicated (no surprise resharding)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == jax.device_count()
    # the ss_active=False variant is a DIFFERENT program (weight-stationary
    # tf_inputs hoist: an extra (T, B, 4H) scanned tensor) — it must shard
    # over the same mesh too
    # NOTE: the first step call DONATED `state`'s buffers (steps.py
    # donate_argnums=(0,)) — the second program needs a live state;
    # state2 is the donated-output, still replicated over the mesh.
    step_ws = S.make_xe_train_step(model, tx, labels, ss_active=False)
    state3, m3 = step_ws(state2, batch, jax.random.PRNGKey(0), 0.0, 1e-2,
                         0.0)
    assert np.isfinite(float(m3["loss"]))
    leaf3 = jax.tree_util.tree_leaves(state3.params)[0]
    assert len(leaf3.sharding.device_set) == jax.device_count()


def test_eval_loss_and_decodes_jit(rng):
    _, model, params = build()
    batch = xe_batch(rng)
    eval_loss = S.make_xe_eval_loss(model)
    l = float(eval_loss(params, {}, batch))
    assert np.isfinite(l)
    dec = S.make_greedy_decode(model, max_len=6)
    ids = np.array(dec(params, {}, batch["visual"]))
    assert ids.shape == (B, 6)
    beam = S.make_beam_decode(model, beam_size=3, max_steps=7)
    bids = np.array(beam(params, {}, batch["visual"]))
    assert bids.shape == (B, 8) and (bids[:, 0] == 1).all()


def test_tensor_parallel_predict_head_matches_replicated(rng):
    """Vocab-dim TP of the prediction head over a (4,2) mesh must be
    numerically transparent: same XE loss, same greedy ids, same updated
    params as the fully-replicated (8,1) mesh."""
    from simpleimagecaptionzoo_tpu.parallel import place_params
    from simpleimagecaptionzoo_tpu.parallel.mesh import MODEL_AXIS
    assert jax.device_count() >= 8
    batch = xe_batch(rng)
    results = {}
    for mp in (1, 2):
        # rebuild per mesh config: the donating train step may invalidate
        # buffers aliased by place_params' device_put
        _, model, params = build()
        mesh = get_mesh(jax.devices()[:8], model_parallel=mp)
        placed = place_params(mesh, params)
        if mp > 1:   # the head really is sharded over the model axis
            v_sh = placed["predict"]["v"].sharding
            assert v_sh.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
        tx = make_grad_transform("Adam", 0.1)
        state = TrainState.create(placed, tx)
        step = S.make_xe_train_step(model, tx, model.param_labels(params))
        state, m = step(state, shard_batch(mesh, batch),
                        jax.random.PRNGKey(0), 0.0, 1e-2, 0.0)
        dec = S.make_greedy_decode(model, max_len=6)
        ids = np.asarray(dec(state.params, {},
                             shard_batch(mesh, batch["visual"])))
        results[mp] = (float(m["loss"]), ids,
                       np.asarray(state.params["predict"]["v"]))
    assert results[1][0] == pytest.approx(results[2][0], rel=1e-5)
    np.testing.assert_array_equal(results[1][1], results[2][1])
    # post-Adam params: the hoisted teacher-forcing head computes dW as one
    # (H, B*T)@(B*T, V[/mp]) dot whose reduction tiling differs between the
    # sharded and replicated vocab shapes; Adam's rsqrt normalization
    # amplifies the last-ulp grad noise on near-zero entries, so this is
    # close-but-not-bitwise (observed <=3e-5 rel on <1% of elements)
    np.testing.assert_allclose(results[1][2], results[2][2],
                               rtol=2e-4, atol=1e-6)


def test_mixed_precision_xe_step_learns(rng):
    """compute_dtype=bfloat16 (f32 master params, bf16 forward/backward)
    must still reduce the loss and keep params/opt state f32."""
    _, model, params = build()
    tx = make_grad_transform("Adam", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx)
    step = S.make_xe_train_step(model, tx, labels,
                                compute_dtype=jnp.bfloat16)
    batch = xe_batch(rng)
    losses = []
    for i in range(12):
        state, m = step(state, batch, jax.random.PRNGKey(i), 0.0, 1e-2, 0.0)
        losses.append(float(m["loss"]))
    # bf16 compute at tiny dims converges slower than f32 — require a clear
    # downward trend, not a fixed ratio
    assert losses[-1] < losses[0] * 0.9, losses
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_mixed_precision_scst_step_runs(rng):
    _, model, params = build()
    tx = make_grad_transform("Adam", 0.25)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx)
    table = CiderDTable.from_ref_corpus([[[4, 5, 6], [4, 6]], [[7, 8, 9]]])
    b = xe_batch(rng)
    ref_ids = np.zeros((B, 5, 10), np.int32)
    ref_lens = np.zeros((B, 5), np.int32)
    ref_ids[:, 0, :3] = [4, 5, 6]
    ref_lens[:, 0] = 3
    batch = {"visual": b["visual"], "ref_ids": jnp.asarray(ref_ids),
             "ref_lens": jnp.asarray(ref_lens)}
    step = S.make_scst_train_step(model, tx, labels, table.device_arrays(),
                                  table.probe, max_len=6,
                                  compute_dtype=jnp.bfloat16)
    state, m = step(state, batch, jax.random.PRNGKey(0), 1e-4, 0.0)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_cnn_finetune_scope_is_layer4_only(rng, monkeypatch):
    """With finetune engaged (lr_cnn>0), ONLY ResNet layer4 may move —
    the reference unfreezes children()[7:] alone (NIC_Model.py:233-244),
    so stem + layers 1-3 stay at init for the whole run (not even SGD
    weight decay touches them: they are in no optimizer param group)."""
    from simpleimagecaptionzoo_tpu.models import resnet
    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    cfg = ModelConfig(model_type="NIC", vocab_size=V, embed_dim=8,
                      hidden_dim=8, enc_dim=2048)
    model = get_captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0), include_cnn=True)
    # SGD: its weight decay is the subtle mover the partition must block
    tx = make_grad_transform("SGD", 0.1)
    labels = model.param_labels(params)
    state = TrainState.create(params, tx,
                              model_state=model.init_model_state())
    step = S.make_xe_train_step(model, tx, labels)
    batch = xe_batch(rng)
    batch["visual"] = {
        "img_tensors": rng.normal(size=(B, 32, 32, 3)).astype(np.float32)}
    cnn0 = jax.tree_util.tree_map(lambda x: np.array(x), params["cnn"])
    state, m = step(state, batch, jax.random.PRNGKey(0), 0.0, 1e-2, 1e-2)
    assert np.isfinite(float(m["loss"]))
    for key, before in cnn0.items():
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.array(a) - b).max()),
            state.params["cnn"][key], before)
        moved = max(jax.tree_util.tree_leaves(diff))
        if key == "layer4":
            assert moved > 0, "layer4 must train when finetune is engaged"
        else:
            assert moved == 0.0, f"{key} must stay frozen (reference scope)"


def test_configure_collective_timeout_env(monkeypatch):
    """Straggler diagnosability (VERDICT r4 next #6): the helper appends the
    XLA CPU collective timeout flag, and an operator's explicit setting
    wins over the default."""
    from simpleimagecaptionzoo_tpu.parallel import configure_collective_timeout

    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    configure_collective_timeout(600)
    assert ("--xla_cpu_collective_timeout_seconds=600"
            in os.environ["XLA_FLAGS"])
    # idempotent / explicit-setting-wins: a second call must not override
    configure_collective_timeout(50)
    assert os.environ["XLA_FLAGS"].count(
        "xla_cpu_collective_timeout_seconds") == 1
    assert "=600" in os.environ["XLA_FLAGS"]
