"""Schedule parity (staircase LR decay Engine.py:126-138, scheduled-sampling
Engine.py:140-144, CNN-finetune LR min rule Engine.py:135) and checkpoint
save/load roundtrips with the reference's resume/best-gating semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import LrOpts, SsOpts
from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager


def ref_decay(epoch, start, every, rate):
    if epoch > start and start >= 0:
        return rate ** ((epoch - start) // every)
    return 1.0


def ref_ss(epoch, start, every, inc, mx):
    if epoch > start and start >= 0:
        return min(inc * ((epoch - start) // every), mx)
    return 0.0


def test_lr_staircase_matches_reference_formula():
    lr = LrOpts(learning_rate=4e-4, cnn_finetune_learning_rate=1e-4,
                lr_dec_start_epoch=0, lr_dec_every=3, lr_dec_rate=0.8)
    for epoch in range(1, 31):
        assert abs(lr.decay_factor(epoch)
                   - ref_decay(epoch, 0, 3, 0.8)) < 1e-12
    # disabled decay (start -1)
    lr2 = LrOpts(lr_dec_start_epoch=-1)
    assert all(lr2.decay_factor(e) == 1.0 for e in range(1, 31))


def test_cnn_lr_min_rule():
    """cnn_ft_lr = min(cnn_ft_lr, lr*decay) * enabled (Engine.py:135)."""
    lr = LrOpts(learning_rate=4e-4, cnn_finetune_learning_rate=1e-4,
                lr_dec_start_epoch=0, lr_dec_every=3, lr_dec_rate=0.5)
    # before finetune start: 0
    _, cnn = lr.lrs_for_epoch(3, cnn_ft_model=True, cnn_ft_enabled=False)
    assert cnn == 0.0
    # enabled, early epochs: capped at cnn_ft_lr
    main, cnn = lr.lrs_for_epoch(3, True, True)
    assert cnn == 1e-4
    # late epochs: decayed main lr dips below cnn_ft_lr -> min applies
    main, cnn = lr.lrs_for_epoch(20, True, True)
    assert abs(main - 4e-4 * 0.5 ** 6) < 1e-12
    assert cnn == min(1e-4, main)
    # non-cnn model: always 0
    _, cnn = lr.lrs_for_epoch(20, False, True)
    assert cnn == 0.0


def test_ss_schedule_matches_reference_formula():
    ss = SsOpts(ss_start_epoch=0, ss_inc_every=5, ss_inc_prob=0.05,
                ss_max_prob=0.5)
    for epoch in range(1, 80):
        assert abs(ss.prob_for_epoch(epoch)
                   - ref_ss(epoch, 0, 5, 0.05, 0.5)) < 1e-12
    assert SsOpts(ss_start_epoch=-1).prob_for_epoch(10) == 0.0


def test_checkpoint_roundtrip_and_gating(tmp_path):
    ck = CheckpointManager("NIC", "Flickr8K", root=str(tmp_path))
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "model_state": {}}
    # fresh: nothing to load, epoch 1
    loaded, his, start = ck.load(tree)
    assert loaded is None and his == [] and start == 1
    assert ck.history_best() == 0.0

    ck.save(tree, [0.7, 0.9])
    ck.save_best(tree, 0.9)
    loaded, his, start = ck.load(tree)
    assert start == 3 and his == [0.7, 0.9]
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert ck.history_best() == 0.9

    # scst records are independent (and use the FIXED filename both ways)
    assert ck.history_best(scst=True) == 0.0
    ck.save_best(tree, 1.1, scst=True)
    assert ck.history_best(scst=True) == 1.1
    _, _, s_start = ck.load(tree, scst=True)
    assert s_start == 1   # no scst latest checkpoint yet

    # best-load falls back to latest when best file absent
    ck2 = CheckpointManager("BUTDSpatial", "Flickr8K", root=str(tmp_path))
    ck2.save(tree, [0.5])
    loaded, his, start = ck2.load(tree, best=True)
    assert loaded is not None and start == 2


def test_checkpoint_preserves_dtypes(tmp_path):
    ck = CheckpointManager("AoADetection", "COCO14", root=str(tmp_path))
    tree = {"params": {"a": jnp.ones((3,), jnp.bfloat16),
                       "b": jnp.ones((2,), jnp.int32)},
            "model_state": {}}
    host = jax.tree_util.tree_map(np.asarray, tree)
    ck.save(host, [1.0])
    loaded, _, _ = ck.load(tree)
    assert np.asarray(loaded["params"]["a"]).dtype == jnp.bfloat16
    assert np.asarray(loaded["params"]["b"]).dtype == np.int32
