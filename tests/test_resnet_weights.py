"""ResNet-101 weight-conversion test: a synthetic torchvision-format
state_dict (correct key names + OIHW shapes) must convert into a tree with
exactly the structure/shapes of resnet.init(), and the converted BN/conv
values must land in the right leaves (models/resnet.py
load_torchvision_weights).  torchvision itself isn't installed here, so the
state_dict is generated name-by-name."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from simpleimagecaptionzoo_tpu.models import resnet  # noqa: E402


def synthetic_state_dict():
    sd = {}
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = t(c)
        sd[prefix + ".bias"] = t(c)
        sd[prefix + ".running_mean"] = t(c)
        sd[prefix + ".running_var"] = torch.abs(t(c)) + 0.5
        sd[prefix + ".num_batches_tracked"] = torch.tensor(0)

    sd["conv1.weight"] = t(64, 3, 7, 7)          # OIHW
    add_bn("bn1", 64)
    cin = 64
    for li, (count, width) in enumerate(zip(resnet.BLOCK_COUNTS,
                                            resnet.WIDTHS), start=1):
        cout = width * 4
        for bi in range(count):
            pre = f"layer{li}.{bi}"
            sd[pre + ".conv1.weight"] = t(width, cin, 1, 1)
            add_bn(pre + ".bn1", width)
            sd[pre + ".conv2.weight"] = t(width, width, 3, 3)
            add_bn(pre + ".bn2", width)
            sd[pre + ".conv3.weight"] = t(cout, width, 1, 1)
            add_bn(pre + ".bn3", cout)
            if bi == 0:
                sd[pre + ".downsample.0.weight"] = t(cout, cin, 1, 1)
                add_bn(pre + ".downsample.1", cout)
            cin = cout
    sd["fc.weight"] = t(1000, 2048)   # ignored by the converter
    sd["fc.bias"] = t(1000)
    return sd


def test_conversion_structure_and_values(tmp_path, monkeypatch):
    monkeypatch.setattr(resnet, "BLOCK_COUNTS", (1, 1, 1, 1))
    sd = synthetic_state_dict()
    path = tmp_path / "resnet101.pth"
    torch.save(sd, path)
    params, stats = resnet.load_torchvision_weights(str(path))

    ref_params, ref_stats = resnet.init(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref_params))
    assert (jax.tree_util.tree_structure(stats)
            == jax.tree_util.tree_structure(ref_stats))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref_params)):
        assert a.shape == b.shape, (a.shape, b.shape)

    # value spot-checks: OIHW -> HWIO transpose and BN mapping
    np.testing.assert_allclose(
        np.asarray(params["conv1"]),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(stats["bn1"]["mean"]),
                               sd["bn1.running_mean"].numpy())
    np.testing.assert_allclose(
        np.asarray(params["layer1"][0]["downsample_conv"]),
        np.transpose(sd["layer1.0.downsample.0.weight"].numpy(),
                     (2, 3, 1, 0)))

    # converted tree actually runs through the forward pass
    import jax.numpy as jnp
    img = jnp.zeros((2, 64, 64, 3), jnp.float32)
    fmap = resnet.apply(params, stats, img)
    assert fmap.shape == (2, 2, 2, 2048)


def test_conv_padding_matches_torch():
    """Stride-2 3x3 conv must use torch's symmetric padding=1 — XLA "SAME"
    resolves to (0,1) on even inputs and misaligns the residual branch
    (code-review finding, confirmed numerically here)."""
    import jax.numpy as jnp
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    ours = resnet._conv(jnp.asarray(x), jnp.asarray(w), stride=2)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_adaptive_pool_integer_ratio_is_box_mean():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    fmap = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    out = np.asarray(resnet.spatial_features(jnp.asarray(fmap), grid=2))
    expect = fmap.reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4)).reshape(1, 4, 2)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_train_mode_bn_matches_torch_and_bounds_scale():
    """Train-mode BN must (a) use batch statistics like torch (verified
    against torch.nn.functional.batch_norm incl. the running-stat update),
    and (b) keep RANDOM-INIT backbone features at sane magnitudes — the
    frozen-stats recipe let activation variance compound through 101
    layers into ~1e7-magnitude features that collapsed decoders trained
    from scratch (diagnosed on-chip)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    # (a) single-BN parity vs torch, train mode, momentum 0.1
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(4, 5, 5, 8)).astype(np.float32)
    p = {"scale": jnp.asarray(rng.normal(size=8).astype(np.float32)),
         "bias": jnp.asarray(rng.normal(size=8).astype(np.float32))}
    s = {"mean": jnp.asarray(rng.normal(size=8).astype(np.float32)),
         "var": jnp.asarray(rng.uniform(0.5, 2, 8).astype(np.float32))}
    out, new_s = resnet._bn(jnp.asarray(x), p, s, train=True)
    rm = torch.from_numpy(np.asarray(s["mean"]).copy())
    rv = torch.from_numpy(np.asarray(s["var"]).copy())
    ref = F.batch_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), rm, rv,
                       torch.from_numpy(np.asarray(p["scale"])),
                       torch.from_numpy(np.asarray(p["bias"])),
                       training=True, momentum=0.1,
                       eps=1e-5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_s["mean"]), rm.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]), rv.numpy(),
                               rtol=1e-5, atol=1e-6)

    # (b) random-init full backbone: train-mode features bounded, frozen
    # eval-mode features from init stats explode
    params, stats = resnet.init(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    fmap_tr, new_stats = resnet.apply(params, stats, img, train=True)
    scale_tr = float(jnp.max(jnp.abs(fmap_tr.astype(jnp.float32))))
    assert scale_tr < 100.0, scale_tr
    assert jax.tree_util.tree_structure(new_stats) \
        == jax.tree_util.tree_structure(stats)
    # eval with the UPDATED stats stays in a sane range too
    fmap_ev = resnet.apply(params, new_stats, img)
    assert float(jnp.max(jnp.abs(fmap_ev.astype(jnp.float32)))) < 1e4
