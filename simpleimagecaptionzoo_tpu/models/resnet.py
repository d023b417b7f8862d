"""ResNet-101 visual encoder, pure JAX (NHWC).

TPU-first re-design of the reference's torchvision encoder
(Models/NIC_Model.py:8-37, BUTD_Model.py:8-38): NHWC layout (TPU-native),
bfloat16 activations with f32 accumulation on the MXU.

BatchNorm matches torch train/eval semantics: ``apply(..., train=True)``
normalizes with BATCH statistics and returns momentum-updated running
stats (torch momentum 0.1, biased variance for normalization, unbiased
for the running update — the reference's backbone BNs run exactly this
way whenever the captioner is in train mode, even while the conv weights
are frozen); ``train=False`` uses the running stats.  Train-mode batch
stats are essential for training the backbone FROM SCRATCH: with frozen
(0, 1) init stats the per-layer renormalization is gone and activation
variance compounds through all 101 layers into ~1e7-magnitude features
that saturate the decoder (observed — see docs/PARITY.md #1).

Weight conversion: :func:`load_torchvision_weights` maps a torchvision
``resnet101`` state_dict (a local ``.pth``; this environment has no network
egress to download one) into this module's param tree.  Without pretrained
weights, ``init`` gives He-normal random init.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BLOCK_COUNTS = (3, 4, 23, 3)           # ResNet-101
WIDTHS = (64, 128, 256, 512)           # bottleneck mid widths; out = 4x


def _conv_init(rng, kh, kw, cin, cout):
    """He (kaiming) normal, fan_out, matching torchvision's resnet init."""
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, (kh, kw, cin, cout)) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _bn_stats_init(c):
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init(rng, block_counts: Optional[Tuple[int, ...]] = None
         ) -> Tuple[dict, dict]:
    """Returns (params, stats) pytrees.

    ``block_counts`` defaults to the module's ``BLOCK_COUNTS`` (ResNet-101)
    at CALL time (tests monkeypatch the module constant); ``apply`` walks
    the params structure, so a shallower stack (e.g. (1, 1, 1, 1) in the
    multichip dry-run, which validates the pixels->resize->CNN->refiner
    sharding path without ResNet-101's CPU cost) flows through unchanged.
    Output width stays 2048 either way (WIDTHS is fixed)."""
    if block_counts is None:
        block_counts = BLOCK_COUNTS
    rngs = iter(jax.random.split(rng, 512))
    params = {"conv1": _conv_init(next(rngs), 7, 7, 3, 64), "bn1": _bn_init(64)}
    stats = {"bn1": _bn_stats_init(64)}
    cin = 64
    for li, (count, width) in enumerate(zip(block_counts, WIDTHS), start=1):
        blocks, blocks_stats = [], []
        cout = width * 4
        for bi in range(count):
            b = {
                "conv1": _conv_init(next(rngs), 1, 1, cin, width),
                "bn1": _bn_init(width),
                "conv2": _conv_init(next(rngs), 3, 3, width, width),
                "bn2": _bn_init(width),
                "conv3": _conv_init(next(rngs), 1, 1, width, cout),
                "bn3": _bn_init(cout),
            }
            bs = {"bn1": _bn_stats_init(width), "bn2": _bn_stats_init(width),
                  "bn3": _bn_stats_init(cout)}
            if bi == 0:
                b["downsample_conv"] = _conv_init(next(rngs), 1, 1, cin, cout)
                b["downsample_bn"] = _bn_init(cout)
                bs["downsample_bn"] = _bn_stats_init(cout)
            blocks.append(b)
            blocks_stats.append(bs)
            cin = cout
        params["layer%d" % li] = blocks
        stats["layer%d" % li] = blocks_stats
    return params, stats


def _conv(x, w, stride=1, padding=None):
    # bf16 in/out; the MXU accumulates in f32 internally.  (An explicit
    # preferred_element_type=f32 breaks the conv transpose rule under
    # autodiff: the f32 cotangent meets the bf16 operand.)
    #
    # torch-parity note: padding is explicit symmetric (k-1)//2 per side —
    # torch Conv2d(padding=1) semantics.  XLA's "SAME" resolves stride-2
    # even-input 3x3 convs to (0,1) padding, which misaligns the residual
    # branch against the 1x1 downsample and silently changes every
    # downstream activation of converted torchvision weights.
    if padding is None:
        ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
        padding = [(ph, ph), (pw, pw)]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


BN_MOMENTUM = 0.1                      # torchvision BatchNorm2d default


def _bn(x, p, s, eps=1e-5, train=False):
    """Returns (out, new_stats).  Eval: running stats, new_stats = s.
    Train: batch stats (torch semantics — biased variance normalizes,
    unbiased updates the running var)."""
    if not train:
        scale = (p["scale"] * jax.lax.rsqrt(s["var"] + eps)).astype(x.dtype)
        bias = (p["bias"] - s["mean"] * p["scale"]
                * jax.lax.rsqrt(s["var"] + eps)).astype(x.dtype)
        return x * scale + bias, s
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean((xf - mean) ** 2, axis=axes)          # biased
    n = 1
    for a in axes:
        n *= x.shape[a]
    var_unbiased = var * (n / max(n - 1, 1))
    new_s = jax.lax.stop_gradient({
        "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * var_unbiased})
    inv = jax.lax.rsqrt(var + eps)
    out = ((xf - mean) * inv * p["scale"] + p["bias"]).astype(x.dtype)
    return out, new_s


def _bottleneck(x, p, s, stride, train=False):
    ns = {}
    out, ns["bn1"] = _bn(_conv(x, p["conv1"]), p["bn1"], s["bn1"],
                         train=train)
    out = jax.nn.relu(out)
    out, ns["bn2"] = _bn(_conv(out, p["conv2"], stride), p["bn2"], s["bn2"],
                         train=train)
    out = jax.nn.relu(out)
    out, ns["bn3"] = _bn(_conv(out, p["conv3"]), p["bn3"], s["bn3"],
                         train=train)
    if "downsample_conv" in p:
        x, ns["downsample_bn"] = _bn(_conv(x, p["downsample_conv"], stride),
                                     p["downsample_bn"], s["downsample_bn"],
                                     train=train)
    return jax.nn.relu(out + x), ns


def apply(params: dict, stats: dict, images: jnp.ndarray,
          dtype=jnp.bfloat16, train: bool = False):
    """images (B, 224, 224, 3) NHWC, normalized -> features (B, 7, 7, 2048).

    ``train=False`` returns the feature map; ``train=True`` returns
    ``(feature_map, new_stats)`` with the momentum-updated BN running
    statistics (callers thread them through ``model_state``)."""
    new_stats: dict = {}
    x = images.astype(dtype)
    x = _conv(x, params["conv1"], stride=2, padding=[(3, 3), (3, 3)])
    x, new_stats["bn1"] = _bn(x, params["bn1"], stats["bn1"], train=train)
    x = jax.nn.relu(x)
    # max-pool 3x3 stride 2; python -inf literal keeps the pattern JAX's
    # reduce-window-max autodiff rule recognizes
    x = jax.lax.reduce_window(x, float("-inf"), jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        stride = 1 if li == 1 else 2
        layer_stats = []
        for bi, (bp, bs) in enumerate(zip(params["layer%d" % li],
                                          stats["layer%d" % li])):
            x, ns = _bottleneck(x, bp, bs, stride if bi == 0 else 1,
                                train=train)
            layer_stats.append(ns)
        new_stats["layer%d" % li] = layer_stats
    return (x, new_stats) if train else x


def spatial_features(feat_map: jnp.ndarray, grid: int = 7) -> jnp.ndarray:
    """(B,H,W,C) -> (B, grid*grid, C) f32: adaptive average pool + flatten
    (reference BUTD_Model.py:32-37).  Output is f32 — the decoder runs f32
    during training; mixing the backbone's bf16 activations into the LSTM
    inputs costs accuracy and breaks dtype uniformity.

    Integer-ratio maps use true AdaptiveAvgPool2d bin averaging (reshape +
    mean); non-integer ratios fall back to bilinear resize (documented
    divergence from torch's variable-size bins — never hit at the standard
    224-input / grid-7 configuration)."""
    b, h, w, c = feat_map.shape
    feat_map = feat_map.astype(jnp.float32)
    if (h, w) != (grid, grid):
        if h % grid == 0 and w % grid == 0:
            feat_map = feat_map.reshape(b, grid, h // grid, grid,
                                        w // grid, c).mean(axis=(2, 4))
        else:
            feat_map = jax.image.resize(feat_map, (b, grid, grid, c),
                                        method="linear")
    return feat_map.reshape(b, grid * grid, c)


def global_pool(feat_map: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,C) global average pool (reference NIC_Model.py:34)."""
    return jnp.mean(feat_map.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision weight conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd) -> Tuple[dict, dict]:
    """Convert a torchvision-layout resnet101 state_dict (mapping of
    torch tensors or numpy arrays, keys like ``conv1.weight``,
    ``layer3.7.bn2.running_var``) into (params, stats) pytrees.

    OIHW conv kernels -> HWIO; BN weight/bias -> scale/bias; running
    mean/var -> stats.
    """
    import numpy as np

    def _np(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    def conv(name):
        return jnp.asarray(np.transpose(_np(sd[name]), (2, 3, 1, 0)))

    def bn(prefix):
        return ({"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
                 "bias": jnp.asarray(_np(sd[prefix + ".bias"]))},
                {"mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
                 "var": jnp.asarray(_np(sd[prefix + ".running_var"]))})

    params: dict = {"conv1": conv("conv1.weight")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for li, count in enumerate(BLOCK_COUNTS, start=1):
        blocks, blocks_stats = [], []
        for bi in range(count):
            pre = "layer%d.%d" % (li, bi)
            b, bs = {}, {}
            for ci in (1, 2, 3):
                b["conv%d" % ci] = conv("%s.conv%d.weight" % (pre, ci))
                b["bn%d" % ci], bs["bn%d" % ci] = bn("%s.bn%d" % (pre, ci))
            if ("%s.downsample.0.weight" % pre) in sd:
                b["downsample_conv"] = conv("%s.downsample.0.weight" % pre)
                b["downsample_bn"], bs["downsample_bn"] = bn(
                    "%s.downsample.1" % pre)
            blocks.append(b)
            blocks_stats.append(bs)
        params["layer%d" % li] = blocks
        stats["layer%d" % li] = blocks_stats
    return params, stats


def export_torch_state_dict(params: dict, stats: dict) -> dict:
    """Inverse of :func:`convert_torch_state_dict`: (params, stats) pytrees
    -> a torchvision-layout resnet101 state_dict of numpy arrays (HWIO conv
    kernels -> OIHW; scale/bias -> BN weight/bias; stats -> running mean/
    var, plus the ``num_batches_tracked`` counters torch's strict
    ``load_state_dict`` expects)."""
    import numpy as np

    sd: dict = {}

    def conv(name, w):
        sd[name + ".weight"] = np.transpose(np.asarray(w, np.float32),
                                            (3, 2, 0, 1))

    def bn(prefix, p, s):
        sd[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
        sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)
        sd[prefix + ".running_mean"] = np.asarray(s["mean"], np.float32)
        sd[prefix + ".running_var"] = np.asarray(s["var"], np.float32)
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    conv("conv1", params["conv1"])
    bn("bn1", params["bn1"], stats["bn1"])
    for li, count in enumerate(BLOCK_COUNTS, start=1):
        for bi in range(count):
            pre = "layer%d.%d" % (li, bi)
            b = params["layer%d" % li][bi]
            bs = stats["layer%d" % li][bi]
            for ci in (1, 2, 3):
                conv("%s.conv%d" % (pre, ci), b["conv%d" % ci])
                bn("%s.bn%d" % (pre, ci), b["bn%d" % ci], bs["bn%d" % ci])
            if "downsample_conv" in b:
                conv("%s.downsample.0" % pre, b["downsample_conv"])
                bn("%s.downsample.1" % pre, b["downsample_bn"],
                   bs["downsample_bn"])
    return sd


def load_torchvision_weights(path: str) -> Tuple[dict, dict]:
    """Load a torchvision resnet101 state_dict ``.pth`` and convert it
    (see :func:`convert_torch_state_dict`)."""
    import torch  # cpu-only torch is available in this environment

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torch_state_dict(sd)
