"""Device-side image preprocessing.

The reference normalizes on the host inside torchvision transforms
(Utils.py get_transform: Resize(224) + ToTensor + Normalize, with
RandomHorizontalFlip for training).  TPU-first split: the host does JPEG
decode + resize (and the train-time random horizontal flip — a free array
reversal during assembly, data/datasets.py) and ships **uint8** NHWC
batches (4x less host->device bandwidth than f32); scaling to [0,1] and
ImageNet normalization run on device, where they melt into the ResNet's
first conv.

Fast ingest mode goes further: the host stops at a DCT-domain scaled
JPEG decode (native/image_loader.cpp sicz_decode_jpeg_scaled — 1/2..1/8
IDCT, no host resample at all) and ships the small image top-left in a
static (pad, pad, 3) uint8 box plus its true (h, w); ``resize_normalize``
below finishes the transform ON DEVICE as two weight matmuls (separable
triangle resample — the MXU eats it) fused with the normalization.  That
is the "decode/resize/normalize span host-min + device" split the north
star asks for (BASELINE.md).
"""
from __future__ import annotations

import jax.numpy as jnp

# torchvision ImageNet constants (reference Utils.py get_transform)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 (or float in [0,255]) NHWC -> normalized float32 NHWC."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def maybe_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Models accept either raw uint8 batches (normalized here, on device)
    or already-normalized float batches (e.g. tests, converted pipelines)."""
    if images.dtype == jnp.uint8:
        return normalize(images)
    return images


def _axis_weights(in_size: jnp.ndarray, out_size: int, pad: int
                  ) -> jnp.ndarray:
    """(out_size, pad) float32 triangle-resample weights for one axis, for a
    source whose true extent ``in_size`` (traced int32 scalar) sits in a
    static ``pad`` box.

    Same sampling as Pillow's BILINEAR precompute_coeffs (Resample.c):
    center (j+0.5)*scale, support = filterscale = max(scale, 1), window
    [int(center-support+0.5), int(center+support+0.5)) clipped to the true
    extent, weights normalized over the window.  Columns beyond the window
    (including everything past in_size — the pad garbage) get weight
    exactly 0, so the pad box never needs host-side zeroing.  Float
    weights (not Pillow's 8.22 fixed point): this feeds the fast ingest
    mode, whose pixels already differ from the parity path upstream."""
    in_f = in_size.astype(jnp.float32)
    scale = in_f / out_size
    filterscale = jnp.maximum(scale, 1.0)
    j = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    i = jnp.arange(pad, dtype=jnp.float32)[None, :]
    center = (j + 0.5) * scale
    # int() truncation in Pillow == floor for these non-negative bounds
    lo = jnp.maximum(jnp.floor(center - filterscale + 0.5), 0.0)
    hi = jnp.minimum(jnp.floor(center + filterscale + 0.5), in_f)
    w = jnp.maximum(1.0 - jnp.abs(i + 0.5 - center) / filterscale, 0.0)
    w = jnp.where((i >= lo) & (i < hi), w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def resize_normalize(padded: jnp.ndarray, hw: jnp.ndarray,
                     out_size: int) -> jnp.ndarray:
    """Batched device-side resize + normalize for fast-ingest batches.

    padded: (B, pad, pad, 3) uint8, each image's DCT-scaled decode top-left
    (rest of the box is DON'T-CARE — masked by zero weights, see
    ``_axis_weights``); hw: (B, 2) int32 true (h, w).  Returns normalized
    float32 (B, out_size, out_size, 3).

    The separable triangle resample is two matmuls with weight matrices
    computed on the fly from the dynamic extents — (out, pad) @ (pad, pad)
    per axis rides the MXU; at batch 64 / pad 512 it is ~37 GFLOP, <1% of
    a from-pixels train step.  Fuses into ``normalize`` (and from there
    into the ResNet stem conv) under jit."""
    import jax

    x = padded.astype(jnp.float32)

    def one(img, h, w):
        v = _axis_weights(h, out_size, img.shape[0])     # (out, pad) rows
        u = _axis_weights(w, out_size, img.shape[1])     # (out, pad) cols
        tmp = jnp.einsum("op,pqc->oqc", v, img)
        return jnp.einsum("wq,oqc->owc", u, tmp)

    out = jax.vmap(one)(x, hw[:, 0], hw[:, 1])
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (out / 255.0 - mean) / std


def prepare_images(visual: dict, out_size: int = 224) -> jnp.ndarray:
    """The single image-input entry point for from-pixels models: a plain
    batch (parity/fast ingest, already (B, S, S, 3)) is normalized on
    device; a fast-ingest padded batch (``img_hw`` present) is triangle-
    resampled to ``out_size`` and normalized, all on device."""
    if "img_hw" in visual:
        return resize_normalize(visual["img_tensors"], visual["img_hw"],
                                out_size)
    return maybe_normalize(visual["img_tensors"])
