"""Device-side image preprocessing.

The reference normalizes on the host inside torchvision transforms
(Utils.py get_transform: Resize(224) + ToTensor + Normalize, with
RandomHorizontalFlip for training).  TPU-first split: the host does JPEG
decode + resize (and the train-time random horizontal flip — a free array
reversal during assembly, data/datasets.py) and ships **uint8** NHWC
batches (4x less host->device bandwidth than f32); scaling to [0,1] and
ImageNet normalization run on device, where they melt into the ResNet's
first conv.
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
