"""Fast ingest path: DCT-scaled JPEG decode (native) + device-side
triangle-resample-and-normalize kernel (ops/image.resize_normalize).

The device kernel reproduces Pillow's BILINEAR sampling geometry in float
(same centers, same window, same normalization — minus Pillow's 8.22
fixed-point quantization and its uint8 rounding between the two passes),
so outputs match PIL within a few 8-bit LSB.  The pad box's don't-care
region must be provably dead: garbage there cannot change a single output
bit (weights beyond the true extent are exactly zero).

Reference transform being replaced: Utils.py get_transform (Resize(224) +
ToTensor + Normalize) as consumed by Datasets.py:42-46.
"""
import io
import os

import numpy as np
import pytest

import jax.numpy as jnp

from simpleimagecaptionzoo_tpu.data import _native_image
from simpleimagecaptionzoo_tpu.ops.image import (IMAGENET_MEAN, IMAGENET_STD,
                                                 normalize, prepare_images,
                                                 resize_normalize,
                                                 _axis_weights)


def _denorm(x):
    """normalized float -> 0..255 float for LSB-scale comparisons."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (np.asarray(x) * std + mean) * 255.0


def _pil_resize_norm(img, size):
    from PIL import Image
    r = np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR),
                   np.uint8)
    return _denorm(normalize(jnp.asarray(r)))


def _device_resize(img, size, pad=512, garbage=0):
    h, w = img.shape[:2]
    box = np.full((pad, pad, 3), garbage, np.uint8)
    box[:h, :w] = img
    out = resize_normalize(jnp.asarray(box)[None],
                           jnp.asarray([[h, w]], jnp.int32), size)
    return _denorm(out[0])


def test_axis_weights_identity():
    w = np.asarray(_axis_weights(jnp.int32(224), 224, 512))
    np.testing.assert_allclose(w[:, :224], np.eye(224), atol=1e-6)
    assert np.all(w[:, 224:] == 0.0)


def test_axis_weights_rows_normalized_and_windowed():
    for in_size in (37, 224, 240, 333, 512):
        w = np.asarray(_axis_weights(jnp.int32(in_size), 224, 512))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
        assert np.all(w[:, in_size:] == 0.0), in_size


@pytest.mark.parametrize("h,w", [
    (240, 320),      # the typical DCT-scaled COCO decode
    (256, 256),      # square, mild downscale
    (135, 240),      # upscale one axis, downscale implied none
    (100, 100),      # pure upscale
    (448, 331),      # strong downscale, awkward ratio
])
def test_device_resize_matches_pil(h, w):
    rng = np.random.default_rng(h * 7 + w)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    ours = _device_resize(img, 224)
    ref = _pil_resize_norm(img, 224)
    diff = np.abs(ours - ref)
    # float vs Pillow's fixed-point + inter-pass uint8 rounding: a few LSB
    assert diff.max() <= 3.0, diff.max()
    assert diff.mean() <= 0.6, diff.mean()


def test_pad_garbage_cannot_leak():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)
    a = _device_resize(img, 224, garbage=0)
    b = _device_resize(img, 224, garbage=255)
    np.testing.assert_array_equal(a, b)


def test_identity_embed_matches_plain_normalize():
    # host-fallback images land in the box already at (size, size); the
    # kernel's identity weights must reproduce plain normalization exactly
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (224, 224, 3), np.uint8)
    via_kernel = _device_resize(img, 224)
    plain = _denorm(normalize(jnp.asarray(img)))
    np.testing.assert_allclose(via_kernel, plain, atol=1e-3)


def test_prepare_images_dispatch():
    rng = np.random.default_rng(2)
    plain = rng.integers(0, 256, (2, 224, 224, 3), np.uint8)
    out = prepare_images({"img_tensors": jnp.asarray(plain)})
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(normalize(jnp.asarray(plain))))
    box = np.zeros((2, 512, 512, 3), np.uint8)
    box[:, :240, :320] = rng.integers(0, 256, (2, 240, 320, 3), np.uint8)
    hw = jnp.asarray([[240, 320], [240, 320]], jnp.int32)
    out2 = prepare_images({"img_tensors": jnp.asarray(box), "img_hw": hw})
    assert out2.shape == (2, 224, 224, 3)
    assert out2.dtype == jnp.float32


# ---------------------------------------------------------------------------
# native scaled decode (gated on the built library)
# ---------------------------------------------------------------------------

native = pytest.mark.skipif(not _native_image.available(),
                            reason="native image library not built")


def _photo_jpeg(h=480, w=640, quality=90):
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.float32)
    for _ in range(3):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0) +
               np.roll(img, 1, 1) + np.roll(img, -1, 1) + img) / 5
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = img[..., 0] * 0.3 + (xx / w * 200)
    img[..., 1] = img[..., 1] * 0.3 + (yy / h * 200)
    img = np.clip(img, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@native
def test_scaled_decode_dims_and_box():
    data = _photo_jpeg(480, 640)
    got = _native_image.decode_jpeg_scaled(data, 224, 512)
    assert got is not None
    arr, h, w = got
    assert (h, w) == (240, 320)          # 1/2 DCT-domain decode
    assert arr.shape == (512, 512, 3)


@native
def test_scaled_decode_small_image_not_upscaled():
    data = _photo_jpeg(160, 200)
    arr, h, w = _native_image.decode_jpeg_scaled(data, 224, 512)
    assert (h, w) == (160, 200)          # denom stays 1; device upsamples


@native
def test_scaled_decode_extreme_aspect_falls_back():
    # 2000x200: denom pushed to keep the long side within the box, then
    # min-dim < requested is fine; only a >8x long side refuses (None)
    data = _photo_jpeg(200, 2000)
    got = _native_image.decode_jpeg_scaled(data, 224, 512)
    if got is not None:
        arr, h, w = got
        assert w <= 512 and h <= 512
    data = _photo_jpeg(100, 4700)
    assert _native_image.decode_jpeg_scaled(data, 224, 512) is None


@native
def test_fast_resize_close_to_parity():
    import tempfile
    data = _photo_jpeg()
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        parity = _native_image.decode_jpeg_resize(path, 224)
        fast = _native_image.decode_jpeg_resize_fast(path, 224)
        assert fast is not None
        d = np.abs(parity.astype(int) - fast.astype(int))
        # the 1/2 IDCT is a low-passed version of the full decode; on
        # photo-like content the downstream 224 resample nearly equalizes
        assert d.mean() < 2.0, d.mean()
    finally:
        os.unlink(path)


@native
def test_device_path_end_to_end_close_to_parity_transform():
    """scaled decode -> device resize+normalize vs the full parity
    transform (full decode + PIL-parity resample + normalize)."""
    import tempfile
    data = _photo_jpeg()
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        from simpleimagecaptionzoo_tpu.data.datasets import (
            load_image_scaled, load_image_uint8)
        box, (h, w) = load_image_scaled(path, 224)
        dev = _denorm(resize_normalize(
            jnp.asarray(box)[None], jnp.asarray([[h, w]], jnp.int32), 224)[0])
        par = _denorm(normalize(jnp.asarray(load_image_uint8(path, 224))))
        assert np.abs(dev - par).mean() < 2.5
    finally:
        os.unlink(path)


def test_visual_source_device_mode_flip(tmp_path):
    """device-ingest items carry img_hw; flip reverses only the valid
    region (parity with the plain path's whole-image flip after resize is
    approximate by design; what must hold exactly: flip(flip(x)) == x and
    the flipped box equals the reversed valid region)."""
    from PIL import Image
    from simpleimagecaptionzoo_tpu.data.datasets import _VisualSource
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    vs = _VisualSource("Flickr8K", str(tmp_path), True, None,
                       img_size=64, ingest="device")
    entry = {"file_name": "x.jpg", "id": 0}
    a = vs.item(entry, "train", False)
    b = vs.item(entry, "train", True)
    assert "img_hw" in a and a["img_tensors"].shape[2] == 3
    h, w = a["img_hw"]
    np.testing.assert_array_equal(b["img_tensors"][:h, :w],
                                  a["img_tensors"][:h, w - 1::-1])


@native
def test_scaled_decode_ceil_guard_no_overflow():
    """libjpeg rounds scaled output dims UP (jdiv_round_up); the fit guard
    must too.  4097 wide at denom 8 floor-divides to exactly 512 but
    decodes to 513 columns — before the ceil fix that overran the caller's
    (pad, pad, 3) buffer (heap corruption).  4096 must still fit exactly."""
    over = _photo_jpeg(64, 4097)
    assert _native_image.decode_jpeg_scaled(over, 224, 512) is None
    exact = _photo_jpeg(64, 4096)
    got = _native_image.decode_jpeg_scaled(exact, 224, 512)
    assert got is not None
    arr, h, w = got
    assert (h, w) == (8, 512) and arr.shape == (512, 512, 3)


def test_load_image_scaled_img_size_above_default_pad(tmp_path):
    """img_size > INGEST_PAD (512) must scale the pad box, not crash: the
    C decoder requires pad >= min_size and the host fallback writes a
    (size, size) image into the box."""
    from PIL import Image
    from simpleimagecaptionzoo_tpu.data.datasets import (ingest_pad,
                                                         load_image_scaled)
    assert ingest_pad(224) == 512          # default unchanged
    assert ingest_pad(640) == 1280
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    # non-JPEG forces the host fallback branch regardless of native build
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    box, (h, w) = load_image_scaled(str(p), 640)
    assert box.shape == (1280, 1280, 3)
    assert (h, w) == (640, 640)
    # JPEG goes through the native scaled decode when built
    pj = tmp_path / "x.jpg"
    Image.fromarray(img).save(pj, quality=95)
    box, (h, w) = load_image_scaled(str(pj), 640)
    assert box.shape == (1280, 1280, 3)
    assert h <= 1280 and w <= 1280
    np.testing.assert_array_equal(box.shape[:2], (1280, 1280))


def test_visual_source_device_mode_partial_packed_shard(tmp_path):
    """A packed shard that covers only part of the split must still yield
    HOMOGENEOUS device-ingest items: the covered image ships in the same
    (pad, pad, 3) + img_hw format as live decodes (identity device weights
    reproduce the packed pixels bit-exactly), so _stack_visuals works."""
    from PIL import Image
    from simpleimagecaptionzoo_tpu.data.datasets import (_VisualSource,
                                                         _stack_visuals)
    rng = np.random.default_rng(7)
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(rng.integers(0, 256, (96, 128, 3), np.uint8)).save(
            tmp_path / name, quality=95)
    vs = _VisualSource("Flickr8K", str(tmp_path), True, None,
                       img_size=64, ingest="device")
    packed_row = rng.integers(0, 256, (64, 64, 3), np.uint8)
    vs._packed_imgs = packed_row[None]     # shard covers only a.jpg
    vs._img_row = {"a.jpg": 0}
    items = vs.items([{"file_name": "a.jpg", "id": 0},
                      {"file_name": "b.jpg", "id": 1}],
                     "train", [False, False])
    batch = _stack_visuals(items)          # must not raise
    assert batch["img_tensors"].shape[0] == 2
    assert batch["img_tensors"].shape[1] == batch["img_tensors"].shape[2]
    a, b = items
    assert a["img_tensors"].shape == b["img_tensors"].shape
    h, w = a["img_hw"]
    assert (h, w) == (64, 64)
    np.testing.assert_array_equal(a["img_tensors"][:64, :64], packed_row)


def test_resize_normalize_handles_scaled_pad_box(tmp_path):
    """The device kernel must work at ingest_pad(size) boxes other than
    the default 512: a fallback-placed (640, 640) image in a 1280 box
    goes through identity weights and must reproduce the parity transform
    bit-exactly."""
    from PIL import Image
    from simpleimagecaptionzoo_tpu.data.datasets import (load_image_scaled,
                                                         load_image_uint8)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    p = tmp_path / "x.png"                 # non-JPEG -> host fallback
    Image.fromarray(img).save(p)
    box, (h, w) = load_image_scaled(str(p), 640)
    dev = resize_normalize(jnp.asarray(box)[None],
                           jnp.asarray([[h, w]], jnp.int32), 640)[0]
    par = normalize(jnp.asarray(load_image_uint8(str(p), 640)))
    np.testing.assert_allclose(np.asarray(dev), np.asarray(par),
                               rtol=0, atol=1e-6)
