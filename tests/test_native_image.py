"""Native JPEG loader (native/image_loader.cpp via data/_native_image.py).

The resize stage must be BYTE-IDENTICAL to PIL's BILINEAR resample (it is
a reimplementation of Pillow's fixed-point triangle filter and the PIL
path is the parity reference for preprocessing).  The decode stage may
differ from PIL by IDCT implementation details across libjpeg builds, so
the end-to-end check uses a tight-but-nonzero tolerance.
"""
import io
import os

import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.data import _native_image
from simpleimagecaptionzoo_tpu.data.datasets import load_image_uint8

pytestmark = pytest.mark.skipif(
    not _native_image.available(),
    reason="native image library not built (make -C native)")


def _pil_resize(img, out_w, out_h):
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((out_w, out_h),
                                                  Image.BILINEAR), np.uint8)


@pytest.mark.parametrize("h,w,oh,ow", [
    (480, 640, 224, 224),     # downscale, non-square source
    (100, 100, 224, 224),     # upscale
    (224, 224, 224, 224),     # identity-size (still filtered)
    (37, 53, 224, 224),       # awkward ratios
    (500, 375, 64, 96),       # rectangular output
])
def test_resize_byte_identical_to_pil(h, w, oh, ow):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ours = _native_image.resize_rgb8(img, oh, ow)
    ref = _pil_resize(img, ow, oh)
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


def _jpeg_bytes(img, quality=90):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("mode", ["RGB", "L"])
def test_decode_resize_matches_pil_pipeline(tmp_path, mode):
    from PIL import Image
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(300, 400, 3), dtype=np.uint8)
    # smooth it so JPEG ringing doesn't amplify IDCT differences
    base = (base.astype(np.int32) + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, 2, 0)).astype(np.uint8)
    im = Image.fromarray(base).convert(mode)
    p = str(tmp_path / "img.jpg")
    im.save(p, "JPEG", quality=92)

    native = _native_image.decode_jpeg_resize(p, 224)
    assert native is not None and native.shape == (224, 224, 3)
    with Image.open(p) as ref_im:
        ref = np.asarray(ref_im.convert("RGB").resize((224, 224),
                                                      Image.BILINEAR))
    diff = np.abs(native.astype(np.int32) - ref.astype(np.int32))
    # decode differences across libjpeg builds are at most a few counts on
    # a few pixels; the resize stage itself is byte-exact (test above)
    assert diff.mean() < 0.6, diff.mean()
    assert np.quantile(diff, 0.99) <= 3, np.quantile(diff, 0.99)


def test_decode_jpeg_resize_bytes_matches_path_api(tmp_path):
    """The serving surface decodes uploads from memory through
    decode_jpeg_resize_bytes; it must produce exactly what the path API
    produces for the same stream, and refuse non-JPEG bytes."""
    from PIL import Image
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(120, 90, 3), dtype=np.uint8)
    p = str(tmp_path / "b.jpg")
    Image.fromarray(img).save(p, "JPEG", quality=88)
    with open(p, "rb") as f:
        data = f.read()
    via_path = _native_image.decode_jpeg_resize(p, 64)
    via_bytes = _native_image.decode_jpeg_resize_bytes(data, 64)
    assert via_path is not None and via_bytes is not None
    np.testing.assert_array_equal(via_bytes, via_path)
    assert _native_image.decode_jpeg_resize_bytes(b"PNG no", 64) is None
    assert _native_image.decode_jpeg_resize_bytes(b"\xff\xd8junk", 64) is None


def test_load_image_uint8_uses_native_and_falls_back(tmp_path, monkeypatch):
    from PIL import Image
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    jp = str(tmp_path / "a.jpg")
    pp = str(tmp_path / "a.png")
    Image.fromarray(img).save(jp, "JPEG", quality=95)
    Image.fromarray(img).save(pp, "PNG")
    out_j = load_image_uint8(jp, 32)
    out_p = load_image_uint8(pp, 32)      # PNG -> PIL path
    assert out_j.shape == out_p.shape == (32, 32, 3)
    # corrupt jpeg: native refuses, PIL raises -> caller sees PIL's error
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8garbage")
    assert _native_image.decode_jpeg_resize(bad, 32) is None


def test_cmyk_falls_back_to_pil(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(40, 40, 4), dtype=np.uint8)
    p = str(tmp_path / "cmyk.jpg")
    Image.fromarray(img, mode="CMYK").save(p, "JPEG")
    assert _native_image.decode_jpeg_resize(p, 32) is None   # native refuses
    out = load_image_uint8(p, 32)                            # PIL handles it
    assert out.shape == (32, 32, 3)
