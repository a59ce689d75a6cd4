"""Native fused JPEG decode/resize/crop vs the PIL reference path."""

import io

import numpy as np
import pytest
from PIL import Image

from clip_gp_tpu.native import decode_resize_crop, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain/libjpeg unavailable"
)


def _jpeg_bytes(w, h, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth image (noise compresses badly and amplifies codec differences)
    x = rng.normal(size=(h // 8 + 1, w // 8 + 1, 3))
    img = np.kron(x, np.ones((8, 8, 1)))[:h, :w]
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_reference(jpeg, target):
    from clip_gp_tpu.data.transforms import center_crop, resize_shortest

    img = Image.open(io.BytesIO(jpeg)).convert("RGB")
    img = resize_shortest(img, target, Image.BICUBIC)
    img = center_crop(img, (target, target))
    return np.asarray(img, dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(320, 240), (240, 320), (500, 375), (224, 224)])
def test_matches_pil_within_tolerance(w, h):
    jpeg = _jpeg_bytes(w, h)
    target = 224
    ours = decode_resize_crop(jpeg, target)
    assert ours is not None
    assert ours.shape == (target, target, 3)
    ref = _pil_reference(jpeg, target)
    # different-but-equivalent bicubic implementations (and possibly different
    # DCT scaling paths): demand close agreement, not bit equality
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 4.0, f"mean abs diff {diff.mean():.2f}"


def test_large_image_dct_scaling_path():
    jpeg = _jpeg_bytes(2000, 1500)
    out = decode_resize_crop(jpeg, 224)
    assert out is not None
    ref = _pil_reference(jpeg, 224)
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 6.0


def test_invalid_data_returns_none():
    assert decode_resize_crop(b"not a jpeg", 224) is None


def test_throughput_not_slower_than_pil():
    import time

    jpeg = _jpeg_bytes(1600, 1200, quality=90)
    decode_resize_crop(jpeg, 224)  # warm
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        decode_resize_crop(jpeg, 224)
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        _pil_reference(jpeg, 224)
    pil_dt = time.perf_counter() - t0
    print(f"native {n / native_dt:.1f} imgs/s vs PIL {n / pil_dt:.1f} imgs/s")
    assert native_dt < pil_dt * 1.5  # at minimum competitive
