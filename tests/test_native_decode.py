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


def test_half_case_rounding_matches_python_round():
    """449x448 @ 224: the resized long side is exactly 224.5 — torchvision's
    executed truncation gives 224 while lround gives 225 and a 1px crop
    shift (the center crop itself still rounds half-to-even). High-contrast
    stripes make a shift show up as a huge diff."""
    w, h, target = 449, 448, 224
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, ::2] = 255  # vertical 1px stripes
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    jpeg = buf.getvalue()
    ours = decode_resize_crop(jpeg, target)
    assert ours is not None
    ref = _pil_reference(jpeg, target)
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 30.0, (
        f"mean abs diff {diff.mean():.2f} — crop-window rounding diverged"
    )


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


# ----------------------------------------------------------------------
# train-path: decode + RandomResizedCrop window + flip (round 2)
# ----------------------------------------------------------------------

def test_jpeg_dims():
    from clip_gp_tpu.native import jpeg_dims

    assert jpeg_dims(_jpeg_bytes(320, 240)) == (320, 240)
    assert jpeg_dims(b"nope") is None


@pytest.mark.parametrize("flip", [False, True])
def test_decode_rrc_matches_pil_crop_resize(flip):
    from clip_gp_tpu.native import decode_rrc

    jpeg = _jpeg_bytes(400, 300, seed=3)
    box = (37, 22, 260, 211)  # x, y, w, h
    target = 224
    ours = decode_rrc(jpeg, box, target, flip)
    assert ours is not None and ours.shape == (target, target, 3)

    img = Image.open(io.BytesIO(jpeg)).convert("RGB")
    x, y, w, h = box
    ref = img.crop((x, y, x + w, y + h)).resize((target, target),
                                                Image.BICUBIC)
    if flip:
        ref = ref.transpose(Image.FLIP_LEFT_RIGHT)
    ref = np.asarray(ref, dtype=np.uint8)
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 4.0, f"mean abs diff {diff.mean():.2f}"


def test_decode_rrc_dct_scaled_large_crop():
    from clip_gp_tpu.native import decode_rrc

    jpeg = _jpeg_bytes(2000, 1500, seed=5)
    box = (100.0, 80.0, 1600.0, 1200.0)  # big crop -> DCT-scaled decode
    ours = decode_rrc(jpeg, box, 224, False)
    assert ours is not None
    img = Image.open(io.BytesIO(jpeg)).convert("RGB")
    x, y, w, h = box
    ref = np.asarray(
        img.crop((int(x), int(y), int(x + w), int(y + h))).resize(
            (224, 224), Image.BICUBIC),
        dtype=np.uint8,
    )
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 6.0


def test_pipeline_native_train_path_rng_parity(tmp_path, monkeypatch):
    """The native train path and the PIL path must consume the identical RNG
    stream (same crop window, same flip draw) and produce close pixels."""
    import random as pyrandom

    import clip_gp_tpu.data.pipeline as pipeline
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.data.datum import Datum
    from clip_gp_tpu.data.transforms import build_transform

    path = tmp_path / "img.jpg"
    path.write_bytes(_jpeg_bytes(400, 300, seed=7))
    item = Datum(impath=str(path), label=0, classname="x")

    c = Config()
    c.input.size = (224, 224)
    c.input.interpolation = "bicubic"
    c.input.transforms = ["random_resized_crop", "random_flip", "normalize"]
    tfm = build_transform(c, is_train=True)
    assert getattr(tfm, "native_rrc", None) == {"target": 224, "flip": True}

    monkeypatch.setattr(pipeline, "_USE_NATIVE", False)
    rng_pil = pyrandom.Random(123)
    out_pil = pipeline._load_one(item, tfm, rng_pil)

    monkeypatch.setattr(pipeline, "_USE_NATIVE", True)
    rng_nat = pyrandom.Random(123)
    out_nat = pipeline._load_one(item, tfm, rng_nat)

    # identical draws consumed -> subsequent values from both rngs agree
    assert rng_pil.random() == rng_nat.random()
    assert out_pil.shape == out_nat.shape == (224, 224, 3)
    diff = np.abs(out_pil.astype(np.int16) - out_nat.astype(np.int16))
    assert float(diff.mean()) < 4.0, f"mean abs diff {diff.mean():.2f}"


def test_partial_decode_bit_identical_to_full():
    """The windowed (jpeg_crop_scanline/jpeg_skip_scanlines) train-path
    decode must be BIT-identical to the full decode: tap centers/weights are
    computed in full-image coordinates and the decode window carries the
    filter support plus an iMCU of slack, so neither float arithmetic nor
    crop-boundary pixels can differ. Covers interior, corner, and
    full-image boxes over 4:2:0-subsampled JPEGs."""
    import io

    import numpy as np
    from PIL import Image

    from clip_gp_tpu.native import loader

    if not loader.native_available():
        import pytest

        pytest.skip("native decoder unavailable")
    if not loader.partial_decode_supported():
        import pytest

        pytest.skip(
            "libjpeg-turbo partial-decompression symbols absent — the "
            "windowed path never engages, so parity would be vacuous"
        )

    rng = np.random.default_rng(7)
    try:
        for w, h in [(500, 375), (97, 211), (640, 480)]:
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack([
                ((xx * xx + yy) % 256).astype(np.uint8),
                (yy % 256).astype(np.uint8),
                ((xx + yy) % 256).astype(np.uint8),
            ], -1)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=85)
            jb = buf.getvalue()
            boxes = [(0.0, 0.0, float(w), float(h)),       # full image
                     (0.0, 0.0, w * 0.4, h * 0.4),          # top-left corner
                     (w * 0.6, h * 0.6, w * 0.4, h * 0.4)]  # bottom-right
            for _ in range(6):                              # interior
                bw = float(rng.uniform(0.2, 0.9) * w)
                bh = float(rng.uniform(0.2, 0.9) * h)
                boxes.append((float(rng.uniform(0, w - bw)),
                              float(rng.uniform(0, h - bh)), bw, bh))
            for flip in (False, True):
                for box in boxes:
                    loader.set_partial_decode(True)
                    a = loader.decode_rrc(jb, box, 224, flip)
                    loader.set_partial_decode(False)
                    b = loader.decode_rrc(jb, box, 224, flip)
                    assert a is not None and b is not None
                    assert np.array_equal(a, b), (w, h, box, flip)
    finally:
        loader.set_partial_decode(True)


def test_degenerate_aspect_ratio_refused_not_bad_alloc():
    """A valid 16000x2 JPEG would need a ~1.2 GB resize buffer (224*16000/2
    wide); the native path must refuse with nonzero (PIL fallback) instead
    of letting std::bad_alloc cross the ctypes boundary and abort the
    process (found in review, 2026-08-18)."""
    img = np.zeros((2, 16000, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=50)
    assert decode_resize_crop(buf.getvalue(), 224) is None
