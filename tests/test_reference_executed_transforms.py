"""Executed-reference transform & data-manager goldens.

The reference's preprocessing stack (utils/transforms.py,
utils/data_manager.py, clip/clip.py:_transform) had never RUN here because
torchvision is not installed.  tests/_torchvision_shim.py implements the
exact transform surface those files touch with torchvision's PIL-backend
semantics, so the reference composition code executes unmodified and its
output tensors are compared numerically against this framework's pipeline
(host uint8 transform + on-device normalize).

What is pinned by execution:
- the eval preprocessing path, image-for-image, across aspect ratios and
  interpolation modes (the path every real-weight accuracy number flows
  through; ref: utils/transforms.py:67-97)
- the train composition branches per config.input.transforms list,
  including the "normalize"-missing plain-ToTensor quirk and the unknown
  interpolation -> BILINEAR fallback (ref: utils/transforms.py:20-64,100-109)
- RandomResizedCrop geometry: our crop-then-resize equals the
  reference's crop-then-resize for identical windows, and the 10-rejection
  fallback box matches torchvision's clamped central crop
  (ref: utils/transforms.py:28-35)
- SimpleDataManager end to end on a fixture tree: printed info block,
  loader lengths/drop_last semantics, and batch-for-batch numeric equality
  of the test loader against our BatchLoader (ref: utils/data_manager.py)
- clip/clip.py:_transform (ref: clip/clip.py:67-75)
"""

from __future__ import annotations

import importlib
import io
import os
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import torch
from PIL import Image

from _reference_harness import reference_env
from _torchvision_shim import (
    CenterCrop as ShimCenterCrop,
    InterpolationMode,
    RandomHorizontalFlip as ShimFlip,
    RandomResizedCrop as ShimRRC,
    Resize as ShimResize,
)

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.data import transforms as our_tfm

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# fixtures: non-trivial JPEG content at assorted sizes
# ---------------------------------------------------------------------------

def _jpeg_image(width, height, seed=0):
    """Gradient+noise content round-tripped through JPEG so both pipelines
    consume identical decoded pixels."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    base = np.stack(
        [
            (xx * 255 / max(width - 1, 1)),
            (yy * 255 / max(height - 1, 1)),
            ((xx + yy) * 255 / max(width + height - 2, 1)),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 24, size=(height, width, 3))
    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=88)
    buf.seek(0)
    return Image.open(buf).convert("RGB")


def _ref_input_cfg(size=(224, 224), interpolation="bicubic",
                   transforms=("random_resized_crop", "random_flip", "normalize")):
    return SimpleNamespace(
        input=SimpleNamespace(
            size=size,
            interpolation=interpolation,
            pixel_mean=list(our_tfm.CLIP_MEAN),
            pixel_std=list(our_tfm.CLIP_STD),
            transforms=list(transforms),
        )
    )


def _our_cfg(size=(224, 224), interpolation="bicubic",
             transforms=("random_resized_crop", "random_flip", "normalize")):
    c = Config()
    c.input.size = tuple(size)
    c.input.interpolation = interpolation
    c.input.transforms = list(transforms)
    return c


def _our_float(u8_hwc):
    """uint8 HWC -> normalized float CHW via the on-device half of our path."""
    import jax.numpy as jnp

    out = np.asarray(our_tfm.device_preprocess(jnp.asarray(u8_hwc[None])))[0]
    return out.transpose(2, 0, 1)


@pytest.fixture(scope="module")
def tfm_env():
    with reference_env(trainer_modules=(), functional_transforms=True) as env:
        env.transforms = importlib.import_module("utils.transforms")
        env.data_manager = importlib.import_module("utils.data_manager")
        yield env


SIZES = [(500, 375), (375, 500), (87, 123), (224, 224), (640, 480),
         (225, 224), (100, 310), (224, 650)]


# ---------------------------------------------------------------------------
# eval path: numeric parity image-for-image
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("interpolation", ["bicubic", "bilinear", "nearest",
                                           "lanczos-unknown"])
def test_eval_transform_numeric_parity(tfm_env, interpolation):
    """Reference test pipeline (executed) vs our host-uint8 + device-normalize
    eval path; exact at the uint8 stage, 1e-6 after normalization. The
    'lanczos-unknown' row pins the unknown-mode -> BILINEAR fallback on both
    sides (ref: utils/transforms.py:100-109)."""
    ref_pipeline = tfm_env.transforms.build_transform(
        _ref_input_cfg(interpolation=interpolation), is_train=False
    )
    ours = our_tfm.build_transform(_our_cfg(interpolation=interpolation),
                                   is_train=False)
    for i, (w, h) in enumerate(SIZES):
        img = _jpeg_image(w, h, seed=i)
        ref_out = ref_pipeline(img.copy())
        assert tuple(ref_out.shape) == (3, 224, 224)
        u8 = ours(img.copy())
        assert u8.dtype == np.uint8 and u8.shape == (224, 224, 3)
        # uint8 stage must be exact: same PIL resample + crop window
        ref_u8 = np.array(
            ShimCenterCrop((224, 224))(
                ShimResize(
                    224,
                    interpolation=tfm_env.transforms._get_interpolation(
                        interpolation
                    ),
                )(img.copy())
            )
        )
        np.testing.assert_array_equal(u8, ref_u8, err_msg=f"size {(w, h)}")
        np.testing.assert_allclose(
            _our_float(u8), ref_out.numpy(), atol=1e-6,
            err_msg=f"size {(w, h)}",
        )


def test_eval_transform_tuple_size_uses_first_element(tfm_env):
    """Non-square config.input.size: the reference resizes the short side to
    size[0] then center-crops to the tuple (ref: utils/transforms.py:71-86)."""
    cfg = _ref_input_cfg(size=(64, 96))
    ref_pipeline = tfm_env.transforms.build_transform(cfg, is_train=False)
    img = _jpeg_image(300, 200, seed=41)
    ref_out = ref_pipeline(img.copy())
    assert tuple(ref_out.shape) == (3, 64, 96)
    u8 = our_tfm.build_transform(_our_cfg(size=(64, 96)), is_train=False)(
        img.copy()
    )
    assert u8.shape == (64, 96, 3)
    np.testing.assert_allclose(_our_float(u8), ref_out.numpy(), atol=1e-6)


def test_undersized_center_crop_matches_torchvision_padding():
    """torchvision zero-pads undersized inputs with floor-half on top/left;
    PIL's out-of-bounds crop puts the extra row on the wrong side for odd
    deficits — our center_crop must reproduce the torchvision arithmetic
    (unreachable after Resize in the eval path, reachable via bare
    random_crop train configs)."""
    for (w, h) in [(100, 81), (81, 100), (101, 224), (223, 223)]:
        img = _jpeg_image(w, h, seed=7)
        ref = np.array(ShimCenterCrop((224, 224))(img.copy()))
        ours = np.array(our_tfm.center_crop(img.copy(), (224, 224)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"size {(w, h)}")


# ---------------------------------------------------------------------------
# train path: composition branches + RRC geometry
# ---------------------------------------------------------------------------

def test_train_composition_default(tfm_env):
    t = tfm_env.transforms.build_transform(_ref_input_cfg(), is_train=True)
    comp = t.transforms
    assert [type(x).__name__ for x in comp] == [
        "RandomResizedCrop", "RandomHorizontalFlip", "ToTensor", "Normalize",
    ]
    assert comp[0].scale == (0.08, 1.0)
    assert comp[0].size == (224, 224)
    assert comp[0].interpolation is InterpolationMode.BICUBIC
    assert comp[-1].mean == tuple(our_tfm.CLIP_MEAN)
    assert comp[-1].std == tuple(our_tfm.CLIP_STD)


def test_train_composition_all_names_in_list_order(tfm_env):
    names = ["random_crop", "random_flip", "random_rotation", "color_jitter",
             "normalize", ]
    t = tfm_env.transforms.build_transform(
        _ref_input_cfg(transforms=names), is_train=True
    )
    assert [type(x).__name__ for x in t.transforms] == [
        "RandomCrop", "RandomHorizontalFlip", "RandomRotation", "ColorJitter",
        "ToTensor", "Normalize",
    ]
    jitter = t.transforms[3]
    assert jitter.brightness == (1 - 0.4, 1 + 0.4)
    assert jitter.hue == (-0.1, 0.1)


def test_train_composition_normalize_missing_quirk(tfm_env):
    """Without "normalize" in the list the reference appends a bare ToTensor
    (unnormalized training pixels; ref: utils/transforms.py:60-62). Executed
    on an image to pin the resulting value scale."""
    t = tfm_env.transforms.build_transform(
        _ref_input_cfg(transforms=["random_flip"]), is_train=True
    )
    assert [type(x).__name__ for x in t.transforms] == [
        "RandomHorizontalFlip", "ToTensor",
    ]
    torch.manual_seed(0)
    out = t(_jpeg_image(32, 32, seed=3))
    assert out.dtype == torch.float32
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_train_composition_unknown_names_ignored(tfm_env):
    """Unknown transform names fall through silently in the reference loop —
    same contract as our build_transform (ref: utils/transforms.py:27-58)."""
    t = tfm_env.transforms.build_transform(
        _ref_input_cfg(transforms=["cutmix", "normalize"]), is_train=True
    )
    assert [type(x).__name__ for x in t.transforms] == ["ToTensor", "Normalize"]


class _FakeRng:
    """Replays prescribed uniform/randint draws into sample_rrc_box."""

    def __init__(self, uniforms, randints):
        self._u = list(uniforms)
        self._r = list(randints)

    def uniform(self, lo, hi):
        v = self._u.pop(0)
        assert lo <= v <= hi, (v, lo, hi)
        return v

    def randint(self, lo, hi):
        v = self._r.pop(0)
        assert lo <= v <= hi, (v, lo, hi)
        return v


@pytest.mark.parametrize("case", [
    # (image w, h, area-fraction draw, log-aspect draw, left, top)
    (500, 375, 0.37, 0.12, 17, 5),
    (500, 375, 0.5, 0.0, 100, 50),
    (224, 224, 0.08, -0.2, 40, 11),
    (87, 123, 0.5, 0.25, 2, 30),
])
def test_rrc_window_resize_equals_crop_then_resize(case):
    """Our RRC output must equal torchvision's crop-then-resize
    for the identical integer window (the two-op sequence the reference
    executes; ref: utils/transforms.py:28-35)."""
    import math

    w, h, s, lr, left, top = case
    img = _jpeg_image(w, h, seed=w + h)
    # reproduce the window our sampler derives from these draws
    target_area = w * h * s
    aspect = math.exp(lr)
    cw = int(round(math.sqrt(target_area * aspect)))
    ch = int(round(math.sqrt(target_area / aspect)))
    assert 0 < cw <= w and 0 < ch <= h, "test case must accept on first draw"

    ours = our_tfm.random_resized_crop(
        img.copy(), (224, 224), interpolation=Image.BICUBIC,
        rng=_FakeRng([s, lr], [left, top]),
    )
    # the reference path: F.crop then F.resize (shim = torchvision PIL math)
    from _torchvision_shim import crop as shim_crop, resize as shim_resize

    ref = shim_resize(
        shim_crop(img.copy(), top, left, ch, cw), [224, 224],
        InterpolationMode.BICUBIC,
    )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("wh", [(640, 100), (100, 640), (224, 224)])
def test_rrc_fallback_box_matches_torchvision(wh):
    """Force 10 rejections (scale > 1 guarantees w > width) and compare the
    clamped-aspect central fallback window (ref executed semantics:
    torchvision RandomResizedCrop.get_params fallback)."""
    w, h = wh
    img = Image.new("RGB", (w, h))
    torch.manual_seed(0)
    i, j, fh, fw = ShimRRC.get_params(img, scale=(4.0, 4.0),
                                      ratio=(3 / 4, 4 / 3))

    class _Rng:
        def uniform(self, lo, hi):
            return lo

        def randint(self, lo, hi):  # pragma: no cover - must not be reached
            raise AssertionError("fallback path must not sample a corner")

    x, y, bw, bh = our_tfm.sample_rrc_box(w, h, scale=(4.0, 4.0), rng=_Rng())
    assert (x, y, bw, bh) == (j, i, fw, fh)


def test_train_default_pipeline_numeric_parity_forced_draws(tfm_env):
    """Full default train pipeline with both RNGs pinned to the same window
    and flip decision: reference Compose (executed) vs our train transform.
    torch RNG and python RNG streams differ by design, so the draws are
    forced equal; this pins everything AFTER the draws."""
    img = _jpeg_image(500, 375, seed=9)

    ref_pipeline = tfm_env.transforms.build_transform(
        _ref_input_cfg(), is_train=True
    )
    rrc, flip = ref_pipeline.transforms[0], ref_pipeline.transforms[1]
    assert isinstance(rrc, ShimRRC) and isinstance(flip, ShimFlip)
    # fix the window and force the flip on the reference side
    rrc.get_params = lambda im, scale, ratio: (5, 17, 200, 260)  # i, j, h, w
    flip.p = 1.1  # torch.rand(1) < 1.1 always
    ref_out = ref_pipeline(img.copy())

    ours_tfm = our_tfm.build_transform(_our_cfg(), is_train=True)

    class _Rng:
        """area/aspect draws that produce exactly w=260, h=200, then the
        corner (17, 5), then flip."""

        def __init__(self):
            import math

            area = 500 * 375
            # solve: w = sqrt(A*s*a), h = sqrt(A*s/a)  =>  s = w*h/A, a = w/h
            self._uniforms = [260 * 200 / area, math.log(260 / 200)]
            self._randints = [17, 5]

        def uniform(self, lo, hi):
            return self._uniforms.pop(0)

        def randint(self, lo, hi):
            return self._randints.pop(0)

        def random(self):
            return 0.0  # < 0.5 -> flip

    u8 = ours_tfm(img.copy(), rng=_Rng())
    np.testing.assert_allclose(_our_float(u8), ref_out.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# SimpleDataManager end to end
# ---------------------------------------------------------------------------

def _varied_fixture_images(root):
    """Replace the 8x8 fixture JPEGs with varied-size gradient images so the
    loader parity is non-trivial; deterministic per relative path."""
    sizes = [(96, 64), (64, 96), (80, 80), (130, 70), (70, 130), (61, 67)]
    for i, p in enumerate(sorted(Path(root).rglob("*.jpg"))):
        w, h = sizes[i % len(sizes)]
        img = _jpeg_image(w, h, seed=i)
        img.save(p, format="JPEG", quality=90)


def test_data_manager_matches_reference_executed(tfm_env, tmp_path, capsys):
    """SimpleDataManager (executed, torch DataLoader and all) vs our
    DataManager on identical fixture trees: printed info block, loader
    lengths (incl. the drop_last len>=batch rule), and batch-for-batch
    numeric equality of the test loader (ref: utils/data_manager.py:15-95)."""
    import random as pyrandom

    from test_dataset_catalogs import build_oxford_pets

    importlib.import_module("datasets.oxford_pets")

    ref_root, our_root = tmp_path / "ref", tmp_path / "ours"
    build_oxford_pets(ref_root)
    build_oxford_pets(our_root)
    _varied_fixture_images(ref_root)
    _varied_fixture_images(our_root)

    shots, seed = 3, 1
    ref_cfg = SimpleNamespace(
        dataset=SimpleNamespace(root=str(ref_root), num_shots=shots,
                                subsample_classes="all", name="OxfordPets"),
        input=_ref_input_cfg(size=(64, 64)).input,
        dataloader=SimpleNamespace(batch_size_train=4, batch_size_test=5,
                                   num_workers=0),
        use_cuda=False,
        seed=seed,
    )
    pyrandom.seed(seed)
    ref_dm = tfm_env.data_manager.SimpleDataManager(ref_cfg)
    ref_info = capsys.readouterr().out

    our_cfg = _our_cfg(size=(64, 64))
    our_cfg.dataset.name = "OxfordPets"
    our_cfg.dataset.root = str(our_root)
    our_cfg.dataset.num_shots = shots
    our_cfg.dataset.subsample_classes = "all"
    our_cfg.dataloader.batch_size_train = 4
    our_cfg.dataloader.batch_size_test = 5
    our_cfg.dataloader.num_workers = 2
    our_cfg.seed = seed

    from clip_gp_tpu.data.pipeline import DataManager

    pyrandom.seed(seed)
    our_dm = DataManager(our_cfg)
    our_info = capsys.readouterr().out

    # the full construction stdout — split-save + few-shot-cache log lines +
    # info block — must agree byte-for-byte modulo the fixture root
    assert our_info.replace(str(our_root), "<root>") == ref_info.replace(
        str(ref_root), "<root>"
    )

    # second construction exercises the read paths and their log lines
    # ("Reading split from", "Loading preprocessed few-shot data from")
    pyrandom.seed(seed)
    tfm_env.data_manager.SimpleDataManager(ref_cfg)
    ref_info2 = capsys.readouterr().out
    pyrandom.seed(seed)
    DataManager(our_cfg)
    our_info2 = capsys.readouterr().out
    assert our_info2.replace(str(our_root), "<root>") == ref_info2.replace(
        str(ref_root), "<root>"
    )

    # loader structure: 6 train items, batch 4 -> drop_last kicks in (len 1);
    # test split 4 items, batch 5 -> single short batch
    assert len(ref_dm.train_loader_x) == len(our_dm.train_loader_x) == 1
    assert len(ref_dm.test_loader) == len(our_dm.test_loader) == 1
    assert ref_dm.num_classes == our_dm.num_classes
    assert dict(ref_dm.lab2cname) == dict(our_dm.lab2cname)

    for split in ("test_loader", "val_loader"):
        ref_loader = getattr(ref_dm, split)
        our_loader = getattr(our_dm, split)
        assert (ref_loader is None) == (our_loader is None), split
        if ref_loader is None:
            continue
        ref_batches = list(ref_loader)
        our_batches = list(our_loader)
        assert len(ref_batches) == len(our_batches)
        for rb, ob in zip(ref_batches, our_batches):
            assert rb["label"].tolist() == ob["label"].tolist()
            assert list(rb["classname"]) == list(ob["classname"])
            assert [os.path.relpath(p, ref_root) for p in rb["impath"]] == [
                os.path.relpath(p, our_root) for p in ob["impath"]
            ]
            ref_imgs = rb["img"].numpy()  # [B, 3, H, W] normalized float
            for k in range(len(ref_imgs)):
                np.testing.assert_allclose(
                    _our_float(ob["img"][k]), ref_imgs[k], atol=1e-6
                )


def test_data_manager_small_dataset_keeps_last_batch(tfm_env, tmp_path, capsys):
    """batch_size > dataset size: the reference disables drop_last
    (ref: utils/data_manager.py:79) — our BatchLoader must agree."""
    import random as pyrandom

    from test_dataset_catalogs import build_oxford_pets

    importlib.import_module("datasets.oxford_pets")
    ref_root, our_root = tmp_path / "ref", tmp_path / "ours"
    build_oxford_pets(ref_root)
    build_oxford_pets(our_root)

    ref_cfg = SimpleNamespace(
        dataset=SimpleNamespace(root=str(ref_root), num_shots=2,
                                subsample_classes="all", name="OxfordPets"),
        input=_ref_input_cfg(size=(32, 32)).input,
        dataloader=SimpleNamespace(batch_size_train=16, batch_size_test=16,
                                   num_workers=0),
        use_cuda=False,
        seed=1,
    )
    pyrandom.seed(1)
    ref_dm = tfm_env.data_manager.SimpleDataManager(ref_cfg)

    our_cfg = _our_cfg(size=(32, 32))
    our_cfg.dataset.name = "OxfordPets"
    our_cfg.dataset.root = str(our_root)
    our_cfg.dataset.num_shots = 2
    our_cfg.dataloader.batch_size_train = 16
    our_cfg.dataloader.batch_size_test = 16
    our_cfg.dataloader.num_workers = 1

    from clip_gp_tpu.data.pipeline import DataManager

    pyrandom.seed(1)
    our_dm = DataManager(our_cfg)
    capsys.readouterr()

    assert len(ref_dm.train_loader_x) == len(our_dm.train_loader_x) == 1
    (ref_batch,) = list(ref_dm.train_loader_x)
    assert ref_batch["img"].shape[0] == 4  # 2 classes x 2 shots, undropped
    (our_batch,) = list(our_dm.train_loader_x)
    assert our_batch["img"].shape[0] == 4


# ---------------------------------------------------------------------------
# clip/clip.py:_transform
# ---------------------------------------------------------------------------

def test_clip_module_transform_executed(tfm_env):
    """clip.load's preprocessing Compose (ref: clip/clip.py:67-75) executed;
    equals our eval path at CLIP's own normalization constants."""
    pipeline = tfm_env.clip._transform(64)
    for i, (w, h) in enumerate([(300, 200), (64, 64), (50, 129)]):
        img = _jpeg_image(w, h, seed=20 + i)
        ref_out = pipeline(img.copy())
        assert tuple(ref_out.shape) == (3, 64, 64)
        u8 = our_tfm.build_transform(_our_cfg(size=(64, 64)), is_train=False)(
            img.copy()
        )
        np.testing.assert_allclose(_our_float(u8), ref_out.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# logger + trainer registry
# ---------------------------------------------------------------------------

def test_setup_logger_tee_executed(tmp_path):
    """utils/logging.py executed in a subprocess (it permanently rebinds
    sys.stdout): print() output and logger lines must both land in log.txt —
    the contract the sweep's skip-if-done signal relies on
    (ref: utils/logging.py:40-66)."""
    script = f"""
import importlib.util
spec = importlib.util.spec_from_file_location(
    "ref_logging", "/root/reference/utils/logging.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
logger = mod.setup_logger({str(tmp_path)!r})
logger.info("via-logger")
print("via-print")
"""
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    log = (tmp_path / "log.txt").read_text()
    assert "via-print" in log
    assert " - CLIP-GP - INFO - via-logger" in log
    # console still sees both (the Tee writes to sys.__stdout__)
    assert "via-print" in out.stdout
    assert "via-logger" in out.stdout


def test_trainer_registry_unknown_error_executed():
    """The reference registry raises ValueError listing registered names
    (ref: utils/trainer_registry.py:23-27); ours raises KeyError with the
    same information. Both executed."""
    with reference_env(trainer_modules=("adapter",)) as env:
        reg_mod = importlib.import_module("utils.trainer_registry")
        with pytest.raises(ValueError) as exc:
            reg_mod.TRAINER_REGISTRY.get("NoSuchTrainer")
        assert "Unknown trainer: NoSuchTrainer" in str(exc.value)
        assert "Available:" in str(exc.value)

    from clip_gp_tpu.core.registry import TRAINER_REGISTRY

    with pytest.raises(KeyError) as exc:
        TRAINER_REGISTRY.get("NoSuchTrainer")
    assert "NoSuchTrainer" in str(exc.value)
