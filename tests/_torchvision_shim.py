"""A functional torchvision.transforms shim for executed-reference goldens.

The reference's ``utils/transforms.py``, ``utils/data_manager.py`` and
``clip/clip.py:_transform`` import torchvision, which is not installed in
this environment.  This module implements exactly the transform surface
those files touch, with the semantics of torchvision's PIL backend
(torchvision/transforms/functional_pil.py + transforms.py), so the
reference's transform-composition code executes unmodified and its output
tensors can be compared numerically against this framework's pipeline.

Faithfulness notes (the details that matter for parity):
- ``Resize`` with an int size maps the SHORT side to ``size`` and the long
  side to ``int(size * long / short)`` (truncation, torchvision's
  ``_compute_resized_output_size``), returning the input unchanged when the
  short side already matches.
- ``CenterCrop`` crops at ``int(round((image - crop) / 2.0))`` and, when the
  image is SMALLER than the crop, first zero-pads by ``(crop - image) // 2``
  on the left/top and the remainder on the right/bottom.
- ``ToTensor`` is uint8 HWC -> float32 CHW / 255.
- ``RandomResizedCrop.get_params`` consumes torch RNG draws in torchvision's
  order (area fraction, log-aspect, top, left) and falls back to a clamped
  center crop after 10 rejected samples.
- ``RandomRotation``'s executed default interpolation is NEAREST.
- ``ColorJitter`` samples all four factors up front (brightness, contrast,
  saturation, hue order) and applies them in ``torch.randperm(4)`` order;
  hue shifts the HSV hue channel by a wrapping uint8 add of
  ``hue_factor * 255``.

Like tests/_gpytorch_shim.py this is test-support code: nothing here ships
in clip_gp_tpu.
"""

from __future__ import annotations

import math
import numbers
import types
from enum import Enum

import numpy as np
import torch
from PIL import Image, ImageEnhance


class InterpolationMode(Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"


_PIL_RESAMPLE = {
    InterpolationMode.NEAREST: Image.NEAREST,
    InterpolationMode.BILINEAR: Image.BILINEAR,
    InterpolationMode.BICUBIC: Image.BICUBIC,
    InterpolationMode.LANCZOS: Image.LANCZOS,
}


def _resample(interpolation):
    if isinstance(interpolation, InterpolationMode):
        return _PIL_RESAMPLE[interpolation]
    # legacy integer PIL constant (clip/clip.py's ImportError fallback path)
    return int(interpolation)


def _pair(size):
    if isinstance(size, (tuple, list)):
        if len(size) == 1:
            return (int(size[0]), int(size[0]))
        return (int(size[0]), int(size[1]))
    return (int(size), int(size))


def _require_pil(img, op):
    if not isinstance(img, Image.Image):
        raise NotImplementedError(
            f"shim {op} only implements the PIL input path (got {type(img)})"
        )


# ---------------------------------------------------------------------------
# functional layer (mirrors torchvision.transforms.functional, PIL branch)
# ---------------------------------------------------------------------------

def resize(img, size, interpolation=InterpolationMode.BILINEAR):
    _require_pil(img, "resize")
    if isinstance(size, (tuple, list)) and len(size) == 2:
        return img.resize((int(size[1]), int(size[0])), _resample(interpolation))
    if isinstance(size, (tuple, list)):
        size = size[0]
    size = int(size)
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short, new_long = size, int(size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((new_w, new_h), _resample(interpolation))


def crop(img, top, left, height, width):
    _require_pil(img, "crop")
    return img.crop((left, top, left + width, top + height))


def pad(img, padding_ltrb, fill=0):
    _require_pil(img, "pad")
    left, top, right, bottom = padding_ltrb
    out = Image.new(img.mode, (img.width + left + right, img.height + top + bottom), fill)
    out.paste(img, (left, top))
    return out


def center_crop(img, output_size):
    _require_pil(img, "center_crop")
    crop_height, crop_width = _pair(output_size)
    image_width, image_height = img.size
    if crop_width > image_width or crop_height > image_height:
        padding_ltrb = (
            (crop_width - image_width) // 2 if crop_width > image_width else 0,
            (crop_height - image_height) // 2 if crop_height > image_height else 0,
            (crop_width - image_width + 1) // 2 if crop_width > image_width else 0,
            (crop_height - image_height + 1) // 2 if crop_height > image_height else 0,
        )
        img = pad(img, padding_ltrb)
        image_width, image_height = img.size
        if crop_width == image_width and crop_height == image_height:
            return img
    crop_top = int(round((image_height - crop_height) / 2.0))
    crop_left = int(round((image_width - crop_width) / 2.0))
    return crop(img, crop_top, crop_left, crop_height, crop_width)


def hflip(img):
    if isinstance(img, torch.Tensor):
        return torch.flip(img, dims=[-1])
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def rotate(img, angle, interpolation=InterpolationMode.NEAREST, expand=False,
           center=None, fill=None):
    _require_pil(img, "rotate")
    return img.rotate(angle, _resample(interpolation), expand, center,
                      fillcolor=fill)


def to_tensor(pic):
    _require_pil(pic, "to_tensor")
    if pic.mode not in ("RGB", "L"):
        raise NotImplementedError(f"shim to_tensor: unsupported mode {pic.mode}")
    arr = np.array(pic, dtype=np.uint8, copy=True)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div(255)


def normalize(tensor, mean, std):
    if not isinstance(tensor, torch.Tensor):
        raise TypeError("normalize expects a tensor (did ToTensor run?)")
    mean = torch.as_tensor(mean, dtype=tensor.dtype)
    std = torch.as_tensor(std, dtype=tensor.dtype)
    return (tensor - mean[:, None, None]) / std[:, None, None]


def adjust_brightness(img, factor):
    _require_pil(img, "adjust_brightness")
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img, factor):
    _require_pil(img, "adjust_contrast")
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img, factor):
    _require_pil(img, "adjust_saturation")
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img, hue_factor):
    _require_pil(img, "adjust_hue")
    if not (-0.5 <= hue_factor <= 0.5):
        raise ValueError(f"hue_factor ({hue_factor}) is not in [-0.5, 0.5].")
    input_mode = img.mode
    if input_mode in {"L", "1", "I", "F"}:
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # torchvision adds a wrapping uint8; do the wrap explicitly so the
    # result is numpy-version independent
    shift = int(np.float32(hue_factor * 255)) % 256
    np_h = ((np_h.astype(np.int16) + shift) % 256).astype(np.uint8)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(input_mode)


# ---------------------------------------------------------------------------
# transform classes (mirror torchvision.transforms.transforms)
# ---------------------------------------------------------------------------

class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    def __init__(self, size, interpolation=InterpolationMode.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        return resize(img, self.size, self.interpolation)


class CenterCrop:
    def __init__(self, size):
        self.size = _pair(size)

    def __call__(self, img):
        return center_crop(img, self.size)


class ToTensor:
    def __call__(self, pic):
        return to_tensor(pic)


class Normalize:
    def __init__(self, mean, std):
        self.mean = tuple(mean)
        self.std = tuple(std)

    def __call__(self, tensor):
        return normalize(tensor, self.mean, self.std)


class RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                 interpolation=InterpolationMode.BILINEAR):
        self.size = _pair(size)
        self.scale = tuple(scale)
        self.ratio = tuple(ratio)
        self.interpolation = interpolation

    @staticmethod
    def get_params(img, scale, ratio):
        width, height = img.size
        area = height * width
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        for _ in range(10):
            target_area = area * torch.empty(1).uniform_(scale[0], scale[1]).item()
            aspect_ratio = math.exp(
                torch.empty(1).uniform_(log_ratio[0], log_ratio[1]).item()
            )
            w = int(round(math.sqrt(target_area * aspect_ratio)))
            h = int(round(math.sqrt(target_area / aspect_ratio)))
            if 0 < w <= width and 0 < h <= height:
                i = torch.randint(0, height - h + 1, size=(1,)).item()
                j = torch.randint(0, width - w + 1, size=(1,)).item()
                return i, j, h, w
        # fallback: clamped-aspect central crop
        in_ratio = float(width) / float(height)
        if in_ratio < min(ratio):
            w = width
            h = int(round(w / min(ratio)))
        elif in_ratio > max(ratio):
            h = height
            w = int(round(h * max(ratio)))
        else:
            w, h = width, height
        i = (height - h) // 2
        j = (width - w) // 2
        return i, j, h, w

    def __call__(self, img):
        i, j, h, w = self.get_params(img, self.scale, self.ratio)
        return resize(crop(img, i, j, h, w), list(self.size), self.interpolation)


class RandomCrop:
    def __init__(self, size):
        self.size = _pair(size)

    def __call__(self, img):
        th, tw = self.size
        w, h = img.size
        if h < th or w < tw:
            raise ValueError("crop size larger than input size")
        if w == tw and h == th:
            return img
        i = torch.randint(0, h - th + 1, size=(1,)).item()
        j = torch.randint(0, w - tw + 1, size=(1,)).item()
        return crop(img, i, j, th, tw)


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1).item() < self.p:
            return hflip(img)
        return img


class RandomRotation:
    def __init__(self, degrees, interpolation=InterpolationMode.NEAREST,
                 expand=False, center=None, fill=0):
        if isinstance(degrees, numbers.Number):
            degrees = (-float(degrees), float(degrees))
        self.degrees = tuple(float(d) for d in degrees)
        self.interpolation = interpolation
        self.expand = expand
        self.center = center
        self.fill = fill

    def __call__(self, img):
        angle = float(
            torch.empty(1).uniform_(self.degrees[0], self.degrees[1]).item()
        )
        return rotate(img, angle, self.interpolation, self.expand, self.center)


class ColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = self._range(brightness, "brightness")
        self.contrast = self._range(contrast, "contrast")
        self.saturation = self._range(saturation, "saturation")
        self.hue = self._range(hue, "hue", center=0.0, bound=(-0.5, 0.5))

    @staticmethod
    def _range(value, name, center=1.0, bound=(0.0, float("inf"))):
        if isinstance(value, numbers.Number):
            if value < 0:
                raise ValueError(f"If {name} is a single number, it must be non negative.")
            lo, hi = center - float(value), center + float(value)
            if center == 1.0:
                lo = max(lo, 0.0)
        else:
            lo, hi = (float(value[0]), float(value[1]))
        if not bound[0] <= lo <= hi <= bound[1]:
            raise ValueError(f"{name} values should be between {bound}")
        if lo == hi == center:
            return None
        return (lo, hi)

    @staticmethod
    def get_params(brightness, contrast, saturation, hue):
        fn_idx = torch.randperm(4)
        b = None if brightness is None else float(
            torch.empty(1).uniform_(brightness[0], brightness[1]).item())
        c = None if contrast is None else float(
            torch.empty(1).uniform_(contrast[0], contrast[1]).item())
        s = None if saturation is None else float(
            torch.empty(1).uniform_(saturation[0], saturation[1]).item())
        h = None if hue is None else float(
            torch.empty(1).uniform_(hue[0], hue[1]).item())
        return fn_idx, b, c, s, h

    def __call__(self, img):
        fn_idx, b, c, s, h = self.get_params(
            self.brightness, self.contrast, self.saturation, self.hue
        )
        for fn_id in fn_idx:
            fn_id = int(fn_id)
            if fn_id == 0 and b is not None:
                img = adjust_brightness(img, b)
            elif fn_id == 1 and c is not None:
                img = adjust_contrast(img, c)
            elif fn_id == 2 and s is not None:
                img = adjust_saturation(img, s)
            elif fn_id == 3 and h is not None:
                img = adjust_hue(img, h)
        return img


def _randaugment_stub(*args, **kwargs):
    raise AssertionError(
        "RandAugment is not implemented by the torchvision shim — the golden "
        "would no longer be testing reference semantics"
    )


def build_torchvision_module():
    """(torchvision, torchvision.transforms) module pair for sys.modules."""
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    for name, obj in (
        ("Compose", Compose),
        ("Resize", Resize),
        ("CenterCrop", CenterCrop),
        ("ToTensor", ToTensor),
        ("Normalize", Normalize),
        ("RandomResizedCrop", RandomResizedCrop),
        ("RandomCrop", RandomCrop),
        ("RandomHorizontalFlip", RandomHorizontalFlip),
        ("RandomRotation", RandomRotation),
        ("ColorJitter", ColorJitter),
        ("RandAugment", _randaugment_stub),
        ("InterpolationMode", InterpolationMode),
    ):
        setattr(tvt, name, obj)
    tv.transforms = tvt
    tv.__path__ = []  # mark as package so "torchvision.transforms" imports
    return tv, tvt
