"""Shared import harness for executed-reference trainer goldens.

The reference's trainer modules (read-only checkout at /root/reference)
import gpytorch / entmax / torchvision, none of which exist in this
environment, and the reference's own ``trainers/__init__.py`` is broken
(it imports the nonexistent ``adapter_taskres`` — SURVEY §2.3.1). This
module loads ``trainers.*`` under a synthetic parent package with
import-time stubs. The stubs satisfy class-definition imports only:
every stubbed SYMBOL raises if actually executed, so no reference math
is ever replaced by stub math.
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types
from pathlib import Path
from types import SimpleNamespace

REFERENCE = Path("/root/reference")

# namespaces owned by the reference checkout or its stubbed dependencies;
# setup/teardown only ever touches these
_REF_NAMESPACES = (
    "utils", "datasets", "clip", "trainers",
    "ftfy", "entmax", "torchvision", "gpytorch",
)


def _stub(*args, **kwargs):
    raise AssertionError(
        "stubbed third-party dependency was executed — the golden would "
        "no longer be testing reference math"
    )


@contextlib.contextmanager
def reference_env(trainer_modules=("adapter",), functional_gp=False,
                  functional_transforms=False):
    """Import the reference's trainer modules + utils/config/clip packages.

    Yields a namespace with one attribute per requested trainer module
    (e.g. ``env.adapter``, ``env.clip_adapter``) plus ``trainer`` /
    ``config`` (the utils modules) and ``clip_model`` (clip/model.py).
    Everything is removed from sys.modules again on exit — surgically, so
    unrelated modules lazily imported meanwhile (e.g. jax.experimental
    submodules whose re-import re-registers config options) survive.

    With ``functional_gp=True`` the gpytorch/entmax stubs are replaced by
    the working torch implementations in tests/_gpytorch_shim.py, so the
    reference's GP template weighter actually RUNS (executed GP goldens).
    With ``functional_transforms=True`` the torchvision stubs are replaced
    by tests/_torchvision_shim.py, so the reference's transform pipeline
    (utils/transforms.py, utils/data_manager.py, clip/clip.py:_transform)
    actually RUNS.
    """
    import torch

    saved_modules = dict(sys.modules)
    sys.path.insert(0, str(REFERENCE))
    for name in list(sys.modules):
        if name.split(".")[0] in _REF_NAMESPACES:
            del sys.modules[name]

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s  # identity on well-formed text (mojibake only)
    entmax = types.ModuleType("entmax")
    entmax.sparsemax = _stub
    if functional_transforms:
        import _torchvision_shim

        tv, tvt = _torchvision_shim.build_torchvision_module()
    else:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for n in (
            "Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
            "RandomResizedCrop", "RandomHorizontalFlip", "ColorJitter",
            "RandAugment",
        ):
            setattr(tvt, n, _stub)
        tv.transforms = tvt
    if functional_gp:
        import _gpytorch_shim

        gpy = _gpytorch_shim.build_gpytorch_module()
        entmax = _gpytorch_shim.build_entmax_module()
    else:
        gpy = types.ModuleType("gpytorch")
        # class-definition bases only; GP paths never exercised in goldens
        gpy.models = SimpleNamespace(
            ApproximateGP=type("ApproximateGP", (), {})
        )
        gpy.means = SimpleNamespace(Mean=type("Mean", (torch.nn.Module,), {}))
        for sub in ("variational", "kernels", "likelihoods", "distributions",
                    "settings"):
            setattr(gpy, sub, SimpleNamespace())
    sys.modules.update(
        {
            "ftfy": ftfy,
            "entmax": entmax,
            "torchvision": tv,
            "torchvision.transforms": tvt,
            "gpytorch": gpy,
        }
    )
    trainers_pkg = types.ModuleType("trainers")
    trainers_pkg.__path__ = [str(REFERENCE / "trainers")]
    sys.modules["trainers"] = trainers_pkg
    try:
        env = SimpleNamespace(
            trainer=importlib.import_module("utils.trainer"),
            config=importlib.import_module("utils.config"),
            clip_model=importlib.import_module("clip.model"),
            clip=importlib.import_module("clip.clip"),
        )
        for mod in trainer_modules:
            setattr(env, mod, importlib.import_module(f"trainers.{mod}"))
        yield env
    finally:
        sys.path.remove(str(REFERENCE))
        for name in list(sys.modules):
            if (
                name.split(".")[0] in _REF_NAMESPACES
                and name not in saved_modules
            ):
                del sys.modules[name]
        for name, mod in saved_modules.items():
            if (
                name.split(".")[0] in _REF_NAMESPACES
                and sys.modules.get(name) is not mod
            ):
                sys.modules[name] = mod


def build_tiny_torch_clip(env, seed=0):
    """Reference torch CLIP with TEST-ViT dimensions, deterministic init."""
    import torch

    torch.manual_seed(seed)
    return (
        env.clip_model.CLIP(
            embed_dim=32, image_resolution=32, vision_layers=2,
            vision_width=64, vision_patch_size=8, context_length=77,
            vocab_size=49408, transformer_width=64, transformer_heads=1,
            transformer_layers=2,
        )
        .float()
        .eval()
    )
