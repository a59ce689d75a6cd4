"""Executed-reference dataset-catalog goldens.

Build the same tiny fixture tree twice, run the ACTUAL reference loader
(from the read-only checkout) on one copy and this framework's catalog on
the other with identical seeding, and require identical results: ordered
classnames, label maps, every split as (relative impath, label, classname)
tuples, the generated split_zhou_*.json contents, the seeded few-shot
pickle contents, and the second-construction read paths (split JSON +
pickle cache hits). This proves the path-convention code end to end for
all 15 catalogs without any real data (ref: datasets/*.py,
utils/dataset_base.py:101-182).
"""

from __future__ import annotations

import importlib
import json
import os
import pickle
import random
import sys
from pathlib import Path
from types import SimpleNamespace

import pytest

from test_dataset_catalogs import BUILDERS, _config

from clip_gp_tpu.core.registry import build_dataset
import clip_gp_tpu.data.datasets  # noqa: F401  (registers the catalogs)

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

# dataset name (registry/BUILDERS key) -> reference module under datasets/
REF_MODULES = {
    "OxfordPets": "oxford_pets",
    "Caltech101": "caltech101",
    "DescribableTextures": "dtd",
    "EuroSAT": "eurosat",
    "Food101": "food101",
    "OxfordFlowers": "oxford_flowers",
    "FGVCAircraft": "fgvc_aircraft",
    "StanfordCars": "stanford_cars",
    "SUN397": "sun397",
    "UCF101": "ucf101",
    "ImageNet": "imagenet",
    "ImageNetV2": "imagenetv2",
    "ImageNetA": "imagenet_a",
    "ImageNetR": "imagenet_r",
    "ImageNetSketch": "imagenet_sketch",
}

_REF_PREFIXES = ("utils", "datasets")


def _clear_ref_modules():
    for k in list(sys.modules):
        if k in _REF_PREFIXES or k.startswith(tuple(p + "." for p in _REF_PREFIXES)):
            del sys.modules[k]


@pytest.fixture(scope="module")
def ref_datasets():
    """Import the reference's dataset loader modules.

    The loaders import ``utils.dataset_base`` absolutely, but the real
    ``utils/__init__.py`` pulls in the whole trainer stack (torchvision,
    unavailable here) — so register synthetic parent packages whose
    ``__path__`` points at the checkout and import ONLY the submodules the
    loaders actually need."""
    import types

    saved_modules = {
        k: v
        for k, v in sys.modules.items()
        if k in _REF_PREFIXES
        or k.startswith(tuple(p + "." for p in _REF_PREFIXES))
    }
    _clear_ref_modules()
    for pkg in _REF_PREFIXES:
        mod = types.ModuleType(pkg)
        mod.__path__ = [str(REFERENCE / pkg)]
        sys.modules[pkg] = mod
    try:
        yield {
            name: importlib.import_module(f"datasets.{mod}")
            for name, mod in REF_MODULES.items()
        }
    finally:
        _clear_ref_modules()
        sys.modules.update(saved_modules)


def _snapshot(ds, root):
    def rel(items):
        return [
            (os.path.relpath(d.impath, root), d.label, d.classname)
            for d in items
        ]

    return {
        "classnames": list(ds.classnames),
        "lab2cname": dict(ds.lab2cname),
        "num_classes": ds.num_classes,
        "train": rel(ds.train_x),
        "val": rel(ds.val),
        "test": rel(ds.test),
    }


def _artifacts(root):
    """Relative-path view of every split JSON and few-shot pickle under
    ``root`` (works for both implementations' Datum classes)."""
    out = {}
    root = Path(root)
    for p in sorted(root.rglob("split_zhou_*.json")):
        out[str(p.relative_to(root))] = json.loads(p.read_text())
    for p in sorted(root.rglob("shot_*-seed_*.pkl")):
        with p.open("rb") as f:
            data = pickle.load(f)
        out[str(p.relative_to(root))] = {
            k: [
                (os.path.relpath(d.impath, root), d.label, d.classname)
                for d in v
            ]
            for k, v in data.items()
        }
    return out


def _ref_config(root, shots, seed, subsample="all"):
    return SimpleNamespace(
        dataset=SimpleNamespace(
            root=str(root), num_shots=shots, subsample_classes=subsample
        ),
        seed=seed,
    )


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_catalog_matches_executed_reference(ref_datasets, tmp_path, name):
    ref_root = tmp_path / "ref_root"
    our_root = tmp_path / "our_root"
    BUILDERS[name](ref_root)
    BUILDERS[name](our_root)
    ref_cls = getattr(ref_datasets[name], name)

    shots, seed = 2, 1

    # first construction: builds splits, samples few-shot, writes caches
    random.seed(seed)
    ref_ds = ref_cls(_ref_config(ref_root, shots, seed))
    random.seed(seed)
    our_ds = build_dataset(_config(our_root, name, shots=shots, seed=seed))

    assert _snapshot(our_ds, our_root) == _snapshot(ref_ds, ref_root)
    assert _artifacts(our_root) == _artifacts(ref_root)

    # second construction: exercises the read paths (split JSON present,
    # pickle cache hit) — must agree with the first and with each other
    random.seed(seed)
    ref_ds2 = ref_cls(_ref_config(ref_root, shots, seed))
    random.seed(seed)
    our_ds2 = build_dataset(_config(our_root, name, shots=shots, seed=seed))
    assert _snapshot(our_ds2, our_root) == _snapshot(ref_ds2, ref_root)
    assert _snapshot(ref_ds2, ref_root) == _snapshot(ref_ds, ref_root)


@pytest.mark.parametrize("subsample", ["base", "new"])
def test_subsample_matches_executed_reference(ref_datasets, tmp_path, subsample):
    """base/new class splitting and relabeling against the executed
    reference (ref: datasets/oxford_pets.py:144-190)."""
    ref_root = tmp_path / "ref_root"
    our_root = tmp_path / "our_root"
    build = BUILDERS["Caltech101"]
    build(ref_root)
    build(our_root)

    random.seed(3)
    ref_ds = ref_datasets["Caltech101"].Caltech101(
        _ref_config(ref_root, 2, 3, subsample=subsample)
    )
    random.seed(3)
    our_ds = build_dataset(
        _config(our_root, "Caltech101", shots=2, seed=3, subsample=subsample)
    )
    assert _snapshot(our_ds, our_root) == _snapshot(ref_ds, ref_root)
