"""Data layer: splits, few-shot caches, transforms, loaders on the synthetic
dataset fixture."""

import json
import os

import numpy as np
import pytest

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.datum import Datum, DatasetBase
from clip_gp_tpu.data.pipeline import build_data_manager
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.data.transforms import build_transform, device_preprocess
import clip_gp_tpu.data.datasets  # noqa: F401  (registers catalogs)


@pytest.fixture
def synth_config(tmp_path):
    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path)
    c.dataset.num_shots = 2
    c.dataloader.batch_size_train = 4
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.input.size = (32, 32)
    c.seed = 1
    return c


def test_dataset_splits_and_fewshot(synth_config):
    set_random_seed(1)
    dm = build_data_manager(synth_config)
    assert dm.num_classes == 4
    assert len(dm.dataset.train_x) == 4 * 2  # 2-shot
    assert len(dm.dataset.test) > 0
    assert sorted(dm.dataset.classnames) == sorted(
        ["red circle", "green square", "blue stripe", "yellow dot"]
    )
    # split JSON created with reference schema
    split_path = os.path.join(
        synth_config.dataset.root, "synthetic", "split_zhou_Synthetic.json"
    )
    with open(split_path) as f:
        split = json.load(f)
    assert set(split) == {"train", "val", "test"}
    assert len(split["train"][0]) == 3
    # few-shot pickle cache created and reused
    cache = os.path.join(
        synth_config.dataset.root,
        "synthetic",
        "split_fewshot",
        "shot_2-seed_1.pkl",
    )
    assert os.path.exists(cache)
    dm2 = build_data_manager(synth_config)
    assert [d.impath for d in dm2.dataset.train_x] == [
        d.impath for d in dm.dataset.train_x
    ]


def test_synthetic_variant_regeneration_atomic(synth_config):
    """Requesting a different synthetic variant replaces the tree, old
    marker, and split/few-shot caches together — an interrupted regeneration
    can then never leave a stale marker vouching for a mixed tree."""
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )

    set_random_seed(1)
    build_data_manager(synth_config)  # default 4-class tree + caches
    root = synth_config.dataset.root
    ds_root = os.path.join(root, "synthetic")
    image_dir = os.path.join(ds_root, "images")
    old_marker = os.path.join(image_dir, ".done_4_20_64")
    assert os.path.exists(old_marker)
    assert os.path.exists(os.path.join(ds_root, "split_zhou_Synthetic.json"))
    assert os.path.isdir(os.path.join(ds_root, "split_fewshot"))

    generate_synthetic_imagefolder(root, num_classes=6, fmt="jpg")
    # old marker + caches gone, new variant complete
    assert not os.path.exists(old_marker)
    assert os.path.exists(os.path.join(image_dir, ".done_6_20_64_jpg"))
    assert not os.path.exists(
        os.path.join(ds_root, "split_zhou_Synthetic.json")
    )
    assert not os.path.isdir(os.path.join(ds_root, "split_fewshot"))
    class_dirs = [d for d in os.listdir(image_dir) if not d.startswith(".")]
    assert len(class_dirs) == 6

    # the catalog rebuilds splits against the new tree (6 classes)
    set_random_seed(1)
    dm = build_data_manager(synth_config)
    assert dm.num_classes == 6


def test_batch_loader_shapes(synth_config):
    set_random_seed(1)
    dm = build_data_manager(synth_config)
    batch = next(iter(dm.test_loader))
    assert batch["img"].shape == (8, 32, 32, 3)
    assert batch["img"].dtype == np.uint8
    assert batch["label"].dtype == np.int32
    n = sum(b["img"].shape[0] for b in dm.test_loader)
    assert n == len(dm.dataset.test)


def test_device_preprocess(synth_config):
    x = np.full((2, 4, 4, 3), 128, dtype=np.uint8)
    out = np.asarray(device_preprocess(x))
    mean = np.array([0.48145466, 0.4578275, 0.40821073])
    std = np.array([0.26862954, 0.26130258, 0.27577711])
    expected = (128 / 255.0 - mean) / std
    np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-6)


def test_train_transform_size_and_dtype(synth_config):
    from PIL import Image

    set_random_seed(0)
    tfm = build_transform(synth_config, is_train=True)
    img = Image.new("RGB", (100, 80), (10, 20, 30))
    out = tfm(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
    tfm_test = build_transform(synth_config, is_train=False)
    out2 = tfm_test(img)
    assert out2.shape == (32, 32, 3)


def test_subsample_classes():
    items = [
        Datum(impath=f"x{label}.jpg", label=label, classname=f"c{label}")
        for label in range(5)
        for _ in range(2)
    ]
    (base,) = DatasetBase.subsample_classes(items, subsample="base")
    assert {d.label for d in base} == {0, 1, 2}  # ceil(5/2)=3 base classes
    (new,) = DatasetBase.subsample_classes(items, subsample="new")
    assert {d.label for d in new} == {0, 1}  # relabeled from classes 3,4
    assert sorted({d.classname for d in new}) == ["c3", "c4"]
    # a typo must not silently select the "new" split (reference asserts,
    # ref: datasets/oxford_pets.py:154)
    with pytest.raises(AssertionError):
        DatasetBase.subsample_classes(items, subsample="Base")


def test_random_state_snapshot_roundtrip():
    """get/set_random_state mirror the reference's snapshot API
    (ref: utils/reproducibility.py:42-59): restoring a snapshot must replay
    the exact same python AND numpy draws."""
    import random

    from clip_gp_tpu.core.seeding import (
        get_random_state,
        set_random_seed,
        set_random_state,
    )

    set_random_seed(7)
    snap = get_random_state()
    a = (random.random(), np.random.rand(3).tolist())
    set_random_state(snap)
    b = (random.random(), np.random.rand(3).tolist())
    assert a == b


def test_load_fewshot_accepts_train_only_pickle(tmp_path):
    """Reference ImageNet caches store {'train'} ONLY
    (ref: datasets/imagenet.py:36-45); loading one must return the train
    split and must NOT delete the user's file."""
    import pickle

    ds = DatasetBase.__new__(DatasetBase)  # no __init__ needed for the mixin
    train = [Datum(impath="a.jpg", label=0, classname="c0")]
    path = tmp_path / "shot_16-seed_1.pkl"
    with path.open("wb") as f:
        pickle.dump({"train": train}, f)
    loaded = ds.load_fewshot(str(tmp_path), 16, 1)
    assert loaded is not None
    assert [d.impath for d in loaded[0]] == ["a.jpg"]
    assert loaded[1] == []
    assert path.exists(), "reference-format cache must not be deleted"


def test_load_fewshot_odd_schema_raises_without_delete(tmp_path):
    """A LOADABLE pickle missing 'train' is a schema error, not cache
    corruption: it must raise (reference catches only load failures,
    ref: datasets/oxford_pets.py:46) and must NOT delete the user's file."""
    import pickle

    import pytest

    ds = DatasetBase.__new__(DatasetBase)
    path = tmp_path / "shot_16-seed_1.pkl"
    with path.open("wb") as f:
        pickle.dump({"not_train": []}, f)
    with pytest.raises(KeyError):
        ds.load_fewshot(str(tmp_path), 16, 1)
    assert path.exists(), "odd-schema cache must not be deleted"


def test_load_fewshot_corrupt_pickle_regenerates(tmp_path):
    """A genuinely unreadable pickle prints the reference's warning line and
    is deleted so the caller regenerates (ref: datasets/oxford_pets.py:46-52)."""
    ds = DatasetBase.__new__(DatasetBase)
    path = tmp_path / "shot_16-seed_1.pkl"
    path.write_bytes(b"\x80\x04 truncated garbage")
    assert ds.load_fewshot(str(tmp_path), 16, 1) is None
    assert not path.exists()


def test_templates():
    c = Config()
    c.adapter.num_templates = 1
    assert get_templates(c) == ["a photo of a {}."]
    c.adapter.num_templates = 8
    t = get_templates(c)
    assert len(t) == 8
    assert t[0] == "a photo of a {}."
    assert t[1] == "itap of a {}."
    c.adapter.num_templates = 20
    assert len(get_templates(c)) == 20
    c.adapter.use_custom_templates = True
    c.dataset.name = "EuroSAT"
    assert len(get_templates(c)) == 15
    assert "satellite" in get_templates(c)[0]


def test_stale_split_caches_cleared_even_without_image_tree(synth_config):
    """If a previous regeneration was interrupted after deleting images/ but
    before clearing caches (the old ordering), the next generation must still
    drop the stale split JSON — it indexes impaths that no longer exist."""
    import shutil

    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )

    set_random_seed(1)
    build_data_manager(synth_config)
    root = synth_config.dataset.root
    ds_root = os.path.join(root, "synthetic")
    shutil.rmtree(os.path.join(ds_root, "images"))  # simulate interruption
    assert os.path.exists(os.path.join(ds_root, "split_zhou_Synthetic.json"))

    generate_synthetic_imagefolder(root)
    assert not os.path.exists(
        os.path.join(ds_root, "split_zhou_Synthetic.json")
    )
    assert not os.path.isdir(os.path.join(ds_root, "split_fewshot"))


def test_resize_shortest_truncates_long_side():
    """torchvision's executed _compute_resized_output_size TRUNCATES the
    long side (int(size * long / short)) — 640x480 @ 224 must give 298,
    not round's 299 (found in review, 2026-08-18)."""
    from PIL import Image

    from clip_gp_tpu.data.transforms import resize_shortest

    img = Image.new("RGB", (640, 480))
    out = resize_shortest(img, 224, Image.BICUBIC)
    assert out.size == (298, 224)  # 224*640/480 = 298.67 -> 298
    img = Image.new("RGB", (480, 640))
    out = resize_shortest(img, 224, Image.BICUBIC)
    assert out.size == (224, 298)


def test_eval_loader_does_not_consume_global_random(synth_config):
    """Evaluation must not shift the run-seeded python `random` stream — in
    the reference, eval never touches it, so EVAL_FREQ / best_val / predict
    passes must not change later training augmentation draws (found in
    review, 2026-08-18). The train loader (random transform) MUST consume."""
    import random

    from clip_gp_tpu.data.pipeline import build_data_manager

    dm = build_data_manager(synth_config)

    random.seed(123)
    state0 = random.getstate()
    for _ in dm.test_loader:
        pass
    assert random.getstate() == state0, "eval pass consumed the global stream"

    for _ in dm.train_loader_x:
        break
    assert random.getstate() != state0, "train pass must consume the stream"
