"""Fixture-driven tests for all 15 real dataset catalogs.

Each dataset gets a tiny generated directory tree (2-3 classes, a few images,
annotation files, .mat archives via scipy) so the path-convention code —
split building, split_zhou JSON round-trips, classname remaps, seeded
few-shot pickle caches with corrupt-cache regeneration, base/new subsampling
— is exercised without any real data (ref conventions:
datasets/oxford_pets.py:104-190, stanford_cars.py:11-60,
oxford_flowers.py:13-60, imagenet.py:26-50).
"""

import io
import json
import os
from pathlib import Path

import numpy as np
import pytest

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.core.registry import build_dataset
from clip_gp_tpu.core.seeding import set_random_seed
import clip_gp_tpu.data.datasets  # noqa: F401

# one tiny real JPEG reused for every fixture image
from PIL import Image

_buf = io.BytesIO()
Image.new("RGB", (8, 8), (120, 30, 200)).save(_buf, format="JPEG")
TINY_JPEG = _buf.getvalue()


def _write_images(directory, names):
    os.makedirs(directory, exist_ok=True)
    for name in names:
        with open(os.path.join(directory, name), "wb") as f:
            f.write(TINY_JPEG)


def _folder_per_class(image_dir, classes, n=8, ext=".jpg"):
    for c in classes:
        _write_images(
            os.path.join(image_dir, c), [f"im_{i:03d}{ext}" for i in range(n)]
        )


# ----------------------------------------------------------------------
# per-dataset fixture builders: (root) -> dict of expectations
# ----------------------------------------------------------------------

def build_oxford_pets(root):
    d = root / "oxford_pets"
    breeds = ["abyssinian", "bengal"]
    lines_tv, lines_te, images = [], [], []
    for label, breed in enumerate(breeds, start=1):
        for i in range(1, 9):
            imname = f"{breed}_{i}"
            images.append(imname + ".jpg")
            line = f"{imname} {label} 1 1"
            (lines_tv if i <= 6 else lines_te).append(line)
    os.makedirs(d / "annotations", exist_ok=True)
    (d / "annotations" / "trainval.txt").write_text("\n".join(lines_tv) + "\n")
    (d / "annotations" / "test.txt").write_text("\n".join(lines_te) + "\n")
    _write_images(d / "images", images)
    return {"dir": d, "classnames": set(breeds), "k": 2}


def build_caltech101(root):
    d = root / "caltech-101"
    _folder_per_class(
        d / "101_ObjectCategories",
        ["airplanes", "Faces", "BACKGROUND_Google", "Faces_easy"],
    )
    # BACKGROUND_Google / Faces_easy ignored; airplanes renamed
    return {"dir": d, "classnames": {"airplane", "face"}, "k": 2}


def build_dtd(root):
    d = root / "dtd"
    _folder_per_class(d / "images", ["banded", "blotchy"])
    return {"dir": d, "classnames": {"banded", "blotchy"}, "k": 2}


def build_eurosat(root):
    d = root / "eurosat"
    _folder_per_class(d / "2750", ["AnnualCrop", "Forest"])
    return {"dir": d, "classnames": {"Annual Crop Land", "Forest"}, "k": 2}


def build_food101(root):
    d = root / "food-101"
    _folder_per_class(d / "images", ["apple_pie", "baby_back_ribs"])
    return {"dir": d, "classnames": {"apple_pie", "baby_back_ribs"}, "k": 2}


def build_oxford_flowers(root):
    d = root / "oxford_flowers"
    # 16 images: 8 of class 1, 8 of class 2 (labels are 1-based)
    labels = np.array([[1] * 8 + [2] * 8], dtype=np.uint8)
    from scipy.io import savemat

    os.makedirs(d, exist_ok=True)
    savemat(str(d / "imagelabels.mat"), {"labels": labels})
    (d / "cat_to_name.json").write_text(
        json.dumps({"1": "pink primrose", "2": "hard-leaved pocket orchid"})
    )
    _write_images(
        d / "jpg", [f"image_{i:05d}.jpg" for i in range(1, 17)]
    )
    return {
        "dir": d,
        "classnames": {"pink primrose", "hard-leaved pocket orchid"},
        "k": 2,
    }


def build_fgvc_aircraft(root):
    d = root / "fgvc_aircraft"
    os.makedirs(d, exist_ok=True)
    variants = ["707-320", "A300B4"]
    (d / "variants.txt").write_text("\n".join(variants) + "\n")
    images = []
    for split, rng in (("train", range(0, 4)), ("val", range(4, 6)),
                       ("test", range(6, 8))):
        lines = []
        for v_i, v in enumerate(variants):
            for i in rng:
                imgid = f"{v_i}{i:06d}"
                images.append(imgid + ".jpg")
                lines.append(f"{imgid} {v}")
        (d / f"images_variant_{split}.txt").write_text("\n".join(lines) + "\n")
    _write_images(d / "images", images)
    return {"dir": d, "classnames": set(variants), "k": 2}


def build_stanford_cars(root):
    from scipy.io import savemat

    d = root / "stanford_cars"
    os.makedirs(d / "devkit", exist_ok=True)
    meta = np.zeros((1, 2), dtype=object)
    meta[0, 0] = np.array(["Audi TT 2012"])
    meta[0, 1] = np.array(["BMW M3 2014"])
    savemat(str(d / "devkit" / "cars_meta.mat"), {"class_names": meta})

    def annos_mat(path, n_per_class, prefix):
        n = n_per_class * 2
        annos = np.zeros((1, n), dtype=[("fname", "O"), ("class", "O")])
        names = []
        idx = 0
        for label in (1, 2):
            for i in range(n_per_class):
                fname = f"{prefix}_{label}_{i}.jpg"
                names.append(fname)
                annos[0, idx] = (np.array([fname]), np.array([[label]]))
                idx += 1
        savemat(str(path), {"annotations": annos})
        return names

    train_names = annos_mat(d / "devkit" / "cars_train_annos.mat", 6, "tr")
    test_names = annos_mat(d / "cars_test_annos_withlabels.mat", 2, "te")
    _write_images(d / "cars_train", train_names)
    _write_images(d / "cars_test", test_names)
    # classname convention: year moved to the front
    return {"dir": d, "classnames": {"2012 Audi TT", "2014 BMW M3"}, "k": 2}


def build_sun397(root):
    d = root / "sun397"
    os.makedirs(d, exist_ok=True)
    classes = ["/a/abbey", "/b/beach"]
    (d / "ClassName.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    for c in classes:
        rel = c[1:]  # "a/abbey"
        names = [f"sun_{i:04d}.jpg" for i in range(8)]
        _write_images(d / "SUN397" / rel, names)
        for i, name in enumerate(names):
            line = f"/{rel}/{name}"
            (train_lines if i < 6 else test_lines).append(line)
    (d / "Training_01.txt").write_text("\n".join(train_lines) + "\n")
    (d / "Testing_01.txt").write_text("\n".join(test_lines) + "\n")
    # classname drops the one-letter shard and reverses nested parts
    # (ref: datasets/sun397.py): "a/abbey" -> "abbey"
    return {"dir": d, "classnames": {"abbey", "beach"}, "k": 2}


def build_ucf101(root):
    d = root / "ucf101"
    os.makedirs(d / "ucfTrainTestlist", exist_ok=True)
    actions = ["ApplyEyeMakeup", "Archery"]
    renamed = ["Apply_Eye_Makeup", "Archery"]
    (d / "ucfTrainTestlist" / "classInd.txt").write_text(
        "".join(f"{i + 1} {a}\n" for i, a in enumerate(actions))
    )
    train_lines, test_lines = [], []
    for a, r in zip(actions, renamed):
        names = [f"v_{a}_{i:02d}" for i in range(8)]
        _write_images(d / "UCF-101-midframes" / r,
                      [n + ".jpg" for n in names])
        for i, n in enumerate(names):
            line = f"{a}/{n}.avi 1"
            (train_lines if i < 6 else test_lines).append(line)
    (d / "ucfTrainTestlist" / "trainlist01.txt").write_text(
        "\n".join(train_lines) + "\n"
    )
    (d / "ucfTrainTestlist" / "testlist01.txt").write_text(
        "\n".join(test_lines) + "\n"
    )
    return {"dir": d, "classnames": {"Apply_Eye_Makeup", "Archery"}, "k": 2}


def _imagenet_classnames(path, wnids_names):
    with open(path, "w") as f:
        for wnid, name in wnids_names:
            f.write(f"{wnid} {name}\n")


def build_imagenet(root):
    d = root / "imagenet"
    os.makedirs(d, exist_ok=True)
    wn = [("n01440764", "tench"), ("n01443537", "goldfish")]
    _imagenet_classnames(d / "classnames.txt", wn)
    for split, n in (("train", 6), ("val", 3)):
        for wnid, _ in wn:
            _write_images(
                d / "images" / split / wnid,
                [f"{wnid}_{i}.JPEG" for i in range(n)],
            )
    return {"dir": d, "classnames": {"tench", "goldfish"}, "k": 2}


def build_imagenetv2(root):
    d = root / "imagenetv2"
    os.makedirs(d, exist_ok=True)
    wn = [(f"n{i:08d}", f"class {i}") for i in range(1000)]
    _imagenet_classnames(d / "classnames.txt", wn)
    image_dir = d / "imagenetv2-matched-frequency-format-val"
    for label in range(1000):
        # numeric-label folders (ref: datasets/imagenetv2.py:31-45)
        cdir = image_dir / str(label)
        os.makedirs(cdir, exist_ok=True)
        with open(cdir / "0.jpeg", "wb") as f:
            f.write(TINY_JPEG)
    return {"dir": d, "classnames": {"class 0", "class 999"}, "k": 1000,
            "test_only": True}


def _build_variant(root, dataset_dir, image_subdir, readme=True):
    d = root / dataset_dir
    os.makedirs(d, exist_ok=True)
    wn = [("n01440764", "tench"), ("n01443537", "goldfish")]
    _imagenet_classnames(d / "classnames.txt", wn)
    for wnid, _ in wn:
        _write_images(d / image_subdir / wnid, [f"{wnid}_{i}.jpg" for i in range(3)])
    if readme:
        (d / image_subdir / "README.txt").write_text("ignored\n")
    return {"dir": d, "classnames": {"tench", "goldfish"}, "k": 2,
            "test_only": True}


def build_imagenet_a(root):
    return _build_variant(root, "imagenet-adversarial", "imagenet-a")


def build_imagenet_r(root):
    return _build_variant(root, "imagenet-rendition", "imagenet-r")


def build_imagenet_sketch(root):
    # no stray README here: the real imagenet-sketch archive has none, and
    # only the A/R reference loaders filter TO_BE_IGNORED (ref:
    # datasets/imagenet_a.py:7, imagenet_sketch.py:29-35 crashes on one) —
    # our uniform is_dir/README filtering is a robustness superset
    return _build_variant(root, "imagenet-sketch", "images", readme=False)


BUILDERS = {
    "OxfordPets": build_oxford_pets,
    "Caltech101": build_caltech101,
    "DescribableTextures": build_dtd,
    "EuroSAT": build_eurosat,
    "Food101": build_food101,
    "OxfordFlowers": build_oxford_flowers,
    "FGVCAircraft": build_fgvc_aircraft,
    "StanfordCars": build_stanford_cars,
    "SUN397": build_sun397,
    "UCF101": build_ucf101,
    "ImageNet": build_imagenet,
    "ImageNetV2": build_imagenetv2,
    "ImageNetA": build_imagenet_a,
    "ImageNetR": build_imagenet_r,
    "ImageNetSketch": build_imagenet_sketch,
}


def _config(root, name, shots=1, seed=1, subsample="all"):
    c = Config()
    c.dataset.name = name
    c.dataset.root = str(root)
    c.dataset.num_shots = shots
    c.dataset.subsample_classes = subsample
    c.seed = seed
    return c


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_catalog_load_fewshot_cache_and_subsample(tmp_path, name, capsys):
    exp = BUILDERS[name](tmp_path)
    set_random_seed(1)
    config = _config(tmp_path, name)
    ds = build_dataset(config)

    # --- split contents ---
    assert len(ds.train_x) > 0 and len(ds.test) > 0
    assert exp["classnames"] <= set(ds.classnames)
    assert ds.num_classes == exp["k"]
    for item in list(ds.train_x)[:4] + list(ds.test)[:4]:
        assert os.path.exists(item.impath), item.impath

    if exp.get("test_only"):
        return  # OOD variants: no split JSON / few-shot cache machinery

    # --- 1-shot sampling: exactly one train item per class ---
    labels = [i.label for i in ds.train_x]
    assert sorted(labels) == sorted(set(labels))

    # --- few-shot pickle cache round-trip ---
    cache = Path(exp["dir"]) / "split_fewshot" / "shot_1-seed_1.pkl"
    assert cache.exists()
    set_random_seed(1)
    ds2 = build_dataset(_config(tmp_path, name))
    assert [i.impath for i in ds2.train_x] == [i.impath for i in ds.train_x]

    # --- corrupt cache regenerates (ref: datasets/oxford_pets.py:39-60) ---
    cache.write_bytes(b"corrupt \x00 pickle")
    set_random_seed(1)
    capsys.readouterr()
    ds3 = build_dataset(_config(tmp_path, name))
    out = capsys.readouterr().out
    # reference log order on the corrupt path: "Loading ..." is printed
    # BEFORE the failed load, then the regen warning, then "Saving ..."
    # (ref: datasets/oxford_pets.py:41,47,58)
    i_load = out.index("Loading preprocessed few-shot data from")
    i_warn = out.index("Warning: Failed to load preprocessed data due to")
    i_save = out.index("Saving preprocessed few-shot data to")
    assert i_load < i_warn < i_save
    assert len(ds3.train_x) == len(ds.train_x)
    import pickle

    with cache.open("rb") as f:
        regenerated = pickle.load(f)  # must be a valid pickle again
    assert len(regenerated["train"]) == len(ds.train_x)

    # --- base/new subsampling with relabeling ---
    set_random_seed(1)
    base = build_dataset(_config(tmp_path, name, subsample="base"))
    set_random_seed(1)
    new = build_dataset(_config(tmp_path, name, subsample="new"))
    k = exp["k"]
    assert base.num_classes == (k + 1) // 2
    assert new.num_classes == k - (k + 1) // 2
    assert {i.label for i in base.train_x} == set(range(base.num_classes))


@pytest.mark.parametrize("name", ["Caltech101", "StanfordCars", "SUN397"])
def test_split_json_round_trip(tmp_path, name):
    """First build writes split_zhou_*.json; a rebuild must read it back to
    identical splits (paths stored relative to the image prefix)."""
    BUILDERS[name](tmp_path)
    set_random_seed(1)
    ds = build_dataset(_config(tmp_path, name, shots=-1))
    split_files = list(Path(str(tmp_path)).rglob("split_zhou_*.json"))
    assert len(split_files) == 1
    payload = json.loads(split_files[0].read_text())
    assert set(payload) == {"train", "val", "test"}
    # stored paths are relative (portability contract)
    assert not payload["test"][0][0].startswith("/")
    set_random_seed(99)  # a rebuild must NOT depend on RNG: it reads the JSON
    ds2 = build_dataset(_config(tmp_path, name, shots=-1, seed=99))
    assert [i.impath for i in ds2.test] == [i.impath for i in ds.test]
    assert [i.impath for i in ds2.train_x] == [i.impath for i in ds.train_x]


@pytest.mark.parametrize(
    "name", ["ImageNet", "ImageNetA", "ImageNetR", "ImageNetSketch"]
)
def test_imagenet_family_class_keys(tmp_path, name):
    """Label-ordered wnid keys (the exact cross-dataset remap identity —
    ImageNet classnames repeat, e.g. 'crane' twice)."""
    BUILDERS[name](tmp_path)
    set_random_seed(1)
    ds = build_dataset(_config(tmp_path, name))
    assert ds.class_keys == ["n01440764", "n01443537"]
    # keys align with the label order used for classnames
    assert ds.classnames == ["tench", "goldfish"]


def test_imagenet_class_keys_subsampled(tmp_path):
    BUILDERS["ImageNet"](tmp_path)
    set_random_seed(1)
    base = build_dataset(_config(tmp_path, "ImageNet", subsample="base"))
    assert base.class_keys == ["n01440764"]
    set_random_seed(1)
    new = build_dataset(_config(tmp_path, "ImageNet", subsample="new"))
    assert new.class_keys == ["n01443537"]


def test_imagenetv2_class_keys(tmp_path):
    BUILDERS["ImageNetV2"](tmp_path)
    set_random_seed(1)
    ds = build_dataset(_config(tmp_path, "ImageNetV2"))
    assert len(ds.class_keys) == 1000
    assert ds.class_keys[0] == "n00000000"
