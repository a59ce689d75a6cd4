"""The 15 dataset catalogs (11 few-shot benchmarks + 4 ImageNet OOD variants).

Directory/file conventions, split JSON names, few-shot pickle caches, and
classname remappings match the reference loaders (ref: datasets/*.py) so that
existing on-disk dataset preparations and split files work unchanged. The
per-dataset boilerplate (split → few-shot cache → subsample) is factored into
``StandardFewShotDataset`` instead of being copy-pasted 11 times.

Also registers ``Synthetic`` — an on-the-fly generated image-folder dataset
used by tests and benchmarks (no downloads in this environment).
"""

from __future__ import annotations

import os
import random
import re
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Tuple

from clip_gp_tpu.core.registry import DATASET_REGISTRY
from clip_gp_tpu.data.datum import (
    DatasetBase,
    Datum,
    listdir_nohidden,
    mkdir_if_missing,
    read_and_split_data,
)


def split_trainval(trainval: List[Datum]) -> Tuple[List[Datum], List[Datum]]:
    """50/50 random per-class split (ref: datasets/oxford_pets.py:88-102)."""
    per_class: Dict[int, List[Datum]] = defaultdict(list)
    for item in trainval:
        per_class[item.label].append(item)
    train, val = [], []
    for label, items in per_class.items():
        n_train = round(len(items) * 0.5)
        assert n_train > 0
        random.shuffle(items)
        train.extend(items[:n_train])
        val.extend(items[n_train:])
    return train, val


class StandardFewShotDataset(DatasetBase):
    """Shared skeleton: resolve split → seeded few-shot cache → subsample."""

    dataset_dir = ""

    def __init__(self, config):
        root = os.path.abspath(os.path.expanduser(config.dataset.root))
        self.root = os.path.join(root, self.dataset_dir)
        self.split_fewshot_dir = os.path.join(self.root, "split_fewshot")
        mkdir_if_missing(self.split_fewshot_dir)

        train, val, test = self._load_splits(config)

        num_shots = config.dataset.num_shots
        if num_shots >= 1:
            cached = self.load_fewshot(self.split_fewshot_dir, num_shots, config.seed)
            if cached is not None:
                train, val = cached
            else:
                train = self.generate_fewshot_dataset(train, num_shots=num_shots)
                val = self.generate_fewshot_dataset(val, num_shots=min(num_shots, 4))
                self.save_fewshot(
                    self.split_fewshot_dir, num_shots, config.seed, train, val
                )

        subsample = getattr(config.dataset, "subsample_classes", "all")
        train, val, test = self.subsample_classes(
            train, val, test, subsample=subsample
        )
        super().__init__(train_x=train, val=val, test=test)

    # subclasses return (train, val, test)
    def _load_splits(self, config):
        raise NotImplementedError


class _SplitJsonDataset(StandardFewShotDataset):
    """Datasets driven by a split_zhou JSON over an image folder."""

    split_json = ""
    image_subdir = "images"
    ignored: Optional[List[str]] = None
    new_cnames: Optional[Dict[str, str]] = None

    def _load_splits(self, config):
        image_dir = os.path.join(self.root, self.image_subdir)
        split_path = os.path.join(self.root, self.split_json)
        if os.path.exists(split_path):
            return self.read_split(split_path, image_dir)
        train, val, test = self._build_splits(image_dir)
        self.save_split(train, val, test, split_path, image_dir)
        return train, val, test

    def _build_splits(self, image_dir):
        return read_and_split_data(
            image_dir, ignored=self.ignored, new_cnames=self.new_cnames
        )


@DATASET_REGISTRY.register("OxfordPets")
class OxfordPets(_SplitJsonDataset):
    dataset_dir = "oxford_pets"
    split_json = "split_zhou_OxfordPets.json"

    def _build_splits(self, image_dir):
        trainval = self._read_annos("trainval.txt")
        test = self._read_annos("test.txt")
        train, val = split_trainval(trainval)
        return train, val, test

    def _read_annos(self, split_file):
        items = []
        with open(os.path.join(self.root, "annotations", split_file)) as f:
            for line in f:
                imname, label, _species, _ = line.strip().split(" ")
                breed = "_".join(imname.split("_")[:-1]).lower()
                items.append(
                    Datum(
                        impath=os.path.join(self.root, "images", imname + ".jpg"),
                        label=int(label) - 1,
                        classname=breed,
                    )
                )
        return items


@DATASET_REGISTRY.register("Caltech101")
class Caltech101(_SplitJsonDataset):
    dataset_dir = "caltech-101"
    split_json = "split_zhou_Caltech101.json"
    image_subdir = "101_ObjectCategories"
    ignored = ["BACKGROUND_Google", "Faces_easy"]
    new_cnames = {
        "airplanes": "airplane",
        "Faces": "face",
        "Leopards": "leopard",
        "Motorbikes": "motorbike",
    }


@DATASET_REGISTRY.register("DescribableTextures")
class DescribableTextures(_SplitJsonDataset):
    dataset_dir = "dtd"
    split_json = "split_zhou_DescribableTextures.json"


@DATASET_REGISTRY.register("EuroSAT")
class EuroSAT(_SplitJsonDataset):
    dataset_dir = "eurosat"
    split_json = "split_zhou_EuroSAT.json"
    image_subdir = "2750"
    new_cnames = {
        "AnnualCrop": "Annual Crop Land",
        "Forest": "Forest",
        "HerbaceousVegetation": "Herbaceous Vegetation Land",
        "Highway": "Highway or Road",
        "Industrial": "Industrial Buildings",
        "Pasture": "Pasture Land",
        "PermanentCrop": "Permanent Crop Land",
        "Residential": "Residential Buildings",
        "River": "River",
        "SeaLake": "Sea or Lake",
    }


@DATASET_REGISTRY.register("Food101")
class Food101(_SplitJsonDataset):
    dataset_dir = "food-101"
    split_json = "split_zhou_Food101.json"


@DATASET_REGISTRY.register("OxfordFlowers")
class OxfordFlowers(_SplitJsonDataset):
    dataset_dir = "oxford_flowers"
    split_json = "split_zhou_OxfordFlowers.json"
    image_subdir = "jpg"

    def _build_splits(self, image_dir):
        from scipy.io import loadmat

        labels = loadmat(os.path.join(self.root, "imagelabels.mat"))["labels"][0]
        lab2cname = self.read_json(os.path.join(self.root, "cat_to_name.json"))
        tracker: Dict[int, List[str]] = defaultdict(list)
        for i, label in enumerate(labels):
            tracker[int(label)].append(
                os.path.join(image_dir, f"image_{str(i + 1).zfill(5)}.jpg")
            )
        train, val, test = [], [], []
        for label, impaths in tracker.items():
            random.shuffle(impaths)
            n = len(impaths)
            n_train, n_val = round(n * 0.5), round(n * 0.2)
            cname = lab2cname[str(label)]

            def datums(paths):
                return [
                    Datum(impath=p, label=label - 1, classname=cname) for p in paths
                ]

            train.extend(datums(impaths[:n_train]))
            val.extend(datums(impaths[n_train : n_train + n_val]))
            test.extend(datums(impaths[n_train + n_val :]))
        return train, val, test


@DATASET_REGISTRY.register("FGVCAircraft")
class FGVCAircraft(StandardFewShotDataset):
    dataset_dir = "fgvc_aircraft"

    def _load_splits(self, config):
        with open(os.path.join(self.root, "variants.txt")) as f:
            classnames = [line.strip() for line in f]
        cname2lab = {c: i for i, c in enumerate(classnames)}
        return (
            self._read_annos(cname2lab, "images_variant_train.txt"),
            self._read_annos(cname2lab, "images_variant_val.txt"),
            self._read_annos(cname2lab, "images_variant_test.txt"),
        )

    def _read_annos(self, cname2lab, split_file):
        items = []
        with open(os.path.join(self.root, split_file)) as f:
            for line in f:
                parts = line.strip().split(" ")
                classname = " ".join(parts[1:])
                items.append(
                    Datum(
                        impath=os.path.join(self.root, "images", parts[0] + ".jpg"),
                        label=cname2lab[classname],
                        classname=classname,
                    )
                )
        return items


@DATASET_REGISTRY.register("StanfordCars")
class StanfordCars(_SplitJsonDataset):
    dataset_dir = "stanford_cars"
    split_json = "split_zhou_StanfordCars.json"
    image_subdir = ""  # split paths are relative to the dataset root

    def _build_splits(self, image_dir):
        trainval = self._read_annos(
            "cars_train",
            os.path.join(self.root, "devkit", "cars_train_annos.mat"),
        )
        test = self._read_annos(
            "cars_test", os.path.join(self.root, "cars_test_annos_withlabels.mat")
        )
        train, val = split_trainval(trainval)
        return train, val, test

    def _read_annos(self, image_dir, anno_file):
        from scipy.io import loadmat

        annos = loadmat(anno_file)["annotations"][0]
        meta = loadmat(os.path.join(self.root, "devkit", "cars_meta.mat"))[
            "class_names"
        ][0]
        items = []
        for anno in annos:
            label = int(anno["class"][0, 0]) - 1
            names = meta[label][0].split(" ")
            year = names.pop(-1)
            classname = " ".join([year] + names)
            items.append(
                Datum(
                    impath=os.path.join(self.root, image_dir, anno["fname"][0]),
                    label=label,
                    classname=classname,
                )
            )
        return items


@DATASET_REGISTRY.register("SUN397")
class SUN397(_SplitJsonDataset):
    dataset_dir = "sun397"
    split_json = "split_zhou_SUN397.json"
    image_subdir = "SUN397"

    def _build_splits(self, image_dir):
        with open(os.path.join(self.root, "ClassName.txt")) as f:
            classnames = [line.strip()[1:] for line in f]
        cname2lab = {c: i for i, c in enumerate(classnames)}
        trainval = self._read_annos(cname2lab, "Training_01.txt")
        test = self._read_annos(cname2lab, "Testing_01.txt")
        train, val = split_trainval(trainval)
        return train, val, test

    def _read_annos(self, cname2lab, text_file):
        items = []
        with open(os.path.join(self.root, text_file)) as f:
            for line in f:
                imname = line.strip()[1:]
                classname = os.path.dirname(imname)
                label = cname2lab[classname]
                names = classname.split("/")[1:][::-1]
                items.append(
                    Datum(
                        impath=os.path.join(self.root, "SUN397", imname),
                        label=label,
                        classname=" ".join(names),
                    )
                )
        return items


@DATASET_REGISTRY.register("UCF101")
class UCF101(_SplitJsonDataset):
    dataset_dir = "ucf101"
    split_json = "split_zhou_UCF101.json"
    image_subdir = "UCF-101-midframes"

    def _build_splits(self, image_dir):
        cname2lab = {}
        with open(
            os.path.join(self.root, "ucfTrainTestlist", "classInd.txt")
        ) as f:
            for line in f:
                label, classname = line.strip().split(" ")
                cname2lab[classname] = int(label) - 1
        trainval = self._read_annos(cname2lab, "ucfTrainTestlist/trainlist01.txt")
        test = self._read_annos(cname2lab, "ucfTrainTestlist/testlist01.txt")
        train, val = split_trainval(trainval)
        return train, val, test

    def _read_annos(self, cname2lab, text_file):
        items = []
        with open(os.path.join(self.root, text_file)) as f:
            for line in f:
                line = line.strip().split(" ")[0]
                action, filename = line.split("/")
                renamed = "_".join(re.findall("[A-Z][^A-Z]*", action))
                items.append(
                    Datum(
                        impath=os.path.join(
                            self.root,
                            "UCF-101-midframes",
                            renamed,
                            filename.replace(".avi", ".jpg"),
                        ),
                        label=cname2lab[action],
                        classname=renamed,
                    )
                )
        return items


def read_imagenet_classnames(text_file: str) -> "OrderedDict[str, str]":
    """<wnid folder> → <classname> map (ref: datasets/imagenet.py:52-66)."""
    classnames = OrderedDict()
    with open(text_file) as f:
        for line in f:
            parts = line.strip().split(" ")
            classnames[parts[0]] = " ".join(parts[1:])
    return classnames


def _scan_folder_dataset(image_dir, classnames, ignored=()):
    """Returns (items, folders): folders are the label-ordered wnids — the
    unique per-class keys cross-dataset checkpoint remapping prefers over
    classnames (ImageNet classnames repeat, e.g. 'crane' twice)."""
    folders = [f for f in listdir_nohidden(image_dir) if f not in ignored]
    items = []
    for label, folder in enumerate(folders):
        cname = classnames[folder]
        for imname in listdir_nohidden(os.path.join(image_dir, folder)):
            items.append(
                Datum(
                    impath=os.path.join(image_dir, folder, imname),
                    label=label,
                    classname=cname,
                )
            )
    return items, folders


@DATASET_REGISTRY.register("ImageNet")
class ImageNet(DatasetBase):
    dataset_dir = "imagenet"

    def __init__(self, config):
        root = os.path.abspath(os.path.expanduser(config.dataset.root))
        self.root = os.path.join(root, self.dataset_dir)
        self.split_fewshot_dir = os.path.join(self.root, "split_fewshot")
        mkdir_if_missing(self.split_fewshot_dir)
        classnames = read_imagenet_classnames(
            os.path.join(self.root, "classnames.txt")
        )
        train, keys = self._read_split_dir(classnames, "train")
        # standard practice: evaluate on the val set, reused as both val+test
        test, _ = self._read_split_dir(classnames, "val")

        num_shots = config.dataset.num_shots
        if num_shots >= 1:
            cached = self.load_fewshot(self.split_fewshot_dir, num_shots, config.seed)
            if cached is not None:
                train = cached[0]
            else:
                train = self.generate_fewshot_dataset(train, num_shots=num_shots)
                # {"train"}-only pickle, byte-schema-identical to the
                # reference's ImageNet cache (ref: datasets/imagenet.py:36-45)
                self.save_fewshot(
                    self.split_fewshot_dir, num_shots, config.seed, train, None
                )

        subsample = getattr(config.dataset, "subsample_classes", "all")
        if subsample != "all" and keys is not None:
            # mirror subsample_classes' base/new label selection on the keys
            labels = sorted({item.label for item in train})
            m = (len(labels) + 1) // 2
            selected = labels[:m] if subsample == "base" else labels[m:]
            keys = [keys[y] for y in selected]
        train, test = self.subsample_classes(train, test, subsample=subsample)
        super().__init__(train_x=train, val=test, test=test)
        self.class_keys = keys  # label-ordered wnids (unique remap keys)

    def _read_split_dir(self, classnames, split):
        split_dir = os.path.join(self.root, "images", split)
        folders = sorted(f.name for f in os.scandir(split_dir) if f.is_dir())
        items = []
        for label, folder in enumerate(folders):
            cname = classnames[folder]
            for imname in listdir_nohidden(os.path.join(split_dir, folder)):
                items.append(
                    Datum(
                        impath=os.path.join(split_dir, folder, imname),
                        label=label,
                        classname=cname,
                    )
                )
        return items, folders


class _ImageNetVariant(DatasetBase):
    """Test-only OOD variants: the scan doubles as train_x and test."""

    dataset_dir = ""
    image_subdir = ""
    ignored = ("README.txt",)

    def __init__(self, config):
        root = os.path.abspath(os.path.expanduser(config.dataset.root))
        self.root = os.path.join(root, self.dataset_dir)
        classnames = read_imagenet_classnames(
            os.path.join(self.root, "classnames.txt")
        )
        data, keys = self._read(classnames)
        super().__init__(train_x=data, test=data)
        self.class_keys = keys  # label-ordered wnids (unique remap keys)

    def _read(self, classnames):
        return _scan_folder_dataset(
            os.path.join(self.root, self.image_subdir), classnames, self.ignored
        )


@DATASET_REGISTRY.register("ImageNetV2")
class ImageNetV2(_ImageNetVariant):
    dataset_dir = "imagenetv2"
    image_subdir = "imagenetv2-matched-frequency-format-val"

    def _read(self, classnames):
        # folders are numeric labels 0..999 (ref: datasets/imagenetv2.py:31-45)
        image_dir = os.path.join(self.root, self.image_subdir)
        folders = list(classnames.keys())
        items = []
        for label in range(1000):
            class_dir = os.path.join(image_dir, str(label))
            cname = classnames[folders[label]]
            for imname in listdir_nohidden(class_dir):
                items.append(
                    Datum(
                        impath=os.path.join(class_dir, imname),
                        label=label,
                        classname=cname,
                    )
                )
        return items, folders


@DATASET_REGISTRY.register("ImageNetA")
class ImageNetA(_ImageNetVariant):
    dataset_dir = "imagenet-adversarial"
    image_subdir = "imagenet-a"


@DATASET_REGISTRY.register("ImageNetR")
class ImageNetR(_ImageNetVariant):
    dataset_dir = "imagenet-rendition"
    image_subdir = "imagenet-r"


@DATASET_REGISTRY.register("ImageNetSketch")
class ImageNetSketch(_ImageNetVariant):
    dataset_dir = "imagenet-sketch"
    image_subdir = "images"
