"""Dataset primitives: Datum, DatasetBase, split IO, few-shot sampling.

File-format parity with the reference (ref: utils/dataset_base.py): the
``split_zhou_*.json`` split schema, the ``split_fewshot/shot_{n}-seed_{s}.pkl``
cache contract (with corrupt-cache regeneration), and python-``random``
few-shot sampling so same-seed runs match the reference's statistical
behavior.
"""

from __future__ import annotations

import json
import os
import pickle
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class Datum:
    impath: str
    label: int
    domain: str = ""
    classname: str = ""

    def __post_init__(self):
        if isinstance(self.impath, Path):
            self.impath = str(self.impath)


class DatasetBase:
    dataset_dir = ""

    def __init__(
        self,
        train_x: Optional[List[Datum]] = None,
        train_u: Optional[List[Datum]] = None,
        val: Optional[List[Datum]] = None,
        test: Optional[List[Datum]] = None,
    ):
        self._train_x = train_x or []
        self._train_u = train_u or []
        self._val = val or []
        self._test = test or []
        labels = {
            item.label
            for src in (self._train_x, self._train_u, self._val, self._test)
            for item in src
        }
        self._num_classes = len(labels)
        lab2cname: Dict[int, str] = {}
        for src in (self._train_x, self._train_u, self._val, self._test):
            for item in src:
                if item.label not in lab2cname and item.classname:
                    lab2cname[item.label] = item.classname
        self._lab2cname = lab2cname
        self._classnames = [lab2cname[i] for i in sorted(lab2cname)] if lab2cname else []

    train_x = property(lambda self: self._train_x)
    train_u = property(lambda self: self._train_u)
    val = property(lambda self: self._val)
    test = property(lambda self: self._test)
    lab2cname = property(lambda self: self._lab2cname)
    classnames = property(lambda self: self._classnames)
    num_classes = property(lambda self: self._num_classes)

    def generate_fewshot_dataset(
        self, data_source: List[Datum], num_shots: int = 1, repeat: bool = False
    ) -> List[Datum]:
        """Sample ``num_shots`` items per class with python ``random``
        (ref: utils/dataset_base.py:101-128)."""
        if num_shots < 1:
            return []
        groups: Dict[int, List[Datum]] = {}
        for item in data_source:
            groups.setdefault(item.label, []).append(item)
        result: List[Datum] = []
        for label, items in groups.items():
            if len(items) >= num_shots:
                sampled = random.sample(items, num_shots)
            else:
                sampled = items[:]
                if repeat:
                    while len(sampled) < num_shots:
                        sampled.extend(
                            random.choices(
                                items, k=min(len(items), num_shots - len(sampled))
                            )
                        )
            result.extend(sampled)
        return result

    def load_fewshot(
        self, split_fewshot_dir: str, num_shots: int, seed: int
    ) -> Optional[Tuple[List[Datum], List[Datum]]]:
        """Load the seeded few-shot pickle cache; None on miss/corruption
        (ref: datasets/oxford_pets.py:39-60)."""
        path = Path(split_fewshot_dir) / f"shot_{num_shots}-seed_{seed}.pkl"
        if not path.exists():
            return None
        # printed BEFORE the load attempt, like the reference — the line
        # appears even when the cache turns out corrupt and is regenerated
        # (ref: datasets/oxford_pets.py:41)
        print(f"Loading preprocessed few-shot data from {path}")
        try:
            with path.open("rb") as f:
                data = pickle.load(f)
        except Exception as e:
            # same warning line as the reference's corrupt-cache regen path
            # (ref: datasets/oxford_pets.py:47)
            print(
                f"Warning: Failed to load preprocessed data due to {e}. "
                "Regenerating..."
            )
            try:
                path.unlink()
            except OSError:
                pass
            return None
        # Outside the try: only genuine LOAD failures trigger the
        # delete-and-regenerate path above. A loadable pickle with an odd
        # schema (e.g. a user-prepared cache missing "train") raises here
        # instead of silently destroying the file. Reference ImageNet caches
        # store {"train"} ONLY (ref: datasets/imagenet.py:36-45) — a missing
        # "val" key is a valid reference artifact, not corruption.
        return data["train"], data.get("val", [])

    def save_fewshot(
        self,
        split_fewshot_dir: str,
        num_shots: int,
        seed: int,
        train: List[Datum],
        val: Optional[List[Datum]],
    ) -> None:
        """``val=None`` writes a ``{"train"}``-only pickle — the exact
        artifact the reference's ImageNet loader produces (ref:
        datasets/imagenet.py:36-45); every other catalog stores both keys
        (ref: datasets/oxford_pets.py:54-60)."""
        mkdir_if_missing(split_fewshot_dir)
        path = Path(split_fewshot_dir) / f"shot_{num_shots}-seed_{seed}.pkl"
        # same log line as the reference (ref: datasets/oxford_pets.py:58)
        print(f"Saving preprocessed few-shot data to {path}")
        payload = {"train": train} if val is None else {"train": train, "val": val}
        with path.open("wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def read_json(file_path: str) -> Any:
        with open(file_path) as f:
            return json.load(f)

    @staticmethod
    def write_json(obj: Any, file_path: str) -> None:
        mkdir_if_missing(os.path.dirname(file_path))
        with open(file_path, "w") as f:
            json.dump(obj, f, indent=4, separators=(",", ": "))

    @staticmethod
    def read_split(
        split_path: str, path_prefix: str = ""
    ) -> Tuple[List[Datum], List[Datum], List[Datum]]:
        """split_zhou JSON: {"train"|"val"|"test": [[impath, label, classname]]}."""

        def convert(items):
            return [
                Datum(
                    impath=os.path.join(path_prefix, impath) if path_prefix else impath,
                    label=int(label),
                    classname=str(classname),
                )
                for impath, label, classname in items
            ]

        # same log line as the reference (ref: datasets/oxford_pets.py:137,
        # utils/dataset_base.py:154)
        print(f"Reading split from {split_path}")
        split = DatasetBase.read_json(split_path)
        return convert(split["train"]), convert(split["val"]), convert(split["test"])

    @staticmethod
    def save_split(
        train: List[Datum],
        val: List[Datum],
        test: List[Datum],
        split_path: str,
        path_prefix: str = "",
    ) -> None:
        def extract(src):
            out = []
            for item in src:
                impath = item.impath
                if path_prefix and impath.startswith(path_prefix):
                    impath = os.path.relpath(impath, path_prefix)
                out.append([impath, item.label, item.classname])
            return out

        DatasetBase.write_json(
            {"train": extract(train), "val": extract(val), "test": extract(test)},
            split_path,
        )
        # same log line as the reference (ref: datasets/oxford_pets.py:125,
        # utils/dataset_base.py:182)
        print(f"Saved split to {split_path}")

    @staticmethod
    def subsample_classes(
        *splits: List[Datum], subsample: str = "all"
    ) -> List[List[Datum]]:
        """Keep all / first-half ("base") / second-half ("new") classes with
        relabeling (ref: datasets/oxford_pets.py:150-190)."""
        # same assert as the reference (oxford_pets.py:154) — a typo'd value
        # must not silently select the "new" split
        assert subsample in ("all", "base", "new"), (
            f"SUBSAMPLE_CLASSES must be all|base|new, got {subsample!r}"
        )
        if subsample == "all":
            return list(splits)
        labels = sorted({item.label for item in splits[0]})
        m = (len(labels) + 1) // 2  # base takes the larger half on odd counts
        selected = labels[:m] if subsample == "base" else labels[m:]
        relabeler = {y: i for i, y in enumerate(selected)}
        out = []
        for split in splits:
            out.append(
                [
                    Datum(
                        impath=item.impath,
                        label=relabeler[item.label],
                        classname=item.classname,
                    )
                    for item in split
                    if item.label in relabeler
                ]
            )
        return out


def listdir_nohidden(path: str, sort: bool = True) -> List[str]:
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    if sort:
        items.sort()
    return items


def mkdir_if_missing(dirname: str) -> None:
    if dirname and not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)


def read_and_split_data(
    image_dir: str,
    p_trn: float = 0.5,
    p_val: float = 0.2,
    ignored: Optional[List[str]] = None,
    new_cnames: Optional[Dict[str, str]] = None,
) -> Tuple[List[Datum], List[Datum], List[Datum]]:
    """Generic folder-per-class splitter, 50/20/30 by default
    (ref: datasets/dtd.py:66-...)."""
    categories = [
        c for c in listdir_nohidden(image_dir) if not ignored or c not in ignored
    ]
    categories.sort()
    p_tst = 1 - p_trn - p_val
    print(f"Splitting into {p_trn:.0%} train, {p_val:.0%} val, and {p_tst:.0%} test")
    train, val, test = [], [], []
    for label, category in enumerate(categories):
        category_dir = os.path.join(image_dir, category)
        images = listdir_nohidden(category_dir)
        images = [os.path.join(category_dir, im) for im in images]
        random.shuffle(images)
        n_total = len(images)
        n_train = round(n_total * p_trn)
        n_val = round(n_total * p_val)
        cname = new_cnames.get(category, category) if new_cnames else category

        def datums(paths):
            return [Datum(impath=p, label=label, classname=cname) for p in paths]

        train.extend(datums(images[:n_train]))
        val.extend(datums(images[n_train : n_train + n_val]))
        test.extend(datums(images[n_train + n_val :]))
    return train, val, test
