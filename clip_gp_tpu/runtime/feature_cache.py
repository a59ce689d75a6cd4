"""Disk cache for deterministic frozen-tower features.

In a sweep, the same test/val split is re-encoded by every trial (the
reference re-extracts per subprocess: 5 seeds × 6 shot counts = 30 identical
test-set passes per dataset). Eval-split features are deterministic
(shortest-side resize + center crop, no augmentation), so they are cached on
disk keyed by (backbone, weights identity, input size, split content) and
every subsequent trial loads [N, D] float32 instead of running the tower.

Train-split features are NOT cached: the reference applies random
augmentation in its one extraction pass per run, so caching would freeze
augmentation across trials and change semantics.

Enable with ``CLIP_GP_TPU_FEATURE_CACHE=<dir>`` (or "1" for the default
``~/.cache/clip_gp_tpu/features``).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


def cache_dir() -> Optional[Path]:
    value = os.environ.get("CLIP_GP_TPU_FEATURE_CACHE")
    if not value:
        return None
    if value == "1":
        return Path.home() / ".cache" / "clip_gp_tpu" / "features"
    return Path(value)


def split_fingerprint(impaths: List[str], labels: List[int]) -> str:
    h = hashlib.sha256()
    for p, y in zip(impaths, labels):
        h.update(p.encode())
        h.update(str(y).encode())
    return h.hexdigest()[:20]


def cache_key(config, split_items, weights_tag: str) -> str:
    impaths = [it.impath for it in split_items]
    labels = [it.label for it in split_items]
    norm = hashlib.sha256(
        repr((tuple(config.input.pixel_mean), tuple(config.input.pixel_std))).encode()
    ).hexdigest()[:8]
    parts = [
        config.model.backbone_name.replace("/", "-"),
        weights_tag,
        f"{config.input.size[0]}x{config.input.size[1]}",
        config.input.interpolation,
        norm,
        split_fingerprint(impaths, labels),
    ]
    return "_".join(parts)


def load(key: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    d = cache_dir()
    if d is None:
        return None
    path = d / f"{key}.npz"
    if not path.exists():
        return None
    try:
        with np.load(path, allow_pickle=False) as data:
            return data["labels"], data["features"]
    except Exception:
        try:
            path.unlink()
        except OSError:
            pass
        return None


def store(key: str, labels: np.ndarray, features: np.ndarray) -> None:
    d = cache_dir()
    if d is None:
        return
    d.mkdir(parents=True, exist_ok=True)
    # write via handle: np.savez would append ".npz" to a bare temp name
    tmp = d / f"{key}.tmp.{os.getpid()}"
    with tmp.open("wb") as f:
        np.savez_compressed(f, labels=labels, features=features)
    tmp.replace(d / f"{key}.npz")
