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
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

# In-process memo, always on for cacheable (deterministic eval) splits: a
# sweep backend runs many trial groups in ONE process and consecutive groups
# share a dataset, so the test set is encoded once per dataset instead of
# once per (dataset, shots) group. Small LRU — entries are [N, D] float32
# (the largest, ImageNet-val, is ~100 MB).
_MEMO: "OrderedDict[str, Tuple[np.ndarray, np.ndarray]]" = OrderedDict()
_MEMO_MAX_ENTRIES = 4
# the vmap sweep backend runs trial groups on concurrent worker threads
_MEMO_LOCK = threading.Lock()


def memo_get(key: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    with _MEMO_LOCK:
        hit = _MEMO.get(key)
        if hit is not None:
            _MEMO.move_to_end(key)
        return hit


def memo_put(key: str, labels: np.ndarray, features: np.ndarray) -> None:
    with _MEMO_LOCK:
        _MEMO[key] = (labels, features)
        _MEMO.move_to_end(key)
        while len(_MEMO) > _MEMO_MAX_ENTRIES:
            _MEMO.popitem(last=False)


def memo_clear() -> None:
    with _MEMO_LOCK:
        _MEMO.clear()


# per-key in-flight locks: when concurrent sweep workers miss the memo for
# the same split simultaneously, the second waits for the first's encode
# instead of duplicating a full frozen-tower pass
_INFLIGHT: Dict[str, "threading.Lock"] = {}


def inflight_lock(key: str) -> "threading.Lock":
    with _MEMO_LOCK:
        lk = _INFLIGHT.get(key)
        if lk is None:
            lk = _INFLIGHT[key] = threading.Lock()
        return lk


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


def cache_key(
    config,
    split_items,
    weights_tag: str,
    *,
    int8: Optional[bool] = None,
    int8_fused: Optional[bool] = None,
    shard_devices: int = 0,
) -> str:
    """Disk/memo key for one (weights, preprocessing, split) extraction.

    ``int8``: whether the int8 tower will ACTUALLY encode this split — pass
    the effective decision (flag AND arch support), not the raw config flag,
    so a bf16 fallback is never stored under an int8 label. ``None`` falls
    back to the raw flag for callers without an arch in hand.

    ``int8_fused``: which int8 tower — the fused Pallas kernels (``int8``
    label, the TPU default) or the XLA fallback (``int8xla``). The two
    quantize the attention output differently (per-head vs per-token scales),
    so their features are NOT interchangeable — far beyond ULP. ``None``
    resolves via ``flash_attention.use_flash()``, the same default
    ``encode_image_q8`` uses.

    ``shard_devices``: >1 when extraction auto-shards over a local device
    mesh. Sharded and single-device executables may differ at ULP level, so
    entries of different provenance must not alias (the repo's bit-identical
    reproducibility contract); unsharded keys keep the historical format.
    """
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
    # int8-encoded features are NOT interchangeable with bf16 ones
    if int8 is None:
        int8 = getattr(config.model, "int8_inference", False)
    if int8:
        if int8_fused is None:
            from clip_gp_tpu.ops.flash_attention import use_flash

            int8_fused = use_flash()
        parts.append("int8" if int8_fused else "int8xla")
    if shard_devices and shard_devices > 1:
        parts.append(f"dp{shard_devices}")
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
