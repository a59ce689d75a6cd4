"""Generic pytree checkpoint helpers (ref: utils/checkpoint.py).

The trainer lifecycle uses BaseTrainer.save_model/load_model; these
standalone helpers cover the reference's generic surface
(save/load/resume/pretrained-weights) for arbitrary pytrees, torch-free.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from clip_gp_tpu.models.clip_loader import _flatten, _unflatten


def save_checkpoint(
    state: Dict[str, Any],
    path: str,
    epoch: Optional[int] = None,
) -> None:
    """Save a pytree (+ optional epoch tag) as compressed npz. Any ``path``
    round-trips through :func:`load_checkpoint` — np.savez appends ``.npz``
    to suffix-less names, so both sides normalize."""
    path = _normalize(path)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    extra = {}
    if epoch is not None:
        extra["__epoch__"] = np.asarray(epoch)
    np.savez_compressed(path, **_flatten(state), **extra)


def _normalize(path: str) -> str:
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Optional[int]]:
    path = _normalize(path)
    with np.load(path, allow_pickle=False) as data:
        epoch = int(data["__epoch__"]) if "__epoch__" in data.files else None
        flat = {k: data[k] for k in data.files if k != "__epoch__"}
    return _unflatten(flat), epoch


def load_pretrained_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Overlay weights from a checkpoint onto ``params``, keeping shapes that
    match and warning on mismatches (the analog of the reference's
    strip-`module.`-prefix loader, ref: utils/checkpoint.py:12)."""
    loaded, _ = load_checkpoint(path)
    flat_params = _flatten(params)
    flat_loaded = _flatten(loaded)
    matched, skipped = 0, []
    for key, val in flat_loaded.items():
        if key in flat_params and flat_params[key].shape == val.shape:
            flat_params[key] = val
            matched += 1
        else:
            skipped.append(key)
    if skipped:
        print(f"Skipped {len(skipped)} mismatched keys: {skipped[:5]}...")
    print(f"Loaded {matched} arrays from {path}")
    return jax.tree.map(lambda x: x, _unflatten(flat_params))


def resume_from_checkpoint(ckpt_dir: str, prefix: str = "model.ckpt-"):
    """Find the latest checkpoint in a directory; returns (state, epoch) or
    (None, 0)."""
    import re

    d = Path(ckpt_dir)
    if not d.is_dir():
        return None, 0

    def _num(p: Path) -> int:
        m = re.search(r"(\d+)", p.stem)
        return int(m.group(1)) if m else -1  # digit-less names sort first

    cands = sorted(d.glob(f"{prefix}*.npz"), key=_num)
    if not cands:
        return None, 0
    state, epoch = load_checkpoint(str(cands[-1]))
    return state, epoch or 0
