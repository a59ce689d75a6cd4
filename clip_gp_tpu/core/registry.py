"""Name→factory registries for trainers and datasets.

Parity with the reference's decorator registries (ref: utils/trainer_registry.py,
utils/dataset_base.py:232-265), plus alias resolution for the legacy CLI names
(ref quirk §2.3.2: CLI choices like ``Adapter-TipA-F`` never matched registered
names; we accept both spellings).
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    # alias resolution lives in ONE place: core.config.TRAINER_ALIASES,
    # applied by build_trainer below (it also forces the Tip-Adapter-F
    # trainable flag) — the registry itself stays a plain name->factory map
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str):
        def deco(obj):
            if name in self._entries:
                raise KeyError(f"{self.kind} '{name}' already registered")
            self._entries[name] = obj
            return obj

        return deco

    def get(self, name: str):
        if name not in self._entries:
            known = sorted(self._entries)
            raise KeyError(f"Unknown {self.kind} '{name}'. Registered: {known}")
        return self._entries[name]

    def names(self):
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


TRAINER_REGISTRY = Registry("trainer")
DATASET_REGISTRY = Registry("dataset")


def build_trainer(config, data_manager):
    """Instantiate the trainer named by ``config.trainer_name``."""
    from clip_gp_tpu.core.config import TRAINER_ALIASES

    name = config.trainer_name
    resolved = TRAINER_ALIASES.get(name, name)
    # "Tip-Adapter-F" == Tip-Adapter with the trainable flag forced on.
    if resolved == "Tip-Adapter-F":
        config.adapter.tip_adapter_trainable = True
        resolved = "Tip-Adapter"
    cls = TRAINER_REGISTRY.get(resolved)
    return cls(config, data_manager)


def build_dataset(config):
    return DATASET_REGISTRY.get(config.dataset.name)(config)
