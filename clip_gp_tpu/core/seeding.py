"""Reproducibility: one seed feeds python/numpy RNGs and a JAX PRNG key tree.

The reference seeds python/numpy/torch globally (ref: utils/reproducibility.py:10).
In JAX randomness is explicit, so we keep a root `jax.random.key` per run and
derive named subkeys; host-side sampling (few-shot splits, epoch shuffles) uses
`random`/`numpy` exactly like the reference so split files stay compatible.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def get_random_state():
    """Snapshot host RNG states (ref: utils/reproducibility.py:42-59)."""
    return {"python": random.getstate(), "numpy": np.random.get_state()}


def set_random_state(state) -> None:
    random.setstate(state["python"])
    np.random.set_state(state["numpy"])


class KeySequence:
    """Deterministic stream of JAX PRNG keys derived from the run seed."""

    def __init__(self, seed: int):
        import jax

        self._key = jax.random.key(seed)
        self._jax = jax

    def next(self, n: int = 1):
        keys = self._jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return keys[1] if n == 1 else keys[1:]
