"""Persistent XLA compile-cache setup shared by every CLI/bench entry.

First compile over the tunneled backend is slow (~20-40 s); the on-disk
cache makes every later process start warm. Disable with
``CLIP_GP_TPU_NO_COMPILE_CACHE=1`` (e.g. to measure cold compiles).
"""

from __future__ import annotations

import os


def enable(min_compile_secs: float = 0.5) -> None:
    """Point jax at the shared on-disk compilation cache (best-effort)."""
    if os.environ.get("CLIP_GP_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "CLIP_GP_TPU_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/clip_gp_tpu/xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
