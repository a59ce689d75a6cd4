"""Tracing / profiling hooks (SURVEY §5).

The reference has only AverageMeter batch timers and a wall-clock
``train_time_s`` (ref: trainers/adapter.py:704-757, utils/trainer.py:636).
Here:
- ``phase_timer``: named wall-clock phases, accumulated into a per-run report
  (feature extraction, GP fit, epochs, eval);
- ``maybe_trace``: wraps a block in a ``jax.profiler`` trace when
  ``CLIP_GP_TPU_PROFILE_DIR`` is set — inspect with TensorBoard's profiler
  plugin or xprof;
- ``annotate``: named TraceAnnotation so phases show up on the device
  timeline.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

_PHASE_TOTALS: Dict[str, float] = defaultdict(float)
_PHASE_COUNTS: Dict[str, int] = defaultdict(int)
# the sweep's group-parallel workers time same-named phases concurrently;
# an unguarded += would silently drop additions
_PHASE_LOCK = threading.Lock()


@contextlib.contextmanager
def phase_timer(name: str, verbose: bool = False) -> Iterator[None]:
    start = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - start
        with _PHASE_LOCK:
            _PHASE_TOTALS[name] += dt
            _PHASE_COUNTS[name] += 1
        if verbose:
            print(f"[profile] {name}: {dt:.3f}s")


def phase_report() -> Dict[str, Dict[str, float]]:
    return {
        name: {"total_s": total, "count": _PHASE_COUNTS[name]}
        for name, total in sorted(_PHASE_TOTALS.items())
    }


def reset_phases() -> None:
    _PHASE_TOTALS.clear()
    _PHASE_COUNTS.clear()


@contextlib.contextmanager
def maybe_trace(label: str = "run") -> Iterator[None]:
    """jax.profiler trace when CLIP_GP_TPU_PROFILE_DIR is set; no-op otherwise."""
    profile_dir = os.environ.get("CLIP_GP_TPU_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    out = os.path.join(profile_dir, label)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield
    print(f"[profile] jax trace written to {out}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Device-timeline annotation (shows up in xprof traces)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
