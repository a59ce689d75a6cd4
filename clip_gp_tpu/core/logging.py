"""Run logging: console + ``<output_dir>/log.txt`` with stdout/stderr tee.

The tee matters for the sweep runner's skip-if-done contract — a trial is
considered complete when its ``log.txt`` exists (ref: utils/logging.py:11-66,
utils/hparam_search.py:220-227).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional, TextIO


class _Tee:
    def __init__(self, stream: TextIO, file_handle: TextIO):
        self._stream = stream
        self._file = file_handle

    def write(self, msg: str) -> int:
        n = self._stream.write(msg)
        try:
            self._file.write(msg)
        except ValueError:
            pass  # file already closed at interpreter teardown
        return n

    def flush(self) -> None:
        self._stream.flush()
        try:
            self._file.flush()
        except ValueError:
            pass

    def isatty(self) -> bool:
        return getattr(self._stream, "isatty", lambda: False)()

    def fileno(self):
        return self._stream.fileno()


_tee_handle: Optional[TextIO] = None


def setup_logger(output_dir: Optional[str] = None, name: str = "clip_gp_tpu"):
    """Create a logger; if ``output_dir`` is set, also tee stdout/stderr to log.txt."""
    global _tee_handle
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        console = logging.StreamHandler(sys.__stdout__)
        console.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(console)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        log_path = os.path.join(output_dir, "log.txt")
        # one FileHandler at a time: drop (and close) handlers from previous
        # in-process sweep trials
        for handler in list(logger.handlers):
            if isinstance(handler, logging.FileHandler):
                logger.removeHandler(handler)
                handler.close()
        fh = logging.FileHandler(log_path)
        fh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(fh)
        if _tee_handle is None or _tee_handle.name != log_path:
            _tee_handle = open(log_path, "a")
            sys.stdout = _Tee(sys.__stdout__, _tee_handle)
            sys.stderr = _Tee(sys.__stderr__, _tee_handle)
    return logger


def reset_tee() -> None:
    """Restore plain stdout/stderr (used between in-process sweep trials)."""
    global _tee_handle
    sys.stdout = sys.__stdout__
    sys.stderr = sys.__stderr__
    if _tee_handle is not None:
        try:
            _tee_handle.close()
        finally:
            _tee_handle = None
