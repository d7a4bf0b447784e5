"""Stdout + file logging.

Capability parity with the reference's `utils.log`/`set_save_path`
(`/root/reference/utils.py:75-110`), plus standard `logging` integration.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOG_FILE: Optional[str] = None
_QUIET = False


def set_quiet(quiet: bool = True) -> None:
    """Silence `log` (multi-host: non-zero processes keep quiet so epoch
    lines and metrics are emitted once, by process 0)."""
    global _QUIET
    _QUIET = quiet


def set_log_file(path: str) -> None:
    global _LOG_FILE
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _LOG_FILE = path


def log(obj, filename: str = "log.txt") -> None:
    """Print and append to the configured log file. A non-default
    `filename` writes to that sibling file in the log directory instead —
    the reference's `utils.log(obj, filename)` semantics
    (`/root/reference/utils.py:78-82`)."""
    if _QUIET:
        return
    print(obj, flush=True)
    if _LOG_FILE is not None:
        path = (
            _LOG_FILE
            if filename == "log.txt"
            else os.path.join(os.path.dirname(_LOG_FILE) or ".", filename)
        )
        with open(path, "a") as f:
            print(obj, file=f)


def get_logger(name: str = "camouflaged_vlm_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
