"""Logging + progress helpers (reference /root/reference/vipe/utils/logging.py)."""

from __future__ import annotations

import logging
import sys

disable_progress_bar = False

_LOGGER = None


def configure_logging(level=logging.INFO):
    """tqdm-friendly "vipe" logger detached from root (reference :24-46)."""
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger("vipe_tpu")
    logger.setLevel(level)
    logger.propagate = False
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s")
    )
    logger.addHandler(handler)
    _LOGGER = logger
    return logger


def get_logger():
    return configure_logging()


def pbar(iterable, desc: str = "", total=None):
    """tqdm wrapper with global disable flag (reference :49-54)."""
    if disable_progress_bar:
        return iterable
    try:
        from tqdm import tqdm

        return tqdm(iterable, desc=desc, total=total)
    except ImportError:
        return iterable
