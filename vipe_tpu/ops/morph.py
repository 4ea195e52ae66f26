"""Convolution-based binary morphology (reference
/root/reference/vipe/utils/morph.py:96-134)."""

from __future__ import annotations

import numpy as np


def _conv_count(mask: np.ndarray, radius: int) -> np.ndarray:
    """Box-filter neighbor count via integral image (host numpy)."""
    m = np.asarray(mask, np.float32)
    pad = np.pad(m, radius)
    ii = pad.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    k = 2 * radius + 1
    h, w = m.shape
    out = (
        ii[k: k + h, k: k + w]
        - ii[:h, k: k + w]
        - ii[k: k + h, :w]
        + ii[:h, :w]
    )
    return out


def dilate(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return np.asarray(mask, bool)
    return _conv_count(mask, radius) > 0


def erode(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return np.asarray(mask, bool)
    k = 2 * radius + 1
    return _conv_count(mask, radius) >= k * k - 1e-3
