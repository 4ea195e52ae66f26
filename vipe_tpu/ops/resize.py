"""Bilinear resize with torch ``align_corners=True`` grid semantics.

Most of the reference's torch models interpolate with
``F.interpolate(..., mode="bilinear", align_corners=True)`` (e.g.
vipe/priors/depth/dav2/dpt.py:181-185, videodepthanything/video_depth.py:77,
metric3d RAFTDepthNormalDPTDecoder5.py:297).  jax.image.resize implements the
half-pixel (align_corners=False) convention only, so converted checkpoints
would see a systematically shifted sampling grid at every upsample.  This
helper reproduces the align-corners grid exactly: output coordinate ``o``
samples input position ``o * (n_in - 1) / (n_out - 1)``.

Index arrays are built host-side from static shapes, so under jit this
lowers to two gathers + fused multiply-adds per axis — no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _axis_idx(n_in: int, n_out: int):
    if n_out == 1 or n_in == 1:
        # torch guards the 0/0 scale with src = 0
        return np.zeros(n_out, np.float32), np.zeros(n_out, np.int64)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    return (pos - i0).astype(np.float32), i0


def resize_align_corners(x, out_hw: Tuple[int, int]):
    """Resize spatial axes of ``x`` to ``out_hw`` with align_corners=True.

    Accepts (H, W), (H, W, C) or (B, H, W, C); returns the same rank.
    Interpolation runs in the input dtype (weights cast to match).
    """
    squeeze = []
    if x.ndim == 2:
        x = x[None, ..., None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (H, W) != (Ho, Wo):
        fy, y0 = _axis_idx(H, Ho)
        fx, x0 = _axis_idx(W, Wo)
        fy = fy.astype(x.dtype)[None, :, None, None]
        fx = fx.astype(x.dtype)[None, None, :, None]
        x = x[:, y0] * (1 - fy) + x[:, np.minimum(y0 + 1, H - 1)] * fy
        x = x[:, :, x0] * (1 - fx) + x[:, :, np.minimum(x0 + 1, W - 1)] * fx
    if squeeze:
        x = x[0, ..., 0] if len(squeeze) == 2 else x[0]
    return x
