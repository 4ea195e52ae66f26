"""Multi-scale deformable attention sampling in pure XLA.

TPU-native equivalent of the reference CUDA op
(/root/reference/csrc/grounding_dino_ext/ms_deform_attn_cuda.cu +
ms_deform_im2col_cuda.cuh): per query/head/level/point, bilinearly sample the
value feature map (grid_sample semantics, align_corners=False, zero padding)
and reduce with the softmaxed attention weights.

Implementation: one flattened gather per level over the (B, h·w, H, C) value
tokens — 4 corner gathers with in-bounds weight zeroing.  Spatial shapes are
STATIC (python list), so the per-level loop unrolls at trace time and XLA
fuses the interpolation arithmetic around the gathers; no dynamic splits.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,                 # (B, S, H, C) flattened levels
    spatial_shapes: List[Tuple[int, int]],
    sampling_locations: jnp.ndarray,    # (B, Q, H, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,     # (B, Q, H, L, P) softmaxed
) -> jnp.ndarray:                       # (B, Q, H·C)
    B, S, H, C = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    out = jnp.zeros((B, Q, H, C), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start: start + h * w]           # (B, hw, H, C)
        start += h * w
        loc = sampling_locations[:, :, :, lvl]       # (B, Q, H, P, 2)
        wgt = attention_weights[:, :, :, lvl]        # (B, Q, H, P)

        # grid_sample(align_corners=False): pixel center i at (i+0.5)/w
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        def corner(ix, iy, cw):
            inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            idx = (jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)).astype(
                jnp.int32
            )                                          # (B, Q, H, P)
            # gather along the token axis per (batch, head)
            idx_f = idx.transpose(0, 2, 1, 3).reshape(B, H, Q * P)
            v_bh = v.transpose(0, 2, 1, 3)             # (B, H, hw, C)
            g = jnp.take_along_axis(v_bh, idx_f[..., None], axis=2)
            g = g.reshape(B, H, Q, P, C).transpose(0, 2, 1, 3, 4)
            return g * (cw * inb)[..., None]

        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        samp = (
            corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy)
        )                                              # (B, Q, H, P, C)
        out = out + jnp.einsum("bqhpc,bqhp->bqhc", samp, wgt)
    return out.reshape(B, Q, H * C)
