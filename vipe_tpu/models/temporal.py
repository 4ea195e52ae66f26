"""Temporal attention modules for VideoDepthAnything (flax).

Parity with the reference motion module
(/root/reference/vipe/priors/depth/videodepthanything/motion_module/
motion_module.py:28-280): per-spatial-location self-attention across the TIME
axis with sinusoidal ("ape") positional encoding.

Structure per ``TemporalModule(C)``:
  GroupNorm(32) → proj_in (C→C) → [TemporalTransformerBlock ×1:
    2 × (LayerNorm → TemporalAttention) residual + LayerNorm → GEGLU FF
    residual] → proj_out (zero-init) → + input residual.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class TemporalAttention(nn.Module):
    dim: int
    heads: int = 8
    max_len: int = 32

    @nn.compact
    def __call__(self, x):
        """x: (B·HW, T, C) — attention across T with sinusoidal PE."""
        T = x.shape[1]
        pe = jnp.asarray(sinusoidal_pe(self.max_len, self.dim))
        x = x + pe[None, :T]
        dh = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(x)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(x)
        B, T, _ = q.shape
        q = q.reshape(B, T, self.heads, dh)
        k = k.reshape(B, T, self.heads, dh)
        v = v.reshape(B, T, self.heads, dh)
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, T, self.dim)
        return nn.Dense(self.dim, name="to_out")(out)


class GEGLU(nn.Module):
    inner: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner * 2, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(g, approximate=False)


class TemporalTransformerBlock(nn.Module):
    dim: int
    heads: int = 8
    num_attention_blocks: int = 2
    max_len: int = 32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_attention_blocks):
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
            x = TemporalAttention(
                self.dim, self.heads, self.max_len, name=f"attn{i}"
            )(y) + x
        y = nn.LayerNorm(epsilon=1e-5, name="ff_norm")(x)
        y = GEGLU(self.dim * 4, name="ff_geglu")(y)
        y = nn.Dense(self.dim, name="ff_out")(y)
        return y + x


class TemporalModule(nn.Module):
    channels: int
    heads: int = 8
    num_layers: int = 1
    num_attention_blocks: int = 2
    max_len: int = 32

    @nn.compact
    def __call__(self, x, T: int):
        """x: (B·T, H, W, C) → same, temporally mixed."""
        BT, H, W, C = x.shape
        B = BT // T
        residual = x
        # GroupNorm over channels (32 groups, eps 1e-6, affine)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        y = y.reshape(BT, H * W, C)
        y = nn.Dense(C, name="proj_in")(y)
        # (B·T, HW, C) → (B·HW, T, C)
        y = y.reshape(B, T, H * W, C).transpose(0, 2, 1, 3).reshape(B * H * W, T, C)
        for l in range(self.num_layers):
            y = TemporalTransformerBlock(
                C, self.heads, self.num_attention_blocks, self.max_len,
                name=f"block{l}",
            )(y)
        y = y.reshape(B, H * W, T, C).transpose(0, 2, 1, 3).reshape(BT, H * W, C)
        y = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(y)
        return y.reshape(BT, H, W, C) + residual
