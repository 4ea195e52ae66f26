"""Swin Transformer backbone for GroundingDINO, in flax (NHWC).

Reference: /root/reference/vipe/priors/track_anything/groundingdino/models/
main/backbone/swin_transformer.py (859 LoC torch).  Architecture parity for
the ``swin_T_224_1k`` config used by the shipped checkpoint: patch 4,
embed 96, depths (2,2,6,2), heads (3,6,12,24), window 7, no absolute pos
embed, out_indices (1,2,3) with a LayerNorm per returned stage.

TPU notes: everything is reshape/matmul — window partition via reshape,
shifted windows via jnp.roll, relative-position bias via a static gather.
All shapes are static under jit (the detector pads the canvas, so per-stage
window padding is resolved at trace time).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh·ww, wh·ww) index into the (2wh-1)(2ww-1) bias table
    (reference swin_transformer.py:123-140)."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW·B, N, C); mask: (nW, N, N) additive or None."""
        Bn, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(Bn, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window, self.window)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, h, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int

    @nn.compact
    def __call__(self, x, H, W):
        """x: (B, H·W, C)."""
        B, L, C = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(B, H, W, C)

        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        shift = self.shift
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            attn_mask = self._attn_mask(Hp, Wp)
        else:
            attn_mask = None

        # window partition (reference :52-66) via reshape
        x = x.reshape(B, Hp // w, w, Wp // w, w, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        x = WindowAttention(self.dim, w, self.num_heads, name="attn")(
            x, attn_mask
        )
        x = x.reshape(B, Hp // w, Wp // w, w, w, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W].reshape(B, H * W, C)

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Mlp(4 * self.dim, self.dim, name="mlp")(y)
        return x

    def _attn_mask(self, Hp, Wp):
        """Shifted-window attention mask (reference :260-283) — computed with
        static shapes at trace time."""
        w, s = self.window, self.shift
        img = np.zeros((Hp, Wp), np.int32)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                img[hs, ws] = cnt
                cnt += 1
        m = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3)
        m = m.reshape(-1, w * w)
        diff = m[:, :, None] != m[:, None, :]
        return jnp.where(jnp.asarray(diff), -100.0, 0.0)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        pad_b, pad_r = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1)
        Hh, Wh = (H + pad_b) // 2, (W + pad_r) // 2
        x = x.reshape(B, Hh * Wh, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x), Hh, Wh


class SwinTransformer(nn.Module):
    """Returns stage features at the configured out_indices, NHWC."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Sequence[int] = (1, 2, 3)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) → list of (B, Hi, Wi, Ci) for out_indices."""
        B, H0, W0, _ = x.shape
        pad_b = (4 - H0 % 4) % 4
        pad_r = (4 - W0 % 4) % 4
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
            name="patch_embed_proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        outs = []
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            for b in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[i], self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    name=f"layers_{i}_blocks_{b}",
                )(x, H, W)
            if i in self.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs.append(y.reshape(B, H, W, dim))
            if i < len(self.depths) - 1:
                x, H, W = PatchMerging(dim, name=f"layers_{i}_downsample")(x, H, W)
        return outs
