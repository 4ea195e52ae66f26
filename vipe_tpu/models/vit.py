"""DINOv2 Vision Transformer in flax (NHWC, SDPA attention).

Shared backbone for the depth-prior zoo: DepthAnythingV2 / PriorDA /
VideoDepthAnything (reference vendored copies at
/root/reference/vipe/priors/depth/dav2/dinov2.py, priorda/dav2/,
videodepthanything/) and later UniDepth / Metric3D.

Architecture facts mirrored from the reference (dinov2.py:59-440):
  * patch 14, img_size 518 → 37×37 base pos-embed grid, cls token;
  * pre-norm blocks with LayerScale (init_values=1.0) on both branches;
  * MemEffAttention → plain scaled-dot-product attention here
    (the reference's xformers shim is already SDPA, vipe/ext/xformers.py:33);
  * runtime positional-embedding interpolation for arbitrary input sizes —
    torch-exact bicubic (a=-0.75, no antialias, +0.1 scale-offset quirk)
    via a precomputed static weight matrix (dinov2.py:188-219);
  * ``get_intermediate_layers`` applies the final norm to each tapped output
    and splits (patch tokens, cls token) (dinov2.py:311-335).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _torch_bicubic_weights(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """(n_out, n_in) 1-D interpolation matrix matching torch
    F.interpolate(mode='bicubic', antialias=False, align_corners=False,
    scale_factor=scale): cubic convolution kernel a=-0.75, half-pixel
    source coords computed from the PROVIDED scale (not n_out/n_in — the
    reference passes scale_factor=(grid+0.1)/base, dinov2.py:200-213),
    border taps clamped."""
    A = -0.75
    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        c = (i + 0.5) / scale - 0.5
        f = int(np.floor(c))
        t = c - f
        for k in range(-1, 3):
            x = abs(k - t)
            if x <= 1.0:
                w = ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0
            elif x < 2.0:
                w = (((x - 5.0) * x + 8.0) * x - 4.0) * A
            else:
                w = 0.0
            W[i, min(max(f + k, 0), n_in - 1)] += w
    return W.astype(np.float32)


def interpolate_pos_grid(pos_patch, base: int, ph: int, pw: int,
                         offset: float = 0.1):
    """(1, base², D) pos embeddings → (1, ph·pw, D), exactly reproducing the
    reference interpolate_pos_encoding (dinov2.py:188-219)."""
    D = pos_patch.shape[-1]
    grid = pos_patch.reshape(base, base, D)
    Wy = jnp.asarray(_torch_bicubic_weights(base, ph, (ph + offset) / base))
    Wx = jnp.asarray(_torch_bicubic_weights(base, pw, (pw + offset) / base))
    out = jnp.einsum("oi,ijd,pj->opd", Wy, grid, Wx)
    return out.reshape(1, ph * pw, D)

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, D // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, N, D)
        return nn.Dense(self.dim, name="proj")(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DinoViT(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    img_size: int = 518
    # >0: conditioned encoder — an extra zero-initialized patch projection
    # over a (B, H, W, cond_dim) condition map is ADDED to the patch
    # embedding (PriorDA's alpha_proj, reference
    # priors/depth/dav2/dinov2_layers/patch_embed.py:71-94)
    cond_dim: int = 0
    # DINOv2-reg variants (Metric3D backbones): extra learned tokens inserted
    # after cls, excluded from the positional embedding
    num_register_tokens: int = 0

    @nn.compact
    def __call__(self, x, tap_layers: Sequence[int] = (), condition=None):
        """x: (B, H, W, 3) normalized image, H/W multiples of patch_size.

        Returns list of (patch_tokens (B, N, D), extras (B, 1+R, D)) per tap
        layer (final norm applied); extras = [cls | register tokens].  With
        R = 0 the extras second axis squeezes to the former (B, D) cls.
        """
        B, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=self.patch_size, name="patch_embed",
        )(x)
        if self.cond_dim > 0:
            x = x + nn.Conv(
                self.embed_dim, (self.patch_size, self.patch_size),
                strides=self.patch_size, name="alpha_proj",
                kernel_init=nn.initializers.zeros,
            )(condition)
        x = x.reshape(B, ph * pw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        base = self.img_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, base * base + 1, self.embed_dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (base, base):
            pos_patch = interpolate_pos_grid(pos_patch, base, ph, pw)

        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls + pos_cls, (B, 1, self.embed_dim))
        R = self.num_register_tokens
        if R:
            reg = self.param(
                "register_tokens", nn.initializers.normal(0.02),
                (1, R, self.embed_dim),
            )
            reg_tok = jnp.broadcast_to(reg, (B, R, self.embed_dim))
            x = jnp.concatenate([cls_tok, reg_tok, x], axis=1)
        else:
            x = jnp.concatenate([cls_tok, x], axis=1)

        taps = {}
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, name=f"block{i}")(x)
            if i in tap_layers:
                taps[i] = x

        outs = []
        for i in tap_layers:
            t = norm(taps[i])
            if R:
                outs.append((t[:, 1 + R:], t[:, : 1 + R]))
            else:
                outs.append((t[:, 1:], t[:, 0]))
        return outs


def make_vit(variant: str, **kwargs) -> DinoViT:
    return DinoViT(**{**VIT_CONFIGS[variant], **kwargs})
