"""UniDepth v2 building blocks in flax (reference
/root/reference/vipe/priors/depth/unidepth/layers.py:39-360).

Pre-norm cross-attention blocks with LayerScale, sine position embeddings,
Fourier ray embeddings and the conv upsampling stack used by the decoder.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    """LayerNorm → fc1 → GELU → fc2 (layers.py:39-65)."""

    dim: int
    expansion: int = 4
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        out = self.output_dim or self.dim
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(int(self.dim * self.expansion), name="proj1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(out, name="proj2")(x)


class AttentionBlock(nn.Module):
    """Pre-norm cross-attention + MLP, both LayerScaled (layers.py:83-161)."""

    dim: int
    num_heads: int = 8
    expansion: int = 4
    layer_scale: float = 1.0
    context_dim: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, context=None, pos_embed=None, pos_embed_context=None):
        ctx = x if context is None else context
        h = self.num_heads
        d = self.dim // h

        y = nn.LayerNorm(name="norm_attnx")(x)
        c = nn.LayerNorm(name="norm_attnctx")(ctx)
        kv = nn.Dense(2 * self.dim, use_bias=self.use_bias, name="kv")(c)
        q = nn.Dense(self.dim, use_bias=self.use_bias, name="q")(y)
        B, N, _ = q.shape
        M = kv.shape[1]
        kv = kv.reshape(B, M, 2, h, d)
        k, v = kv[:, :, 0], kv[:, :, 1]
        q = q.reshape(B, N, h, d)
        if pos_embed is not None:
            q = q + pos_embed.reshape(B, N, h, d)
        if pos_embed_context is not None:
            k = k + pos_embed_context.reshape(B, M, h, d)
        o = jax.nn.dot_product_attention(q, k, v).reshape(B, N, self.dim)
        o = nn.Dense(self.dim, use_bias=self.use_bias, name="out")(o)

        if self.layer_scale > 0:
            g1 = self.param("ls1_gamma", nn.initializers.constant(self.layer_scale),
                            (self.dim,))
            o = o * g1
        x = x + o
        m = MLP(self.dim, self.expansion, name="mlp")(x)
        if self.layer_scale > 0:
            g2 = self.param("ls2_gamma", nn.initializers.constant(self.layer_scale),
                            (self.dim,))
            m = m * g2
        return x + m


class AttentionLayer(nn.Module):
    """Stack of AttentionBlocks (layers.py:164-213)."""

    num_blocks: int
    dim: int
    num_heads: int = 8
    expansion: int = 4
    layer_scale: float = 1.0
    context_dim: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, context=None, pos_embed=None, pos_embed_context=None):
        for i in range(self.num_blocks):
            x = AttentionBlock(
                self.dim, self.num_heads, self.expansion,
                self.layer_scale, self.context_dim, self.use_bias,
                name=f"block{i}",
            )(x, context, pos_embed, pos_embed_context)
        return x


def position_embedding_sine(h: int, w: int, dim: int):
    """DETR-style sine embedding, normalized (layers.py:215-258).
    Returns (h·w, 2·dim) with y/x halves."""
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0)
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0)
    eps = 1e-6
    y = y / (h + eps) * 2 * jnp.pi
    x = x / (w + eps) * 2 * jnp.pi
    dim_t = jnp.arange(dim, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / dim)
    py = y[:, None] / dim_t  # (h, dim)
    px = x[:, None] / dim_t
    py = jnp.stack([jnp.sin(py[:, 0::2]), jnp.cos(py[:, 1::2])], -1).reshape(h, -1)
    px = jnp.stack([jnp.sin(px[:, 0::2]), jnp.cos(px[:, 1::2])], -1).reshape(w, -1)
    pos = jnp.concatenate(
        [jnp.broadcast_to(py[:, None], (h, w, dim)),
         jnp.broadcast_to(px[None, :], (h, w, dim))], axis=-1,
    )
    return pos.reshape(h * w, 2 * dim)


def fourier_features(x, dim: int, max_freq: float, use_log: bool = True):
    """Fourier positional features (positional_embedding.py:218-256,
    use_cos=False): x (..., C) → (..., dim), SIN of log-spaced frequencies
    × π, dim // C bands per input channel."""
    C = x.shape[-1]
    n_freq = dim // C
    if use_log:
        freqs = 2.0 ** jnp.linspace(
            0.0, jnp.log2(max(float(max_freq), 2.0)), n_freq
        )
    else:
        freqs = jnp.linspace(1.0, max(float(max_freq), 2.0) / 2.0, n_freq)
    ang = x[..., None] * freqs * jnp.pi  # (..., C, F)
    return jnp.sin(ang).reshape(x.shape[:-1] + (C * n_freq,))


class ResidualConvUnit(nn.Module):
    """LeakyReLU conv-conv residual with per-channel gamma (layers.py:261-300)."""

    dim: int
    kernel_size: int = 3
    layer_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        y = nn.leaky_relu(x, 0.01)
        y = nn.Conv(self.dim, (k, k), name="conv1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.dim, (k, k), name="conv2")(y)
        if self.layer_scale > 0:
            g = self.param("gamma", nn.initializers.constant(self.layer_scale),
                           (self.dim,))
            y = y * g
        return x + y


class ResUpsampleBil(nn.Module):
    """num_layers ResidualConvUnits → 1×1 conv → ×2 bilinear (layers.py:303-360)."""

    dim: int
    output_dim: int
    num_layers: int = 2
    kernel_size: int = 3
    layer_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResidualConvUnit(
                self.dim, self.kernel_size, self.layer_scale, name=f"rcu{i}"
            )(x)
        x = nn.Conv(self.output_dim, (1, 1), name="up_conv")(x)
        B, H, W, C = x.shape
        return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


def orthonormal_init(num_tokens: int, dims: int, seed: int = 0) -> np.ndarray:
    """Gram-Schmidt orthonormal rows (decoder.py:24-38); fixed seed since the
    reference stores the result as a non-trainable buffer."""
    rng = np.random.default_rng(seed)
    pe = rng.normal(size=(num_tokens, dims)).astype(np.float32)
    for i in range(num_tokens):
        for j in range(i):
            pe[i] -= pe[i] @ pe[j] * pe[j]
        pe[i] /= np.linalg.norm(pe[i]) + 1e-9
    return pe
