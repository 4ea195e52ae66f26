"""GroundingDINO feature-enhancer encoder + cross-modality decoder in flax.

Reference: /root/reference/vipe/priors/track_anything/groundingdino/models/
main/transformer.py (957 LoC), fuse_modules.py (BiMultiHeadAttention),
transformer_vanilla.py (text enhancer layer), utils.py (sine embeds,
encoder output proposals).

TPU-native simplification (documented divergence): the reference batches
variable-size images as NestedTensors with padding masks; this port runs the
single-image inference path the pipeline actually uses (bs=1, detector
resizes to a /32-divisible canvas), so every image token is valid,
``valid_ratios ≡ 1`` and all key-padding plumbing drops out of the compiled
program.  Text length is padded to a static bucket with an explicit
``text_token_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ position math


def sine_embed_hw(h: int, w: int, dim: int, temp_h: float = 20.0,
                  temp_w: float = 20.0) -> np.ndarray:
    """PositionEmbeddingSineHW, normalize=True (reference
    position_encoding.py:80-180); returns (h, w, dim) numpy (static)."""
    n = dim // 2
    y = (np.arange(h, dtype=np.float64) + 1.0) / (h + 1e-6) * 2 * np.pi
    x = (np.arange(w, dtype=np.float64) + 1.0) / (w + 1e-6) * 2 * np.pi
    dim_tw = temp_w ** (2 * (np.arange(n) // 2) / n)
    dim_th = temp_h ** (2 * (np.arange(n) // 2) / n)
    px = x[:, None] / dim_tw
    py = y[:, None] / dim_th
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])], -1).reshape(w, -1)
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])], -1).reshape(h, -1)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, n)),
         np.broadcast_to(px[None, :], (h, w, n))], -1
    )
    return pos.astype(np.float32)


def sine_pos_embed(pos, num_pos_feats: int, temperature: float = 10000.0,
                   exchange_xy: bool = True):
    """get_sine_pos_embed (reference utils.py:25-54): (..., n) →
    (..., n·num_pos_feats)."""
    scale = 2 * np.pi
    dim_t = temperature ** (
        2 * (jnp.arange(num_pos_feats) // 2) / num_pos_feats
    )

    def one(x):  # (..., 1) → (..., num_pos_feats)
        sx = x * scale / dim_t
        return jnp.stack(
            [jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])], -1
        ).reshape(*x.shape[:-1], -1)

    parts = [one(pos[..., i: i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, -1)


def inverse_sigmoid(x, eps: float = 1e-3):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


# ------------------------------------------------------------------ modules


class MLP(nn.Module):
    """DETR MLP (reference utils.py:163-175)."""

    hidden: int
    out: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            o = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(o, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Plain MHA with additive mask (torch nn.MultiheadAttention parity;
    converter splits in_proj into q/k/v)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        hd = self.dim // self.heads
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qh = nn.Dense(self.dim, name="q_proj")(q).reshape(B, Lq, self.heads, hd)
        kh = nn.Dense(self.dim, name="k_proj")(k).reshape(B, Lk, self.heads, hd)
        vh = nn.Dense(self.dim, name="v_proj")(v).reshape(B, Lk, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
        if mask is not None:
            attn = attn + mask
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class MSDeformAttnModule(nn.Module):
    """Learned offsets/weights around reference points (reference
    ms_deform_attn.py:143-340); sampling itself is msda.ms_deform_attn."""

    dim: int
    heads: int
    levels: int
    points: int

    @nn.compact
    def __call__(self, query, reference_points, value,
                 spatial_shapes: Sequence[Tuple[int, int]]):
        """query (B, Q, C); reference_points (B, Q, L, 2|4) normalized;
        value (B, S, C)."""
        from .msda import ms_deform_attn

        B, Q, C = query.shape
        H, L, P = self.heads, self.levels, self.points
        v = nn.Dense(C, name="value_proj")(value).reshape(B, -1, H, C // H)
        off = nn.Dense(H * L * P * 2, name="sampling_offsets")(query)
        off = off.reshape(B, Q, H, L, P, 2)
        w = nn.Dense(H * L * P, name="attention_weights")(query)
        w = nn.softmax(w.reshape(B, Q, H, L * P), axis=-1).reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 2:
            norm = jnp.asarray(
                [[wi, hi] for hi, wi in spatial_shapes], jnp.float32
            )
            loc = (
                reference_points[:, :, None, :, None]
                + off / norm[None, None, None, :, None]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + off / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        out = ms_deform_attn(v, list(spatial_shapes), loc, w)
        return nn.Dense(C, name="output_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """Bidirectional image↔text attention (reference fuse_modules.py:99-260)."""

    v_dim: int
    l_dim: int
    embed_dim: int
    heads: int

    @nn.compact
    def __call__(self, v, l, text_token_mask):
        """v (B, Nv, v_dim), l (B, Nl, l_dim), text_token_mask (B, Nl) bool
        (True = real token).  No image padding (see module docstring)."""
        H = self.heads
        hd = self.embed_dim // H
        B, Nv, _ = v.shape
        Nl = l.shape[1]
        q = nn.Dense(self.embed_dim, name="v_proj")(v) * (hd ** -0.5)
        k = nn.Dense(self.embed_dim, name="l_proj")(l)
        vv = nn.Dense(self.embed_dim, name="values_v_proj")(v)
        vl = nn.Dense(self.embed_dim, name="values_l_proj")(l)

        q = q.reshape(B, Nv, H, hd)
        k = k.reshape(B, Nl, H, hd)
        attn = jnp.einsum("bvhd,blhd->bhvl", q, k)
        attn = attn - jax_stop_max(attn)
        attn = jnp.clip(attn, -50000, 50000)

        # text→vision attention (over image tokens): stabilize per row
        attn_l = attn.transpose(0, 1, 3, 2)  # (B, H, Nl, Nv)
        attn_l = attn_l - jnp.max(attn_l, axis=-1, keepdims=True)
        attn_l = jnp.clip(attn_l, -50000, 50000)
        attn_l = nn.softmax(attn_l, axis=-1)

        # vision→text: mask padded text tokens
        neg = jnp.where(text_token_mask[:, None, None, :], 0.0, -1e9)
        attn_v = nn.softmax(attn + neg, axis=-1)

        out_v = jnp.einsum(
            "bhvl,blhd->bvhd", attn_v, vl.reshape(B, Nl, H, hd)
        ).reshape(B, Nv, self.embed_dim)
        out_l = jnp.einsum(
            "bhlv,bvhd->blhd", attn_l, vv.reshape(B, Nv, H, hd)
        ).reshape(B, Nl, self.embed_dim)
        return (
            nn.Dense(self.v_dim, name="out_v_proj")(out_v),
            nn.Dense(self.l_dim, name="out_l_proj")(out_l),
        )


def jax_stop_max(attn):
    """stable_softmax_2d: subtract the global max (fuse_modules.py:188)."""
    return jnp.max(attn)


class BiAttentionBlock(nn.Module):
    """Pre-LN fusion block with layer-scale gammas (fuse_modules.py:262-310).
    drop_path is identity at inference."""

    v_dim: int
    l_dim: int
    embed_dim: int
    heads: int

    @nn.compact
    def __call__(self, v, l, text_token_mask):
        # the reference REPLACES v/l with their normed versions before the
        # residual add (fuse_modules.py:306-315): out = ln(v) + gamma*dv
        vn = nn.LayerNorm(name="layer_norm_v")(v)
        ln = nn.LayerNorm(name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.heads, name="attn"
        )(vn, ln, text_token_mask)
        gamma_v = self.param(
            "gamma_v", nn.initializers.constant(1e-4), (self.v_dim,)
        )
        gamma_l = self.param(
            "gamma_l", nn.initializers.constant(1e-4), (self.l_dim,)
        )
        return vn + gamma_v * dv, ln + gamma_l * dl


class TextEnhancerLayer(nn.Module):
    """Vanilla post-LN encoder layer over text tokens
    (transformer_vanilla.py:72-123); mask is the per-phrase 3D mask."""

    dim: int
    heads: int
    ffn: int

    @nn.compact
    def __call__(self, text, pos, mask3d):
        q = k = text + pos
        bias = jnp.where(mask3d, 0.0, -1e9)[:, None]  # (B, 1, L, L)
        a = MultiHeadAttention(self.dim, self.heads, name="self_attn")(
            q, k, text, mask=bias
        )
        text = nn.LayerNorm(name="norm1")(text + a)
        h = nn.Dense(self.ffn, name="linear1")(text)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="linear2")(h)
        return nn.LayerNorm(name="norm2")(text + h)


class DeformableEncoderLayer(nn.Module):
    """Deformable self-attention + FFN (reference transformer.py:730-799)."""

    dim: int
    heads: int
    levels: int
    points: int
    ffn: int

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        a = MSDeformAttnModule(
            self.dim, self.heads, self.levels, self.points, name="self_attn"
        )(src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(name="norm1")(src + a)
        h = nn.Dense(self.ffn, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="linear2")(h)
        return nn.LayerNorm(name="norm2")(src + h)


class DeformableDecoderLayer(nn.Module):
    """Self-attn → text cross-attn → deformable cross-attn → FFN
    (reference transformer.py:801-925)."""

    dim: int
    heads: int
    levels: int
    points: int
    ffn: int

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, memory,
                 spatial_shapes, memory_text, text_token_mask):
        q = k = tgt + query_pos
        a = MultiHeadAttention(self.dim, self.heads, name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(name="norm2")(tgt + a)

        tmask = jnp.where(text_token_mask[:, None, None, :], 0.0, -1e9)
        a = MultiHeadAttention(self.dim, self.heads, name="ca_text")(
            tgt + query_pos, memory_text, memory_text, mask=tmask
        )
        tgt = nn.LayerNorm(name="catext_norm")(tgt + a)

        a = MSDeformAttnModule(
            self.dim, self.heads, self.levels, self.points, name="cross_attn"
        )(tgt + query_pos, reference_points, memory, spatial_shapes)
        tgt = nn.LayerNorm(name="norm1")(tgt + a)

        h = nn.Dense(self.ffn, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="linear2")(h)
        return nn.LayerNorm(name="norm3")(tgt + h)


# ------------------------------------------------------------- full stacks


def encoder_reference_points(spatial_shapes) -> np.ndarray:
    """(1, S, L, 2) normalized pixel centers (reference transformer.py:470-485
    with valid_ratios=1) — static numpy."""
    pts = []
    for h, w in spatial_shapes:
        yy, xx = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        pts.append(np.stack([xx, yy], -1).reshape(-1, 2))
    ref = np.concatenate(pts, 0).astype(np.float32)
    L = len(spatial_shapes)
    return np.broadcast_to(ref[None, :, None], (1, ref.shape[0], L, 2)).copy()


def output_proposals(spatial_shapes) -> Tuple[np.ndarray, np.ndarray]:
    """gen_encoder_output_proposals (reference utils.py:57-110) with no
    padding: (S, 4) unsigmoided proposals + (S,) validity."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        yy, xx = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        wh = np.full((h, w, 2), 0.05 * (2.0 ** lvl))
        props.append(
            np.concatenate([np.stack([xx, yy], -1), wh], -1).reshape(-1, 4)
        )
    p = np.concatenate(props, 0)
    valid = ((p > 0.01) & (p < 0.99)).all(-1)
    eps = 1e-6  # torch inverse_sigmoid default in gen_encoder_output_proposals
    p = np.log(np.clip(p, eps, 1) / np.clip(1 - p, eps, 1))
    p[~valid] = np.inf  # masked_fill float('inf') on invalid
    return p.astype(np.float32), valid
