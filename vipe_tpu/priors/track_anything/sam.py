"""Segment Anything (SAM) in flax — box-prompted segmentation.

Reference: /root/reference/vipe/priors/track_anything/sam/ (vendored Meta
SAM).  ViPE uses ``SamPredictor.segment_with_box`` per GroundingDINO
detection (segmentor.py); configs: vit_b = embed 768 / depth 12 / heads 12 /
global attention at (2, 5, 8, 11), window 14, prompt dim 256, image 1024
(build_sam.py:43-106).

Components:
  * ``ImageEncoderViT``: 16×16 patch embed + abs pos embed + transformer with
    decomposed relative position bias, window attention except at the global
    layers, 2-conv neck → (64, 64, 256) embedding.
  * ``PromptEncoder``: random-frequency position encoding; box corners get
    two learned embeddings.
  * ``MaskDecoder``: learned IoU + mask tokens, TwoWayTransformer (token↔image
    cross attention, 2 layers), 4× upscaling, hypernetwork MLPs and IoU head.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PROMPT_DIM = 256
IMAGE_SIZE = 1024
PIXEL_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.asarray([58.395, 57.12, 57.375], np.float32)

SAM_CONFIGS = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn=(7, 15, 23, 31)),
}


def _rel_pos_bias(rel_pos, q_size, k_size):
    """Interpolated decomposed relative position table → (q, k) bias matrix."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SamAttention(nn.Module):
    dim: int
    num_heads: int
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) — attention over the H·W tokens with decomposed
        relative position bias (sam image_encoder Attention)."""
        B, H, W, C = x.shape
        h = self.num_heads
        d = C // h
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(B, H * W, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size[0] - 1, d))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size[1] - 1, d))
        Rh = _rel_pos_bias(rel_h, H, H)  # (H, H, d)
        Rw = _rel_pos_bias(rel_w, W, W)
        q_r = q.reshape(B, H, W, h, d)
        bias_h = jnp.einsum("bhwnd,hkd->bnhwk", q_r, Rh)  # (B, heads, H, W, H)
        bias_w = jnp.einsum("bhwnd,wkd->bnhwk", q_r, Rw)
        bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(B, h, H * W, H * W)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(d) + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C),
        (Hp, Wp),
    )


def _window_unpartition(wins, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp * Wp // ws // ws)
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class SamBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int  # 0 = global
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = x.shape[1:3]
            x, pad_hw = _window_partition(x, self.window_size)
            size = (self.window_size, self.window_size)
        else:
            size = self.input_size
        x = SamAttention(self.dim, self.num_heads, size, name="attn")(x)
        if self.window_size > 0:
            x = _window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(4 * self.dim, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    img_size: int = IMAGE_SIZE

    @nn.compact
    def __call__(self, x):
        """x: (B, 1024, 1024, 3) normalized → (B, 64, 64, 256)."""
        g = self.img_size // 16
        x = nn.Conv(self.embed_dim, (16, 16), strides=16, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.embed_dim))
        x = x + pos
        for i in range(self.depth):
            ws = 0 if i in self.global_attn else self.window_size
            x = SamBlock(self.embed_dim, self.num_heads, ws, (g, g),
                         name=f"block{i}")(x)
        x = nn.Conv(PROMPT_DIM, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(PROMPT_DIM, (3, 3), use_bias=False, name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)
        return x


class PromptEncoder(nn.Module):
    """Box prompts only (the pipeline segments GroundingDINO boxes)."""

    img_size: int = IMAGE_SIZE

    @nn.compact
    def __call__(self, boxes):
        """boxes: (B, 2, 2) corner points in [0, img_size] → sparse
        embeddings (B, 2, 256) + the (g, g, 256) dense positional grid."""
        pe_gauss = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, PROMPT_DIM // 2)
        )

        def encode_points(pts_01):
            c = 2 * pts_01 - 1
            proj = c @ pe_gauss * (2 * jnp.pi)
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

        corner1 = self.param("point_embed_2", nn.initializers.normal(1.0),
                             (PROMPT_DIM,))
        corner2 = self.param("point_embed_3", nn.initializers.normal(1.0),
                             (PROMPT_DIM,))
        pts = (boxes + 0.5) / self.img_size
        sparse = encode_points(pts)
        sparse = sparse + jnp.stack([corner1, corner2])[None]

        g = self.img_size // 16
        gy = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        gx = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)
        dense_pe = encode_points(grid)
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (PROMPT_DIM,))
        return sparse, dense_pe, no_mask


class MaskPromptEncoder(nn.Module):
    """Mask-input downscaling (reference prompt_encoder.py:56-64): the
    256×256 low-res logits from a first decode become a dense per-pixel
    prompt for a refinement pass (segmentor.py:98-105)."""

    mask_in_chans: int = 16

    @nn.compact
    def __call__(self, mask):
        """mask: (B, 4g, 4g, 1) → (B, g, g, 256)."""
        x = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=2,
                    name="conv1")(mask)
        x = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.mask_in_chans, (2, 2), strides=2, name="conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(PROMPT_DIM, (1, 1), name="conv3")(x)


class TwoWayAttention(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        h = self.num_heads
        qq = nn.Dense(d, name="q_proj")(q).reshape(*q.shape[:2], h, d // h)
        kk = nn.Dense(d, name="k_proj")(k).reshape(*k.shape[:2], h, d // h)
        vv = nn.Dense(d, name="v_proj")(v).reshape(*v.shape[:2], h, d // h)
        o = jax.nn.dot_product_attention(qq, kk, vv)
        return nn.Dense(self.dim, name="out_proj")(o.reshape(*q.shape[:2], d))


class TwoWayBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # torch nn.LayerNorm default eps is 1e-5 (transformer.py:134-144)
        LN = functools.partial(nn.LayerNorm, epsilon=1e-5)
        if self.skip_first_pe:
            # first layer REPLACES queries with the attention output —
            # no residual (reference transformer.py:155-156)
            queries = TwoWayAttention(self.dim, self.num_heads,
                                      name="self_attn")(
                queries, queries, queries)
        else:
            q = TwoWayAttention(self.dim, self.num_heads, name="self_attn")(
                queries + query_pe, queries + query_pe, queries)
            queries = queries + q
        queries = LN(name="norm1")(queries)

        a = TwoWayAttention(self.dim, self.num_heads, 2, name="cross_attn_t2i")(
            queries + query_pe, keys + key_pe, keys)
        queries = LN(name="norm2")(queries + a)

        m = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        m = nn.relu(m)
        m = nn.Dense(self.dim, name="mlp_lin2")(m)
        queries = LN(name="norm3")(queries + m)

        a = TwoWayAttention(self.dim, self.num_heads, 2, name="cross_attn_i2t")(
            keys + key_pe, queries + query_pe, queries)
        keys = LN(name="norm4")(keys + a)
        return queries, keys


class MaskDecoder(nn.Module):
    num_multimask: int = 3

    @nn.compact
    def __call__(self, image_embed, dense_pe, sparse_prompts, dense_embed=None):
        """image_embed: (B, 64, 64, 256); sparse_prompts: (B, P, 256);
        dense_embed: the (256,) no-mask embedding, added to the image
        embedding before the transformer (reference mask_decoder.py:134-135).
        Returns (masks (B, 4, 256, 256), iou (B, 4))."""
        D = PROMPT_DIM
        n_tokens = 1 + self.num_multimask + 1  # iou + 4 mask tokens
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (self.num_multimask + 1, D),
        )
        B = image_embed.shape[0]
        tokens = jnp.concatenate([
            jnp.broadcast_to(
                jnp.concatenate([iou_token, mask_tokens], 0)[None],
                (B, n_tokens, D)),
            sparse_prompts,
        ], axis=1)

        g = image_embed.shape[1]
        keys = image_embed.reshape(B, g * g, D)
        if dense_embed is not None:
            # either the (D,) no-mask embedding or a (B, g, g, D) encoded
            # mask prompt (reference mask_decoder.py:134-135)
            if dense_embed.ndim == 1:
                keys = keys + dense_embed.reshape(1, 1, D)
            else:
                keys = keys + dense_embed.reshape(-1, g * g, D)
        key_pe = jnp.broadcast_to(dense_pe.reshape(1, g * g, D), keys.shape)

        queries = tokens
        for i in range(2):
            queries, keys = TwoWayBlock(
                D, 8, 2048, skip_first_pe=(i == 0), name=f"layer{i}"
            )(queries, keys, tokens, key_pe)
        # final token-to-image attention
        a = TwoWayAttention(D, 8, 2, name="final_attn")(
            queries + tokens, keys + key_pe, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries + a)

        src = keys.reshape(B, g, g, D)
        up = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2), name="upscale1")(src)
        up = nn.LayerNorm(name="upscale_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2), name="upscale2")(up)
        up = nn.gelu(up, approximate=False)  # (B, 256, 256, 32)

        mask_out = []
        for k in range(self.num_multimask + 1):
            t = queries[:, 1 + k]
            for j, dim in enumerate((D, D, D // 8)):
                t = nn.Dense(dim, name=f"hyper{k}_lin{j}")(t)
                if j < 2:
                    t = nn.relu(t)
            mask_out.append(jnp.einsum("bhwc,bc->bhw", up, t))
        masks = jnp.stack(mask_out, axis=1)

        iou = queries[:, 0]
        for j, dim in enumerate((256, 256, self.num_multimask + 1)):
            iou = nn.Dense(dim, name=f"iou_lin{j}")(iou)
            if j < 2:
                iou = nn.relu(iou)
        return masks, iou


@jax.jit
def _composite_first_wins(masks, ids):
    """(B, H, W) bool + (B,) int32 ids (0 = dropped) → (H, W) int32
    first-wins instance map (argmax returns the FIRST True along B —
    exactly the sequential ``instance[mask & (instance == 0)] = id``)."""
    valid = masks & (ids[:, None, None] > 0)
    sel = jnp.argmax(valid, axis=0)
    covered = jnp.any(valid, axis=0)
    return jnp.where(covered, ids[sel], 0).astype(jnp.int32)


class SamPredictor:
    """Box-prompted predictor (reference segmentor.py segment_with_box)."""

    def __init__(self, variant: str = "vit_b", params=None, rng_seed: int = 0,
                 img_size: int = IMAGE_SIZE):
        cfg = SAM_CONFIGS[variant]
        self.img_size = img_size
        self.encoder = ImageEncoderViT(
            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"], global_attn=cfg["global_attn"],
            img_size=img_size,
        )
        self.prompt = PromptEncoder(img_size=img_size)
        self.mask_prompt = MaskPromptEncoder()
        self.decoder = MaskDecoder()
        if params is None:
            from ...models import zoo

            params = zoo.load_params(f"sam_{variant}")
        if params is None:
            params = self._init(jax.random.PRNGKey(rng_seed))
        self.params = params
        self._embed = jax.jit(
            lambda p, x: self.encoder.apply(p["encoder"], x)
        )

        @jax.jit
        def _decode(p, image_embed, boxes):
            sparse, dense_pe, no_mask = self.prompt.apply(p["prompt"], boxes)
            return self.decoder.apply(
                p["decoder"], image_embed, dense_pe, sparse, no_mask
            )

        @jax.jit
        def _decode_with_mask(p, image_embed, boxes, mask_logits):
            sparse, dense_pe, _ = self.prompt.apply(p["prompt"], boxes)
            dense = self.mask_prompt.apply(
                p["mask_prompt"], mask_logits[..., None]
            )
            return self.decoder.apply(
                p["decoder"], image_embed, dense_pe, sparse, dense
            )

        self._decode = _decode
        self._decode_with_mask = _decode_with_mask

        @functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
        def _segment_batch(p, image_embed, boxes, nh, nw, h, w):
            """Both decoder passes + best-mask selection + full-res
            thresholding for a BATCH of box prompts in ONE program.  The
            reference (and the single-box path) pays two dispatches and two
            scalar readbacks PER BOX — at hundreds of detector proposals
            that serializes hundreds of round trips."""
            embed = jnp.broadcast_to(
                image_embed, (boxes.shape[0],) + image_embed.shape[1:]
            )
            masks, iou = _decode(p, embed, boxes)
            best = 1 + jnp.argmax(iou[:, 1:], axis=-1)           # (B,)
            sel = jnp.take_along_axis(
                masks, best[:, None, None, None], axis=1
            )[:, 0]
            masks, iou = _decode_with_mask(p, embed, boxes, sel)
            best = 1 + jnp.argmax(iou[:, 1:], axis=-1)
            sel = jnp.take_along_axis(
                masks, best[:, None, None, None], axis=1
            )[:, 0]                                               # (B, g4, g4)
            m = jax.image.resize(
                sel, (sel.shape[0], self.img_size, self.img_size), "bilinear"
            )[:, :nh, :nw]
            m = jax.image.resize(m, (m.shape[0], h, w), "bilinear")
            return m > 0.0

        self._segment_batch = _segment_batch
        self._image_embed = None
        self._orig_hw = None

    def _init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        g = self.img_size // 16
        enc = self.encoder.init(k1, jnp.zeros((1, self.img_size, self.img_size, 3)))
        pr = self.prompt.init(k2, jnp.zeros((1, 2, 2)))
        sparse, dense_pe, _ = self.prompt.apply(pr, jnp.zeros((1, 2, 2)))
        dec = self.decoder.init(
            k3, jnp.zeros((1, g, g, PROMPT_DIM)), dense_pe, sparse
        )
        mp = self.mask_prompt.init(k4, jnp.zeros((1, 4 * g, 4 * g, 1)))
        return {"encoder": enc, "prompt": pr, "decoder": dec,
                "mask_prompt": mp}

    def set_image(self, rgb: np.ndarray):
        """rgb: (H, W, 3) float in [0,1] or uint8."""
        import cv2

        rgb = np.asarray(rgb)
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        h, w = rgb.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(rgb, (nw, nh)).astype(np.float32)
        img = (img - PIXEL_MEAN) / PIXEL_STD
        img = np.pad(img, ((0, self.img_size - nh), (0, self.img_size - nw), (0, 0)))
        self._image_embed = self._embed(self.params, jnp.asarray(img)[None])
        self._orig_hw = (h, w)
        self._scaled_hw = (nh, nw)

    def segment_with_box(self, box_xyxy) -> np.ndarray:
        """box in original-image pixels → (H, W) bool mask (best of 4)."""
        return self.segment_with_boxes([box_xyxy])[0]

    # boxes per jitted chunk: bounds the (B, H, W) full-res resize
    # transient (~270 MB f32 at 32×1024²) and the compile-key bucket count
    SEG_CHUNK = 32

    def _segment_chunks_device(self, boxes_xyxy):
        """Run the batched decoder over pow2 chunks; returns
        (device_chunks, valid_counts) with masks kept ON DEVICE.

        Two decoder passes like the reference (segmentor.py:90-107) —
        box-only multimask, then refine with the best low-res logits as a
        mask prompt; best by predicted iou (masks[1:4]; mask 0 is the
        single-mask head).  Unlike the reference's per-box python loop the
        whole chunk runs as ONE program with on-device best-mask
        selection — at hundreds of detector proposals the per-box path
        serializes 2 dispatches + 2 scalar readbacks each."""
        assert self._image_embed is not None, "call set_image first"
        boxes_xyxy = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4)
        B = len(boxes_xyxy)
        h, w = self._orig_hw
        if B == 0:
            return [], []
        nh, nw = self._scaled_hw
        sx, sy = nw / w, nh / h
        pts = np.stack(
            [boxes_xyxy[:, 0] * sx, boxes_xyxy[:, 1] * sy,
             boxes_xyxy[:, 2] * sx, boxes_xyxy[:, 3] * sy], -1
        ).reshape(B, 2, 2)
        chunks, counts = [], []
        for s in range(0, B, self.SEG_CHUNK):
            chunk = pts[s: s + self.SEG_CHUNK]
            k = len(chunk)
            kb = 1
            while kb < k:
                kb *= 2
            if kb != k:  # pow2 bucket: repeat-pad (bounded compile keys)
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[-1:], (kb - k, 2, 2))], 0
                )
            chunks.append(self._segment_batch(
                self.params, self._image_embed, jnp.asarray(chunk),
                nh, nw, h, w,
            ))
            counts.append(k)
        return chunks, counts

    def segment_with_boxes(self, boxes_xyxy) -> np.ndarray:
        """Batched box-prompted segmentation: (B, 4) pixel boxes →
        (B, H, W) bool masks (host).  See ``_segment_chunks_device``."""
        h, w = self._orig_hw
        chunks, counts = self._segment_chunks_device(boxes_xyxy)
        if not chunks:
            return np.zeros((0, h, w), bool)
        return np.concatenate(
            [np.asarray(m[:k]) for m, k in zip(chunks, counts)], 0
        )

    def segment_composite(self, boxes_xyxy, min_area: int, first_id: int):
        """Detection-frame fast path: segment every box and composite the
        kept masks into ONE instance map ENTIRELY on device.

        Reading each chunk's (32, H, W) bool masks back costs ~29 MB a
        chunk (~120 MB per detection frame at 100 proposals — measured as
        the dominant ta_detect cost through the tunnel); this path reads
        back only the per-box areas (B floats) to apply ``min_area`` with
        the reference's sequential id assignment, then one (H, W) int32
        map.  First-wins composition = the reference's sequential
        ``instance[mask & (instance == 0)]``.

        Returns (instance (H, W) int32, ids (B,) int32 — 0 where dropped).
        """
        chunks, counts = self._segment_chunks_device(boxes_xyxy)
        h, w = self._orig_hw
        if not chunks:
            return np.zeros((h, w), np.int32), np.zeros((0,), np.int32)
        areas = np.concatenate([
            np.asarray(jnp.sum(m[:k], axis=(1, 2))).astype(np.int64)
            for m, k in zip(chunks, counts)
        ])
        ids = np.zeros(len(areas), np.int32)
        next_id = first_id
        for i, a in enumerate(areas):
            if a >= min_area:
                ids[i] = next_id
                next_id += 1
        # pad the stacked masks to a pow2 total so the composite program
        # compiles once per bucket; padding rows carry id 0 (ignored)
        valid = [m[:k] for m, k in zip(chunks, counts)]
        B = sum(counts)
        Bb = 1
        while Bb < B:
            Bb *= 2
        masks = jnp.concatenate(
            valid + ([jnp.zeros((Bb - B, h, w), bool)] if Bb != B else []), 0
        )
        ids_pad = np.zeros(Bb, np.int32)
        ids_pad[:B] = ids
        inst = _composite_first_wins(masks, jnp.asarray(ids_pad))
        return np.asarray(inst), ids
