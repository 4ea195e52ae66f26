"""GroundingDINO: open-vocabulary detection, TPU-native flax port.

Reference: /root/reference/vipe/priors/track_anything/groundingdino/ —
Swin-T backbone + BERT text encoder + feature-enhancer encoder (deformable
self-attn, image↔text fusion, text enhancer) + two-stage query selection +
cross-modality decoder (models/main/groundingdino.py:37-427,
transformer.py:40-957), glued per detector.py:19-105.

The compute path is one jitted program per (canvas, text-bucket) shape:
tokenization / thresholding / phrase decoding stay on the host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bert import (
    BertConfig,
    BertEncoder,
    generate_special_token_masks,
    make_tokenizer,
)
from .swin import SwinTransformer
from .transformer import (
    MLP,
    BiAttentionBlock,
    DeformableDecoderLayer,
    DeformableEncoderLayer,
    TextEnhancerLayer,
    encoder_reference_points,
    inverse_sigmoid,
    output_proposals,
    sine_embed_hw,
    sine_pos_embed,
)


@dataclasses.dataclass(frozen=True)
class GDINOConfig:
    """swin_T_224_1k GroundingDINO (reference config.py)."""

    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    num_queries: int = 900
    num_levels: int = 4
    enc_points: int = 4
    dec_points: int = 4
    max_text_len: int = 256
    # swin
    swin_embed_dim: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin_window: int = 7
    # bert
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)

    @staticmethod
    def tiny() -> "GDINOConfig":
        """Small config for CPU tests (same topology, tiny dims)."""
        return GDINOConfig(
            hidden_dim=32, nheads=4, enc_layers=2, dec_layers=2, ffn_dim=64,
            num_queries=20, swin_embed_dim=16, swin_depths=(1, 1, 1, 1),
            swin_heads=(1, 2, 4, 8), swin_window=4, max_text_len=64,
            bert=BertConfig(
                vocab_size=30522, hidden_size=48, num_layers=2, num_heads=4,
                intermediate_size=96,
            ),
        )


class GroundingDINOModel(nn.Module):
    cfg: GDINOConfig = dataclasses.field(default_factory=GDINOConfig)

    @nn.compact
    def __call__(self, image, input_ids, text_mask3d, position_ids,
                 text_token_mask):
        """image (B, H, W, 3) normalized; input_ids (B, Lt) int32;
        text_mask3d (B, Lt, Lt) bool; position_ids (B, Lt); text_token_mask
        (B, Lt) bool.  Returns (pred_logits (B, nq, max_text_len),
        pred_boxes (B, nq, 4) cxcywh in [0,1])."""
        c = self.cfg
        d = c.hidden_dim
        B = image.shape[0]

        # ------------------------------------------------------------ text
        text_feat = BertEncoder(c.bert, name="bert")(
            input_ids, text_mask3d, position_ids
        )
        text = nn.Dense(d, name="feat_map")(text_feat)  # (B, Lt, d)

        # ----------------------------------------------------------- image
        feats = SwinTransformer(
            c.swin_embed_dim, c.swin_depths, c.swin_heads, c.swin_window,
            name="backbone",
        )(image)  # strides 8/16/32
        gn = min(32, d)
        srcs = []
        for i, f in enumerate(feats):
            x = nn.Conv(d, (1, 1), name=f"input_proj_{i}")(f)
            srcs.append(nn.GroupNorm(gn, name=f"input_proj_norm_{i}")(x))
        x = nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name=f"input_proj_{len(feats)}")(feats[-1])
        srcs.append(
            nn.GroupNorm(gn, name=f"input_proj_norm_{len(feats)}")(x)
        )

        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.num_levels, d)
        )
        src_flat, pos_flat = [], []
        for lvl, s in enumerate(srcs):
            h, w = spatial_shapes[lvl]
            src_flat.append(s.reshape(B, h * w, d))
            pos = jnp.asarray(sine_embed_hw(h, w, d))
            pos_flat.append(
                pos.reshape(1, h * w, d) + level_embed[lvl][None, None]
            )
        src = jnp.concatenate(src_flat, 1)     # (B, S, d)
        pos = jnp.concatenate(pos_flat, 1)     # (1, S, d)

        # --------------------------------------------------------- encoder
        ref_pts = jnp.asarray(encoder_reference_points(spatial_shapes))
        pos_text = sine_pos_embed(
            position_ids[..., None].astype(jnp.float32), d, exchange_xy=False
        )
        out = src
        for i in range(c.enc_layers):
            out, text = BiAttentionBlock(
                d, d, c.ffn_dim // 2, c.nheads // 2, name=f"fusion_{i}"
            )(out, text, text_token_mask)
            text = TextEnhancerLayer(
                d, c.nheads // 2, c.ffn_dim // 2, name=f"text_layer_{i}"
            )(text, pos_text, text_mask3d)
            out = DeformableEncoderLayer(
                d, c.nheads, c.num_levels, c.enc_points, c.ffn_dim,
                name=f"enc_layer_{i}",
            )(out, pos, ref_pts, spatial_shapes)
        memory = out

        # --------------------------- two-stage query selection (standard)
        props, props_valid = output_proposals(spatial_shapes)
        props = jnp.asarray(props)[None]             # (1, S, 4) unsigmoided
        om = jnp.where(jnp.asarray(props_valid)[None, :, None], memory, 0.0)
        om = nn.LayerNorm(name="enc_output_norm")(
            nn.Dense(d, name="enc_output")(om)
        )
        enc_logits = self._contrastive(om, text, text_token_mask)
        enc_boxes = props + MLP(d, 4, 3, name="enc_out_bbox_embed")(om)
        topk_scores = jnp.max(enc_logits, -1)        # (B, S)
        topk_idx = jax.lax.top_k(topk_scores, c.num_queries)[1]
        ref_unsig = jnp.take_along_axis(
            enc_boxes, topk_idx[..., None], axis=1
        )                                            # (B, nq, 4)
        tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (c.num_queries, d)
        )
        tgt = jnp.broadcast_to(tgt_embed[None], (B, c.num_queries, d))

        # --------------------------------------------------------- decoder
        # bbox head + ref_point_head + final norm are SHARED across layers
        # (dec_pred_bbox_embed_share=True, reference groundingdino.py:163-178)
        bbox_embed = MLP(d, 4, 3, name="bbox_embed")
        ref_point_head = MLP(d, d, 2, name="ref_point_head")
        dec_norm = nn.LayerNorm(name="dec_norm")
        reference = nn.sigmoid(ref_unsig)
        hs_last = tgt
        for i in range(c.dec_layers):
            qs = sine_pos_embed(reference, d // 2)   # (B, nq, 2d)
            query_pos = ref_point_head(qs)
            hs_last = DeformableDecoderLayer(
                d, c.nheads, c.num_levels, c.dec_points, c.ffn_dim,
                name=f"dec_layer_{i}",
            )(
                hs_last, query_pos,
                jnp.broadcast_to(
                    reference[:, :, None], reference.shape[:2] + (c.num_levels, 4)
                ),
                memory, spatial_shapes, text, text_token_mask,
            )
            # iterative box refinement (reference transformer.py:708-721):
            # bbox_embed consumes the RAW layer output; dec_norm applies only
            # to the classification path (intermediate.append(self.norm(...)))
            delta = bbox_embed(hs_last)
            reference = nn.sigmoid(delta + inverse_sigmoid(reference))

        hs_final = dec_norm(hs_last)
        logits = self._contrastive(hs_final, text, text_token_mask)
        Lt = logits.shape[-1]
        logits = jnp.pad(
            logits, ((0, 0), (0, 0), (0, c.max_text_len - Lt)),
            constant_values=-1e9,
        )
        return logits, reference

    @staticmethod
    def _contrastive(x, text, text_token_mask):
        """ContrastiveEmbed (reference utils.py:223-258)."""
        res = jnp.einsum("bqd,bld->bql", x, text)
        return jnp.where(text_token_mask[:, None, :], res, -1e9)


# ------------------------------------------------------------- host glue


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _text_bucket(n: int, cap: int) -> int:
    b = 32
    while b < n:
        b *= 2
    return min(b, cap)


class GroundingDINODetector:
    """Detector API for SegTracker (reference detector.py:19-105):
    ``run_grounding(rgb, phrases) -> list of xyxy pixel boxes``.

    Host responsibilities: aspect-preserving resize to a /32 canvas
    (reference RandomResize([800], max_size=1333)), ImageNet normalization,
    tokenization + per-phrase masks, thresholding and box format conversion.
    One compiled program per (canvas, text bucket).
    """

    def __init__(self, cfg: Optional[GDINOConfig] = None, params=None,
                 box_threshold: float = 0.35, short_side: int = 800,
                 max_side: int = 1333, rng_seed: int = 0,
                 max_detections: int = 100):
        self.cfg = cfg or GDINOConfig()
        self.model = GroundingDINOModel(self.cfg)
        self.box_threshold = box_threshold
        self.max_detections = max_detections
        self.short_side = short_side
        self.max_side = max_side
        self.tokenizer = make_tokenizer()
        if params is None:
            from ....models import zoo

            params = zoo.load_params("gdino")
        self._params = params
        self._rng_seed = rng_seed
        self._apply = jax.jit(
            lambda p, *a: self.model.apply(p, *a)
        )

    def _ensure_params(self, image, ids, m3, pid, tmask):
        if self._params is None:
            self._params = self.model.init(
                jax.random.PRNGKey(self._rng_seed), image, ids, m3, pid, tmask
            )
        return self._params

    def _preprocess(self, rgb: np.ndarray) -> np.ndarray:
        import cv2

        h, w = rgb.shape[:2]
        s = self.short_side / min(h, w)
        if max(h, w) * s > self.max_side:
            s = self.max_side / max(h, w)
        h1 = max(32, int(round(h * s / 32)) * 32)
        w1 = max(32, int(round(w * s / 32)) * 32)
        img = cv2.resize(np.asarray(rgb, np.float32), (w1, h1))
        if img.max() > 1.5:
            img = img / 255.0
        return (img - IMAGENET_MEAN) / IMAGENET_STD

    def run_grounding(self, rgb: np.ndarray, phrases: List[str],
                      return_phrases: bool = False):
        rgb = np.asarray(rgb)
        H0, W0 = rgb.shape[:2]
        caption = " . ".join(p.strip().lower() for p in phrases) + " ."
        ids = self.tokenizer(caption)[: self.cfg.max_text_len]
        Lb = _text_bucket(len(ids), self.cfg.max_text_len)
        ids_pad = np.zeros((1, Lb), np.int32)
        ids_pad[0, : len(ids)] = ids
        m3, pid = generate_special_token_masks(ids_pad)
        tmask = np.zeros((1, Lb), bool)
        tmask[0, : len(ids)] = True

        img = self._preprocess(rgb)[None]
        args = (
            jnp.asarray(img), jnp.asarray(ids_pad), jnp.asarray(m3),
            jnp.asarray(pid, jnp.int32), jnp.asarray(tmask),
        )
        params = self._ensure_params(*args)
        logits, boxes = self._apply(params, *args)
        logits = np.asarray(jax.nn.sigmoid(logits[0]))   # (nq, max_text_len)
        boxes = np.asarray(boxes[0])                     # (nq, 4) cxcywh

        scores = logits.max(-1)
        keep = scores > self.box_threshold
        boxes, logits, scores = boxes[keep], logits[keep], scores[keep]
        if len(boxes) > self.max_detections:
            # score-ordered cap: trained weights yield a handful of boxes
            # and never hit this; it bounds the downstream per-box work
            # (SAM segmentation, mask compositing) when an uncalibrated
            # model floods proposals past the threshold
            order = np.argsort(-scores)[: self.max_detections]
            boxes, logits = boxes[order], logits[order]

        # cxcywh (normalized) → xyxy pixels in the ORIGINAL frame
        cx, cy, bw, bh = boxes.T * np.asarray([[W0], [H0], [W0], [H0]])
        xyxy = np.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1
        )
        if not return_phrases:
            return [b for b in xyxy]
        names = self._phrases_for(logits, ids, phrases)
        return [b for b in xyxy], names

    def _phrases_for(self, logits: np.ndarray, ids: List[int],
                     phrases: List[str]) -> List[str]:
        """Best '.'-delimited segment per detection (reference
        util/utils.py:528-560)."""
        from .bert import CLS_ID, DOT_ID, SEP_ID

        segments, cur = [], []
        for t, tok in enumerate(ids):
            if tok in (CLS_ID, SEP_ID):
                continue
            if tok == DOT_ID:
                if cur:
                    segments.append(cur)
                    cur = []
            else:
                cur.append(t)
        if cur:
            segments.append(cur)
        out = []
        for lg in logits:
            scores = [lg[seg].sum() for seg in segments]
            k = int(np.argmax(scores)) if scores else 0
            out.append(phrases[k] if k < len(phrases) else "")
        return out
