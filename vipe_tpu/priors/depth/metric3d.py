"""Metric3D v2: canonical-space metric monocular depth (flax).

Reference: /root/reference/vipe/priors/depth/metric3d/ — DINOv2 ViT backbone
tapped at 4 depths + ``RAFTDepthNormalDPT5`` decoder
(model/decode_heads/RAFTDepthNormalDPTDecoder5.py:900-1200):
Token2Feature readouts (scales 1/14, 1/14, 1/7, 2/7), top-down FuseBlock
fusion, a 256-log-bin depth regressor (softmax expectation over
exp-spaced anchors between depth_normalize bounds), a normal head, and
iterative ConvGRU refinement of the depth field.

The canonical-space trick (reference metric3d/__init__.py:67-138): inputs are
letterboxed to 616×1064; the network predicts depth in a canonical camera of
focal 1000, and outputs are rescaled by ``focal · scale / 1000``.  Depth type
METRIC_DEPTH: focal-scalable WITHOUT a rerun (the SLAM buffer exploits this,
reference buffer.py:246-251).

Fidelity notes vs the reference decoder (documented simplifications, to be
tightened when checkpoints are available for activation-level tests):
single-level ConvGRU refinement instead of the 3-level slow-fast hierarchy,
and LoRA adapters omitted (inference-time they are merged side branches).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...models.vit import VIT_CONFIGS, make_vit
from .base import DepthEstimationInput, DepthEstimationModel, DepthEstimationResult, DepthType
from .dav2 import IMAGENET_MEAN, IMAGENET_STD

CANONICAL_SIZE = (616, 1064)
CANONICAL_FOCAL = 1000.0

METRIC3D_TAPS = {
    "small": (2, 5, 8, 11),
    "large": (5, 11, 17, 23),
}


class Token2Feature(nn.Module):
    """Project ViT tokens to a feature map at a scale (decoder :833-897)."""

    out: int
    scale: float

    @nn.compact
    def __call__(self, tokens, ph, pw):
        B, N, D = tokens.shape
        x = tokens.reshape(B, ph, pw, D)
        if self.scale != 1:
            nh = int(round(ph * self.scale))
            nw = int(round(pw * self.scale))
            x = jax.image.resize(x, (B, nh, nw, D), "bilinear")
        return nn.Conv(self.out, (3, 3), name="proj")(x)


class FuseBlock(nn.Module):
    """Upsample + skip fusion conv block (decoder :763-802)."""

    out: int
    scale: float = 2.0

    @nn.compact
    def __call__(self, x, skip=None):
        if self.scale != 1:
            B, H, W, C = x.shape
            x = jax.image.resize(
                x, (B, int(round(H * self.scale)), int(round(W * self.scale)), C),
                "bilinear",
            )
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                skip = jax.image.resize(
                    skip, x.shape[:3] + (skip.shape[-1],), "bilinear"
                )
            x = jnp.concatenate([x, skip], axis=-1)
        y = nn.Conv(self.out, (3, 3), name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out, (3, 3), name="conv2")(y)
        return nn.relu(y)


class ConvGRUCell(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.dim, (3, 3), name="convz")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.dim, (3, 3), name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.dim, (3, 3), name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class Metric3DDecoder(nn.Module):
    feature_channels: Sequence[int] = (256, 512, 1024, 1024)
    hidden_dim: int = 128
    num_bins: int = 256
    min_depth: float = 0.1
    max_depth: float = 200.0
    iters: int = 4

    @nn.compact
    def __call__(self, taps, ph, pw):
        fc = self.feature_channels
        # readouts: [2/7x of 1/14, 1/7(=2x), 1/14, 1/14] like EncoderFeature
        f3 = Token2Feature(fc[3], 1.0, name="read_3")(taps[3][0], ph, pw)
        f2 = Token2Feature(fc[2], 1.0, name="read_2")(taps[2][0], ph, pw)
        f1 = Token2Feature(fc[1], 2.0, name="read_1")(taps[1][0], ph, pw)
        f0 = Token2Feature(fc[0], 3.5, name="read_0")(taps[0][0], ph, pw)

        x = FuseBlock(fc[3], scale=1.0, name="upconv_3")(f3)
        x = FuseBlock(fc[2], scale=2.0, name="upconv_2")(x, f2)
        x = FuseBlock(fc[1], scale=1.75, name="upconv_1")(x, f1)  # → ~1/4

        # depth-bin regression: softmax expectation over log-spaced anchors
        bins = jnp.exp(jnp.linspace(
            np.log(self.min_depth), np.log(self.max_depth), self.num_bins
        ))
        logits = nn.Conv(self.num_bins, (3, 3), name="depth_regressor1")(x)
        logits = nn.relu(logits)
        logits = nn.Conv(self.num_bins, (1, 1), name="depth_regressor2")(logits)
        prob = jax.nn.softmax(logits, axis=-1)
        depth = jnp.einsum("bhwk,k->bhw", prob, bins)

        n = nn.Conv(128, (3, 3), name="normal1")(x)
        n = nn.relu(n)
        n = nn.Conv(128, (1, 1), name="normal2")(n)
        n = nn.relu(n)
        n = nn.Conv(128, (1, 1), name="normal3")(n)
        n = nn.relu(n)
        normals = nn.Conv(3, (1, 1), name="normal4")(n)
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-6
        )

        # iterative ConvGRU refinement of log-depth (single level)
        ctx = nn.Conv(self.hidden_dim, (3, 3), name="context")(x)
        hidden = jnp.tanh(nn.Conv(self.hidden_dim, (3, 3), name="hidden0")(x))
        gru = ConvGRUCell(self.hidden_dim, name="gru")
        head1 = nn.Conv(self.hidden_dim, (3, 3), name="flow_head1")
        head2 = nn.Conv(1, (3, 3), name="flow_head2")
        logd = jnp.log(jnp.maximum(depth, self.min_depth))[..., None]
        for _ in range(self.iters):
            inp = jnp.concatenate([ctx, logd], axis=-1)
            hidden = gru(hidden, inp)
            delta = head2(nn.relu(head1(hidden)))
            logd = logd + delta
        depth = jnp.exp(jnp.clip(logd[..., 0],
                                 np.log(self.min_depth), np.log(self.max_depth)))

        return depth, normals, prob


class Metric3DNet:
    def __init__(self, variant: str = "small", params=None, rng_seed: int = 0,
                 iters: int = 4):
        vit_variant = {"small": "vits", "large": "vitl", "giant2": "vitg"}.get(
            variant, variant
        )
        self.taps = METRIC3D_TAPS.get(variant, METRIC3D_TAPS["small"])
        self.vit = make_vit(vit_variant)
        scale = VIT_CONFIGS[vit_variant]["embed_dim"] // 256
        self.decoder = Metric3DDecoder(iters=iters)
        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng_seed))
        self.params = params

        @jax.jit
        def _forward(params, x):
            taps = self.vit.apply(params["vit"], x, tap_layers=self.taps)
            ph, pw = x.shape[1] // 14, x.shape[2] // 14
            return self.decoder.apply(params["decoder"], taps, ph, pw)

        self._forward = _forward

    def init_params(self, key, h: int = 70, w: int = 70):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, h, w, 3))
        vit_params = self.vit.init(k1, x, tap_layers=self.taps)
        taps = self.vit.apply(vit_params, x, tap_layers=self.taps)
        dec_params = self.decoder.init(k2, taps, h // 14, w // 14)
        return {"vit": vit_params, "decoder": dec_params}

    def __call__(self, x):
        return self._forward(self.params, x)


class Metric3DModel(DepthEstimationModel):
    """Adapter with the canonical-space letterbox + focal rescaling
    (reference Metric3DDepthModel, metric3d/__init__.py:33-165)."""

    depth_type = DepthType.METRIC_DEPTH

    def __init__(self, variant: str = "small", params=None,
                 input_size=None):
        self.net = Metric3DNet(variant, params)
        self.input_size = input_size or CANONICAL_SIZE

    def estimate(self, inp: DepthEstimationInput) -> DepthEstimationResult:
        import cv2

        rgb = np.asarray(inp.rgb, np.float32)
        h, w = rgb.shape[:2]
        th, tw = self.input_size
        scale = min(th / h, tw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        # letterbox pad to the canonical size, /14-aligned
        th14, tw14 = (th // 14) * 14, (tw // 14) * 14
        pt = max((th14 - nh) // 2, 0)
        pl = max((tw14 - nw) // 2, 0)
        canvas = np.zeros((th14, tw14, 3), np.float32)
        canvas[pt: pt + min(nh, th14), pl: pl + min(nw, tw14)] = (
            img[: th14 - pt, : tw14 - pl]
        )

        depth_c, normals, _ = self.net(jnp.asarray(canvas)[None])
        dh, dw = depth_c.shape[1:3]
        sy, sx = dh / th14, dw / tw14
        crop = depth_c[0][
            int(pt * sy): int((pt + min(nh, th14)) * sy),
            int(pl * sx): int((pl + min(nw, tw14)) * sx),
        ]
        depth = jax.image.resize(crop, (h, w), "bilinear")
        if inp.focal_length is not None:
            # de-canonicalize (reference :137): canonical focal 1000 at the
            # letterboxed scale
            depth = depth * (float(inp.focal_length) * scale / CANONICAL_FOCAL)
        return DepthEstimationResult(depth=depth)
