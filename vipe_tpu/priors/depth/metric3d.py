"""Metric3D v2: canonical-space metric monocular depth (flax).

Reference: /root/reference/vipe/priors/depth/metric3d/ — DINOv2-reg ViT
backbone (4 register tokens) tapped at 4 depths + the ``RAFTDepthNormalDPT5``
decoder (model/decode_heads/RAFTDepthNormalDPTDecoder5.py:900-1325),
replicated component-for-component so released checkpoints convert
key-by-key:

  * EncoderFeature: Readout (project_patch + project_learn over
    cls+register tokens) → Token2Feature at scales 1, 1, 2, 7/2
    (decoder :805-954);
  * DecoderFeature: upconv_3/2/1 FuseBlocks (residual ConvBlocks + 1×1 out,
    bilinear align-corners upsampling ×1/×2/×7⁄4) → 1/4-res feature map with
    2 confidence channels (:955-996);
  * 256-log-bin depth regressor (softmax expectation over exp-spaced anchors
    in depth_normalize=(0.1, 200)), 4-channel normal head with
    ELU-kappa normalization (:1036-1126);
  * ContextFeatureEncoder (layer-norm ResidualBlocks) + context_zqr convs +
    the 3-level slow-fast ConvGRU hierarchy (gru32 → gru16 → gru08) with
    FlowHead and convex-upsample mask, ``iters`` refinement steps
    (:494-573, :1231-1311).

LoRA adapters are rank-0 at inference in every released checkpoint (r=8 only
under tuning_mode='lora' fine-tuning) — the plain conv weights ARE the
checkpoint weights, so no LoRA branches are needed for parity.

The canonical-space trick (reference metric3d/__init__.py:67-138): inputs are
letterboxed to 616×1064; the network predicts depth in a canonical camera of
focal 1000, and outputs are rescaled by ``focal · scale / 1000``.  Depth type
METRIC_DEPTH: focal-scalable WITHOUT a rerun (the SLAM buffer exploits this,
reference buffer.py:246-251).
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

# cfg.model.decode_head per variant (configs/vit.raft5.{small,large}.py)
METRIC3D_CFGS = {
    "small": dict(
        vit="vits", D=384,
        feature_channels=(96, 192, 384, 768),
        decoder_channels=(48, 96, 192, 384, 384),
        hidden=48, iters=4,
    ),
    "large": dict(
        vit="vitl", D=1024,
        feature_channels=(256, 512, 1024, 1024),
        decoder_channels=(128, 256, 512, 1024, 1024),
        hidden=128, iters=8,
    ),
}

MIN_DEPTH, MAX_DEPTH = 0.1, 200.0   # data_basic.depth_normalize
REGRESS_SCALE = 100.0
NUM_ANCHORS = 256
N_DOWNSAMPLE = 2                    # convex-upsample factor 2² = 4


def _resize_ac(x, hw):
    """Bilinear align_corners=True (interpolate_float32 in the reference)."""
    from ..track_anything.deaot.network import resize_align_corners

    return resize_align_corners(x, hw)


def _norm_normalize(x):
    """Unit-normalize xyz, ELU+1+0.01 kappa (decoder :314-320)."""
    n = jnp.sqrt(jnp.sum(x[..., :3] ** 2, -1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(x[..., 3:4]) + 1.0 + 0.01
    return jnp.concatenate([x[..., :3] / n, kappa], -1)


class Readout(nn.Module):
    """cls/register-conditioned token projection (decoder :805-832)."""

    @nn.compact
    def __call__(self, patch, extras):
        B, H, W, D = patch.shape
        x_patch = nn.Dense(D, name="project_patch")(patch)
        learn = extras.reshape(B, 1, 1, -1)  # (B,1,1,(1+R)·D)
        x_learn = nn.Dense(D, use_bias=False, name="project_learn")(learn)
        return jax.nn.gelu(x_patch + x_learn)


class Token2Feature(nn.Module):
    """Readout + per-scale resampling conv (decoder :900-954):
    scale 1 → identity; int scale s>1 → ConvTranspose(k=s, s=s);
    float scale >1 → nearest ×s then 1×1 conv."""

    out: int
    scale: float

    @nn.compact
    def __call__(self, patch, extras):
        x = Readout(name="readoper")(patch, extras)
        B, H, W, D = x.shape
        s = self.scale
        if s == 1:
            return x  # identity sample (out == D by construction)
        if float(s).is_integer():
            return nn.ConvTranspose(
                self.out, (int(s), int(s)), strides=(int(s), int(s)),
                name="sample",
            )(x)
        nh, nw = int(H * s), int(W * s)
        x = jax.image.resize(x, (B, nh, nw, D), "nearest")
        return nn.Conv(self.out, (1, 1), name="sample")(x)


class ConvBlock(nn.Module):
    """Pre-activation residual double conv (decoder :732-762)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), name="conv2")(y)
        return x + y


class FuseBlock(nn.Module):
    """DPT-style fusion (decoder :763-802)."""

    channels: int
    out: int
    fuse: bool = True
    upsample: bool = True
    scale: float = 2.0

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is not None:
            x1 = x1 + ConvBlock(self.channels, name="way_branch")(x2)
        out = ConvBlock(self.channels, name="way_trunk")(x1)
        if self.upsample:
            B, H, W, C = out.shape
            out = _resize_ac(out, (int(H * self.scale), int(W * self.scale)))
        return nn.Conv(self.out, (1, 1), name="out_conv")(out)


class ResidualBlockLN(nn.Module):
    """RAFT residual block with LayerNorm2d (decoder :586-667, 'layer')."""

    out: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out, (3, 3), name="conv1")(x)
        y = nn.LayerNorm(name="norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out, (3, 3), name="conv2")(y)
        y = nn.LayerNorm(name="norm2")(y)
        y = nn.relu(y)
        if x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1), name="downsample")(x)
            x = nn.LayerNorm(name="norm3")(x)
        return nn.relu(x + y)


class ContextOut(nn.Module):
    """ResidualBlock('layer') + 3×3 conv (ContextFeatureEncoder :676-719)."""

    out: int

    @nn.compact
    def __call__(self, x):
        x = ResidualBlockLN(self.out, name="res")(x)
        return nn.Conv(self.out, (3, 3), name="conv")(x)


class ConvGRU(nn.Module):
    """Context-injected ConvGRU (decoder :440-492)."""

    hidden: int

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        x = jnp.concatenate(x_list, -1)
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3), name="convz")(hx) + cz)
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3), name="convr")(hx) + cr)
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3), name="convq")(
                jnp.concatenate([r * h, x], -1)
            ) + cq
        )
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    """Split depth/normal delta head (decoder :393-437)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        d = nn.Conv(self.hidden, (3, 3), name="conv1d")(x)
        d = nn.Conv(2, (3, 3), name="conv2d")(nn.relu(d))
        n = nn.Conv(self.hidden, (3, 3), name="conv1n")(x)
        n = nn.Conv(4, (3, 3), name="conv2n")(nn.relu(n))
        return jnp.concatenate([d, n], -1)


def _pool2x(x):
    # torch F.avg_pool2d default count_include_pad=True (decoder :486)
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class UpdateBlock(nn.Module):
    """BasicMultiUpdateBlock: 3-level slow-fast GRU hierarchy + flow head +
    convex-upsample mask (decoder :494-573)."""

    hidden: int

    def setup(self):
        h = self.hidden
        self.gru08 = ConvGRU(h)
        self.gru16 = ConvGRU(h)
        self.gru32 = ConvGRU(h)
        # FlowHead(hidden_dims[2], hidden_dim=2·hidden_dims[2]) → inner dim h
        self.flow_head = FlowHead(h)
        factor = 2 ** N_DOWNSAMPLE
        self.mask0 = nn.Conv(h, (3, 3))
        self.mask2 = nn.Conv(factor * factor * 9, (1, 1))

    def __call__(self, net, inp, flow=None, iter08=True, iter16=True,
                 iter32=True, update=True):
        net = list(net)
        if iter32:
            net[2] = self.gru32(net[2], *inp[2], _pool2x(net[1]))
        if iter16:
            net[1] = self.gru16(
                net[1], *inp[1],
                _resize_ac(_pool2x(net[0]), net[1].shape[1:3]),
                _resize_ac(net[2], net[1].shape[1:3]),
            )
        if iter08:
            net[0] = self.gru08(
                net[0], *inp[0], flow,
                _resize_ac(net[1], net[0].shape[1:3]),
            )
        if not update:
            return net
        delta = self.flow_head(net[0])
        mask = 0.25 * self.mask2(nn.relu(self.mask0(net[0])))
        return net, mask, delta


def _convex_upsample(flow, mask):
    """9-neighborhood convex upsampling ×4 (decoder :1152-1166), NHWC."""
    B, H, W, D = flow.shape
    factor = 2 ** N_DOWNSAMPLE
    m = mask.reshape(B, H, W, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)
    # unfold 3×3 neighborhoods
    pad = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([
        pad[:, dy: dy + H, dx: dx + W] for dy in range(3) for dx in range(3)
    ], axis=3)  # (B,H,W,9,D)
    up = jnp.einsum("bhwkuv,bhwkd->bhwuvd", m, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * factor, W * factor, D)


class Metric3DDecoder(nn.Module):
    """RAFTDepthNormalDPT5 (decoder :998-1325), NHWC flax."""

    feature_channels: Sequence[int]
    decoder_channels: Sequence[int]
    hidden: int
    iters: int

    @nn.compact
    def __call__(self, taps, ph, pw):
        fc = self.feature_channels
        dc = self.decoder_channels

        def t2f(i, tap, out, scale):
            patch, extras = tap
            B = patch.shape[0]
            grid = patch.reshape(B, ph, pw, -1)
            return Token2Feature(out, scale, name=f"read_{i}")(grid, extras)

        # EncoderFeature (:945-954): scales 1, 1, 2, 7/2
        x = t2f(3, taps[3], fc[3], 1)      # 1/14
        x2 = t2f(2, taps[2], fc[2], 1)     # 1/14
        x1 = t2f(1, taps[1], fc[1], 2)     # 1/7
        x0 = t2f(0, taps[0], fc[0], 3.5)   # 1/4

        # DecoderFeature (:955-996) → 1/4 features with 2 conf channels
        y = FuseBlock(dc[4], dc[3], fuse=False, upsample=False,
                      name="upconv_3")(x)
        y = FuseBlock(dc[3], dc[2], scale=2.0, name="upconv_2")(y, x2)
        y = FuseBlock(dc[2], dc[1] + 2, scale=7 / 4, name="upconv_1")(y, x1)

        feat = y[..., :-2]
        depth_conf = y[..., -2:-1]
        normal_conf = y[..., -1:]

        # depth-bin regression (:1104-1123)
        h = nn.Conv(NUM_ANCHORS, (3, 3), name="depth_regressor_0")(feat)
        logits = nn.Conv(NUM_ANCHORS, (1, 1), name="depth_regressor_2")(
            nn.relu(h)
        )
        prob = jax.nn.softmax(logits, -1)
        bins = jnp.exp(jnp.linspace(
            np.log(MIN_DEPTH), np.log(MAX_DEPTH), NUM_ANCHORS
        ))
        d = jnp.einsum("bhwk,k->bhw", prob, bins)[..., None]
        d = jnp.clip(d, MIN_DEPTH, MAX_DEPTH)
        depth_pred = (d - MAX_DEPTH) / REGRESS_SCALE

        # normal head (:1056-1067, :1125-1133)
        n = nn.Conv(128, (3, 3), name="normal_predictor_0")(feat)
        n = nn.Conv(128, (1, 1), name="normal_predictor_2")(nn.relu(n))
        n = nn.Conv(128, (1, 1), name="normal_predictor_4")(nn.relu(n))
        n = nn.Conv(3, (1, 1), name="normal_predictor_6")(nn.relu(n))
        normal_pred = _norm_normalize(
            jnp.concatenate([n, normal_conf], -1)
        )

        flow = jnp.concatenate([depth_pred, depth_conf, normal_pred], -1)

        # ContextFeatureEncoder over (x0 1/4, x1 1/7, x2 1/14) (:1231-1239)
        h = self.hidden
        net, inp = [], []
        for lvl, feat_l in enumerate((x0, x1, x2)):
            name = f"outputs{(4, 8, 16)[lvl]:02d}"
            hid = ContextOut(h, name=f"{name}_0")(feat_l)
            ctx = ContextOut(h, name=f"{name}_1")(feat_l)
            net.append(jnp.tanh(hid))
            zqr = nn.Conv(3 * h, (3, 3), name=f"context_zqr_convs_{lvl}")(
                nn.relu(ctx)
            )
            inp.append(tuple(jnp.split(zqr, 3, axis=-1)))

        update = UpdateBlock(h, name="update_block")

        # slow-fast iterations (:1266-1299)
        out_flow = flow
        up_mask = None
        for _ in range(self.iters):
            net = update(net, inp, iter32=True, iter16=False, iter08=False,
                         update=False)
            net = update(net, inp, iter32=True, iter16=True, iter08=False,
                         update=False)
            net, up_mask, delta = update(net, inp, flow=out_flow)
            out_flow = out_flow + delta

        flow_up = _convex_upsample(out_flow, up_mask)
        depth = jnp.clip(
            flow_up[..., 0] * REGRESS_SCALE + MAX_DEPTH, MIN_DEPTH, MAX_DEPTH
        )
        conf = flow_up[..., 1]
        normals = _norm_normalize(flow_up[..., 2:6])
        return depth, normals, conf


class Metric3DNet:
    def __init__(self, variant: str = "small", params=None, rng_seed: int = 0,
                 iters: Optional[int] = None):
        cfg = METRIC3D_CFGS[variant]
        self.taps = METRIC3D_TAPS[variant]
        # Metric3D backbones are the *register-token* DINOv2 variants
        self.vit = make_vit(cfg["vit"], num_register_tokens=4)
        self.decoder = Metric3DDecoder(
            feature_channels=cfg["feature_channels"],
            decoder_channels=cfg["decoder_channels"],
            hidden=cfg["hidden"],
            iters=iters if iters is not None else cfg["iters"],
        )
        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng_seed))
        self.params = params

        @jax.jit
        def _forward(params, x):
            taps = self.vit.apply(params["vit"], x, tap_layers=self.taps)
            ph, pw = x.shape[1] // 14, x.shape[2] // 14
            return self.decoder.apply(params["decoder"], taps, ph, pw)

        self._forward = _forward

    def init_params(self, key, h: int = 112, w: int = 112):
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
                 input_size=None, iters: Optional[int] = None):
        if params is None:
            from ...models import zoo

            params = zoo.load_params(f"metric3d_{variant}")
        self.net = Metric3DNet(variant, params, iters=iters)
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
