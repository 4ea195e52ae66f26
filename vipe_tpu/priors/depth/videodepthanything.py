"""VideoDepthAnything: temporally-consistent relative depth over video.

Reference: /root/reference/vipe/priors/depth/videodepthanything/ — DINOv2
encoder per frame + ``DPTHeadTemporal`` (DPT with TemporalModules inserted at
layer3/layer4/path4/path3, dpt_temporal.py:36-104) + 32-frame sliding-window
inference with scale/shift overlap stitching (video_depth.py:80-184).

Constants (video_depth.py:34-37): INFER_LEN=32, OVERLAP=10,
KEYFRAMES=[0,12,24..31], INTERP_LEN=8.  "svda" = vits variant, "vda" = vitl
(reference processors.py:168-174).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from ...models.dpt import DPTHead, FeatureFusionBlock, _resize_bilinear
from ...models.temporal import TemporalModule
from ...models.vit import make_vit
from ...ops.resize import resize_align_corners
from .base import DepthEstimationInput, DepthEstimationModel, DepthEstimationResult, DepthType
from .dav2 import DAV2_CONFIGS, IMAGENET_MEAN, IMAGENET_STD, preprocess

INFER_LEN = 32
OVERLAP = 10
KEYFRAMES = [0, 12, 24, 25, 26, 27, 28, 29, 30, 31]
INTERP_LEN = 8


def preprocess_u8(rgb: np.ndarray, input_size: int = 518) -> np.ndarray:
    """``dav2.preprocess`` resize policy on uint8 pixels, WITHOUT the
    ImageNet normalization — that runs on device (a f32 clip upload is 4×
    the tunnel bytes; the ≤0.5/255 uint8 resize quantization is far below
    the bf16 compute noise)."""
    import cv2

    h, w = rgb.shape[:2]
    scale = input_size / min(h, w)
    nh = max(int(round(h * scale / 14)) * 14, 14)
    nw = max(int(round(w * scale / 14)) * 14, 14)
    a = np.asarray(rgb, np.float32)
    if a.max() <= 1.5:
        a = a * 255.0
    # resize in FLOAT (cubic overshoot must not clip before interpolation —
    # matches dav2.preprocess), then quantize once for the upload
    img = cv2.resize(a, (nw, nh), interpolation=cv2.INTER_CUBIC)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


class DPTHeadTemporal(nn.Module):
    """DPT head with temporal mixing (reference dpt_temporal.py)."""

    features: int = 256
    out_channels: tuple = (256, 512, 1024, 1024)
    patch_size: int = 14
    num_frames: int = INFER_LEN

    @nn.compact
    def __call__(self, taps, ph: int, pw: int, T: int):
        feats = []
        for i, (tokens, _cls) in enumerate(taps):
            B, N, D = tokens.shape
            f = tokens.reshape(B, ph, pw, D)
            f = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(f)
            if i == 0:
                f = nn.ConvTranspose(self.out_channels[i], (4, 4), strides=(4, 4),
                                     name="resize0")(f)
            elif i == 1:
                f = nn.ConvTranspose(self.out_channels[i], (2, 2), strides=(2, 2),
                                     name="resize1")(f)
            elif i == 3:
                # torch k3/s2/p1 — explicit padding, not XLA 'SAME' (which
                # pads (0,1) at stride 2); see models/dpt.py resize3
                f = nn.Conv(self.out_channels[i], (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), name="resize3")(f)
            feats.append(f)

        l1, l2, l3, l4 = feats
        l3 = TemporalModule(self.out_channels[2], max_len=self.num_frames,
                            name="motion0")(l3, T)
        l4 = TemporalModule(self.out_channels[3], max_len=self.num_frames,
                            name="motion1")(l4, T)

        rn = []
        for i, f in enumerate([l1, l2, l3, l4]):
            rn.append(nn.Conv(self.features, (3, 3), use_bias=False,
                              name=f"layer{i + 1}_rn")(f))
        l1, l2, l3, l4 = rn

        p4 = FeatureFusionBlock(self.features, name="refinenet4")(
            l4, out_hw=l3.shape[1:3])
        p4 = TemporalModule(self.features, max_len=self.num_frames,
                            name="motion2")(p4, T)
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(
            p4, l3, out_hw=l2.shape[1:3])
        p3 = TemporalModule(self.features, max_len=self.num_frames,
                            name="motion3")(p3, T)
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(
            p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1)

        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(p1)
        out = _resize_bilinear(out, (ph * self.patch_size, pw * self.patch_size))
        out = nn.Conv(32, (3, 3), name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2")(out)
        return nn.relu(out)[..., 0]


class _DPTHeadJoint(nn.Module):
    """``DPTHeadTemporal`` through its LAST temporal module (motion3):
    projections, temporal mixing and refinenet4/3 need the whole clip
    jointly; everything after motion3 is strictly per-frame.  Submodule
    names match ``DPTHeadTemporal`` exactly so one converted param tree
    serves both (split by top-level key in ``VideoDepthAnythingNet``)."""

    features: int = 256
    out_channels: tuple = (256, 512, 1024, 1024)
    num_frames: int = INFER_LEN

    @nn.compact
    def __call__(self, taps, ph: int, pw: int, T: int):
        feats = []
        for i, (tokens, _cls) in enumerate(taps):
            B, N, D = tokens.shape
            f = tokens.reshape(B, ph, pw, D)
            f = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(f)
            if i == 0:
                f = nn.ConvTranspose(self.out_channels[i], (4, 4), strides=(4, 4),
                                     name="resize0")(f)
            elif i == 1:
                f = nn.ConvTranspose(self.out_channels[i], (2, 2), strides=(2, 2),
                                     name="resize1")(f)
            elif i == 3:
                f = nn.Conv(self.out_channels[i], (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), name="resize3")(f)
            feats.append(f)

        l1, l2, l3, l4 = feats
        l3 = TemporalModule(self.out_channels[2], max_len=self.num_frames,
                            name="motion0")(l3, T)
        l4 = TemporalModule(self.out_channels[3], max_len=self.num_frames,
                            name="motion1")(l4, T)

        rn = []
        for i, f in enumerate([l1, l2, l3, l4]):
            rn.append(nn.Conv(self.features, (3, 3), use_bias=False,
                              name=f"layer{i + 1}_rn")(f))
        l1, l2, l3, l4 = rn

        p4 = FeatureFusionBlock(self.features, name="refinenet4")(
            l4, out_hw=l3.shape[1:3])
        p4 = TemporalModule(self.features, max_len=self.num_frames,
                            name="motion2")(p4, T)
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(
            p4, l3, out_hw=l2.shape[1:3])
        p3 = TemporalModule(self.features, max_len=self.num_frames,
                            name="motion3")(p3, T)
        return l1, l2, p3


class _DPTHeadTail(nn.Module):
    """Per-frame tail of ``DPTHeadTemporal`` (after motion3): refinenet2/1,
    output convs and the full-resolution upsample — the memory-dominant
    part (the post-resize (T, 14·ph, 14·pw, features/2) tensor is ~4 GB
    bf16 for a 32-frame 518-res window), so it runs chunked over frames."""

    features: int = 256
    patch_size: int = 14

    @nn.compact
    def __call__(self, l1, l2, p3):
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(
            p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1)
        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(p1)
        out = _resize_bilinear(
            out,
            (l2.shape[1] * self.patch_size // 2,
             l2.shape[2] * self.patch_size // 2),
        )
        out = nn.Conv(32, (3, 3), name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2")(out)
        return nn.relu(out)[..., 0]


_JOINT_KEYS = (
    "project0", "project1", "project2", "project3",
    "resize0", "resize1", "resize3",
    "motion0", "motion1", "motion2", "motion3",
    "layer1_rn", "layer2_rn", "layer3_rn", "layer4_rn",
    "refinenet4", "refinenet3",
)


class VideoDepthAnythingNet:
    """TPU memory/dtype policy: the whole clip forward runs in bf16 (the
    reference's vitl path runs under fp16 autocast, video_depth.py:127 +
    __init__.py:49-52; we use bf16 for the vits variant too — TPU-native,
    f32-accumulated matmuls, and the per-window output feeds a host-side
    f32 scale/shift stitch).  The per-frame ViT runs as a ``lax.map`` over
    8-frame chunks: a 32-frame batch at 518-res materializes a multi-GB
    attention transient that RESOURCE_EXHAUSTs a shared v5e chip.  The DPT
    head is likewise split at its last temporal module: the per-frame tail
    (refinenet2/1 + output convs + full-res upsample, whose intermediate is
    ~4 GB bf16 for a whole window) maps over ``HEAD_CHUNK``-frame slices
    with the same converted parameters."""

    VIT_CHUNK = 8
    HEAD_CHUNK = 4

    def __init__(self, variant: str = "vitl", params=None, rng_seed: int = 0,
                 num_frames: int = INFER_LEN):
        cfg = DAV2_CONFIGS[variant]
        self.variant = variant
        self.taps = cfg["taps"]
        self.num_frames = num_frames
        self.vit = make_vit(variant)
        self.head = DPTHeadTemporal(
            features=cfg["features"], out_channels=cfg["out_channels"],
            num_frames=num_frames,
        )
        # split-apply views over the SAME param tree (see _DPTHeadJoint)
        self.head_joint = _DPTHeadJoint(
            features=cfg["features"], out_channels=cfg["out_channels"],
            num_frames=num_frames,
        )
        self.head_tail = _DPTHeadTail(features=cfg["features"])
        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng_seed))
        self.params = params

        @functools.partial(jax.jit, static_argnums=(2,))
        def _forward(params, clip, out_hw=None):
            """clip: (T, H, W, 3) uint8 (normalized in-program — a f32 clip
            upload is 4× the tunnel bytes) or pre-normalized f32 →
            (T, H, W) f32 disparity, or (T, *out_hw) f16 when ``out_hw`` is
            given (align-corners upsample fused here so ONE compact
            readback replaces the old model-res-f32 down / re-up /
            full-res-f32 down round trip — ~240 MB/window measured)."""
            T, H, W = clip.shape[0], clip.shape[1], clip.shape[2]
            pbf = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params,
            )
            if clip.dtype == jnp.uint8:
                clip = (
                    clip.astype(jnp.float32) / 255.0
                    - jnp.asarray(IMAGENET_MEAN)
                ) / jnp.asarray(IMAGENET_STD)
            clip = clip.astype(jnp.bfloat16)
            CH = self.VIT_CHUNK
            if T % CH == 0 and T > CH:
                chunks = clip.reshape(T // CH, CH, H, W, 3)
                taps_st = jax.lax.map(
                    lambda c: self.vit.apply(
                        pbf["vit"], c, tap_layers=self.taps
                    ),
                    chunks,
                )
                taps = [
                    tuple(
                        x.reshape((T,) + x.shape[2:]) for x in tap
                    )
                    for tap in taps_st
                ]
            else:
                taps = self.vit.apply(pbf["vit"], clip, tap_layers=self.taps)
            ph, pw = H // 14, W // 14
            hp = pbf["head"]["params"]
            joint_p = {"params": {k: v for k, v in hp.items()
                                  if k in _JOINT_KEYS}}
            tail_p = {"params": {k: v for k, v in hp.items()
                                 if k not in _JOINT_KEYS}}
            l1, l2, p3 = self.head_joint.apply(joint_p, taps, ph, pw, T)
            HC = self.HEAD_CHUNK
            def tail(xs):
                o = self.head_tail.apply(tail_p, *xs)
                if out_hw is not None:
                    o = resize_align_corners(
                        o[..., None].astype(jnp.float32), out_hw
                    )[..., 0].astype(jnp.float16)
                return o

            if T % HC == 0 and T > HC:
                out = jax.lax.map(
                    tail,
                    (l1.reshape((T // HC, HC) + l1.shape[1:]),
                     l2.reshape((T // HC, HC) + l2.shape[1:]),
                     p3.reshape((T // HC, HC) + p3.shape[1:])),
                )
                out = out.reshape((T,) + out.shape[2:])
            else:
                out = tail((l1, l2, p3))
            return out if out_hw is not None else out.astype(jnp.float32)

        self._forward = _forward

    def init_params(self, key, h: int = 70, w: int = 70, T: int = 2):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((T, h, w, 3))
        vit_params = self.vit.init(k1, x, tap_layers=self.taps)
        taps = self.vit.apply(vit_params, x, tap_layers=self.taps)
        head_params = self.head.init(k2, taps, h // 14, w // 14, T)
        return {"vit": vit_params, "head": head_params}

    def __call__(self, clip, out_hw=None):
        return self._forward(self.params, clip, out_hw)


# ---------------------------------------------------------------- stitching


def compute_scale_and_shift(pred, target, mask=None):
    """Closed-form LSQ scale/shift (reference util.py:42-64)."""
    pred = np.asarray(pred, np.float32)
    target = np.asarray(target, np.float32)
    m = np.ones_like(pred) if mask is None else np.asarray(mask, np.float32)
    a00 = np.sum(m * pred * pred)
    a01 = np.sum(m * pred)
    a11 = np.sum(m)
    b0 = np.sum(m * pred * target)
    b1 = np.sum(m * target)
    det = a00 * a11 - a01 * a01
    if det == 0:
        return 1.0, 0.0
    return float((a11 * b0 - a01 * b1) / det), float((-a01 * b0 + a00 * b1) / det)


def get_interpolate_frames(pre: List[np.ndarray], post: List[np.ndarray]):
    """Linear cross-fade between overlapping window outputs (util.py:67-81)."""
    assert len(pre) == len(post)
    n = len(pre)
    ws = [0.0] + [i / (n - 1) for i in range(1, n - 1)] + [1.0]
    return [p * (1 - w) + q * w for p, q, w in zip(pre, post, ws)]


def stitch_depth_windows(depth_list: List[np.ndarray], org_len: int):
    """Align consecutive INFER_LEN windows by scale/shift on the keyframe
    overlap, cross-fading the INTERP_LEN seam (reference video_depth.py:143-182)."""
    aligned: List[np.ndarray] = []
    ref_align: List[np.ndarray] = []
    align_len = OVERLAP - INTERP_LEN
    kf_align = KEYFRAMES[:align_len]

    for f0 in range(0, len(depth_list), INFER_LEN):
        if not aligned:
            aligned += depth_list[:INFER_LEN]
            for kf in kf_align:
                ref_align.append(depth_list[f0 + kf])
            continue
        curr_align = [depth_list[f0 + i] for i in range(len(kf_align))]
        scale, shift = compute_scale_and_shift(
            np.concatenate(curr_align), np.concatenate(ref_align)
        )
        pre = aligned[-INTERP_LEN:]
        post = [
            np.maximum(depth_list[f0 + i] * scale + shift, 0)
            for i in range(align_len, OVERLAP)
        ]
        aligned[-INTERP_LEN:] = get_interpolate_frames(pre, post)
        for i in range(OVERLAP, INFER_LEN):
            aligned.append(np.maximum(depth_list[f0 + i] * scale + shift, 0))
        ref_align = ref_align[:1]
        for kf in kf_align[1:]:
            ref_align.append(np.maximum(depth_list[f0 + kf] * scale + shift, 0))

    return np.stack(aligned[:org_len], axis=0)


class VideoDepthAnythingModel(DepthEstimationModel):
    """Whole-video inference adapter (reference VdieoDepthAnythingDepthModel
    [sic], videodepthanything/__init__.py:24-73)."""

    depth_type = DepthType.AFFINE_DISP

    def __init__(self, variant: str = "vitl", input_size: int = 518,
                 params=None):
        if params is None:
            from ...models import zoo

            params = zoo.load_params(f"vda_{variant}")
        self.net = VideoDepthAnythingNet(variant, params)
        self.input_size = input_size

    def infer_video_depth(self, frames: List[np.ndarray]) -> np.ndarray:
        """frames: list of (H, W, 3) float RGB in [0,1] → (T, H, W) disparity."""
        h, w = frames[0].shape[:2]
        ratio = max(h, w) / min(h, w)
        input_size = self.input_size
        if ratio > 1.78:
            input_size = round(input_size * 1.777 / ratio / 14) * 14

        step = INFER_LEN - OVERLAP
        org_len = len(frames)
        pad = (step - (org_len % step)) % step + OVERLAP
        frames = list(frames) + [frames[-1]] * pad

        depth_list: List[np.ndarray] = []
        pre_input: Optional[np.ndarray] = None
        for f0 in range(0, org_len, step):
            # uint8 clip upload (4× less than normalized f32 — 46 MB vs
            # 184 MB per 720p window); normalization runs in the forward.
            # The align-corners upsample to (h, w) (reference
            # video_depth.py:77,130) is fused into the same program and the
            # result crosses back ONCE as f16 — the old path moved the
            # window depth over the tunnel three times (model-res f32 down,
            # re-up, full-res f32 down).
            clip = np.stack([
                preprocess_u8(frames[f0 + i], input_size)
                for i in range(INFER_LEN)
            ])
            if pre_input is not None:
                clip[:OVERLAP] = pre_input[KEYFRAMES]
            depth = np.asarray(
                self.net(jnp.asarray(clip), (h, w)), np.float32
            )
            depth_list += list(depth)
            pre_input = clip

        return stitch_depth_windows(depth_list, org_len)

    def estimate(self, inp: DepthEstimationInput) -> DepthEstimationResult:
        out = self.infer_video_depth([np.asarray(inp.rgb)])
        return DepthEstimationResult(depth=jnp.asarray(out[0]))
