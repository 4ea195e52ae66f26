"""DPT (dense prediction transformer) head in flax.

Parity with the reference DAv2 head
(/root/reference/vipe/priors/depth/dav2/dpt.py:44-192 and util/blocks.py):
  * per-tap 1×1 projections → out_channels[i];
  * resize layers: ×4 / ×2 transposed conv, identity, stride-2 conv;
  * scratch ``layer{i}_rn`` 3×3 convs (bias-free) into a common ``features``
    width;
  * top-down ``FeatureFusionBlock`` chain (two residual conv units, bilinear
    upsample to the skip's size, 1×1 out conv);
  * output: 3×3 conv → half width → upsample ×(patch·14 target) → 3×3 conv →
    1×1 conv; sigmoid·max_depth for metric checkpoints, relu disparity for
    relative ones.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_align_corners


def _resize_bilinear(x, hw):
    # the reference's fusion/output interpolations are align_corners=True
    # (dav2/dpt.py:25,185) — activation parity requires the same grid
    return resize_align_corners(x, tuple(hw))


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = _resize_bilinear(x, out_hw)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    patch_size: int = 14
    is_metric: bool = False

    @nn.compact
    def __call__(self, taps, ph: int, pw: int):
        """taps: list of 4 (tokens (B, N, D), cls (B, D)) from the ViT.

        Returns (B, ph·patch, pw·patch) depth/disparity.
        """
        feats = []
        for i, (tokens, _cls) in enumerate(taps):
            B, N, D = tokens.shape
            f = tokens.reshape(B, ph, pw, D)
            f = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(f)
            if i == 0:
                f = nn.ConvTranspose(
                    self.out_channels[i], (4, 4), strides=(4, 4),
                    name="resize0",
                )(f)
            elif i == 1:
                f = nn.ConvTranspose(
                    self.out_channels[i], (2, 2), strides=(2, 2),
                    name="resize1",
                )(f)
            elif i == 3:
                # torch Conv2d(k=3, s=2, padding=1) pads (1,1) and floors —
                # NOT the same grid as XLA 'SAME' (which pads (0,1) here);
                # explicit padding keeps converted checkpoints aligned
                f = nn.Conv(
                    self.out_channels[i], (3, 3), strides=2,
                    padding=((1, 1), (1, 1)), name="resize3",
                )(f)
            f = nn.Conv(
                self.features, (3, 3), use_bias=False, name=f"layer{i + 1}_rn"
            )(f)
            feats.append(f)

        l1, l2, l3, l4 = feats
        p4 = FeatureFusionBlock(self.features, name="refinenet4")(
            l4, out_hw=l3.shape[1:3]
        )
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(
            p4, l3, out_hw=l2.shape[1:3]
        )
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(
            p3, l2, out_hw=l1.shape[1:3]
        )
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1)

        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(p1)
        out = _resize_bilinear(out, (ph * self.patch_size, pw * self.patch_size))
        out = nn.Conv(32, (3, 3), name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2")(out)
        if self.is_metric:
            out = nn.sigmoid(out)
        else:
            out = nn.relu(out)
        return out[..., 0]
