"""DepthAnythingV2 depth prior (flax DINOv2 + DPT).

Reference: /root/reference/vipe/priors/depth/dav2/ (dpt.py DepthAnythingV2,
__init__.py DepthAnythingDepthModel adapter).  Variants:

  vits: features 64,  out_channels (48, 96, 192, 384),   taps (2, 5, 8, 11)
  vitb: features 128, out_channels (96, 192, 384, 768),  taps (2, 5, 8, 11)
  vitl: features 256, out_channels (256, 512, 1024, 1024), taps (4, 11, 17, 23)

Relative checkpoints emit AFFINE_DISP (relu disparity); metric checkpoints
(hypersim/vkitti) emit sigmoid·max_depth metric depth.  Weights load through
``vipe_tpu.models.convert_dav2`` when a local checkpoint exists; otherwise
random init (no egress in this environment).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.dpt import DPTHead
from ...models.vit import make_vit
from ...ops.resize import resize_align_corners
from .base import DepthEstimationInput, DepthEstimationModel, DepthEstimationResult, DepthType

DAV2_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384), taps=(2, 5, 8, 11)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768), taps=(2, 5, 8, 11)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024), taps=(4, 11, 17, 23)),
}

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class DepthAnythingV2Net:
    """Functional wrapper: vit taps → DPT head (one jitted apply per shape)."""

    def __init__(self, variant: str = "vitl", max_depth: Optional[float] = None,
                 params=None, rng_seed: int = 0, cond_dim: int = 0):
        cfg = DAV2_CONFIGS[variant]
        self.variant = variant
        self.taps = cfg["taps"]
        self.max_depth = max_depth
        self.cond_dim = cond_dim
        self.vit = make_vit(variant, cond_dim=cond_dim)
        self.head = DPTHead(
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            is_metric=max_depth is not None,
        )
        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng_seed))
        self.params = params

        @jax.jit
        def _forward(params, x, condition):
            taps = self.vit.apply(
                params["vit"], x, tap_layers=self.taps, condition=condition
            )
            ph, pw = x.shape[1] // 14, x.shape[2] // 14
            out = self.head.apply(params["head"], taps, ph, pw)
            if self.max_depth is not None:
                out = out * self.max_depth
            return out

        self._forward = _forward

    def init_params(self, key, h: int = 252, w: int = 252):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, h, w, 3))
        cond = jnp.zeros((1, h, w, self.cond_dim)) if self.cond_dim else None
        vit_params = self.vit.init(k1, x, tap_layers=self.taps, condition=cond)
        taps = self.vit.apply(vit_params, x, tap_layers=self.taps,
                              condition=cond)
        head_params = self.head.init(k2, taps, h // 14, w // 14)
        return {"vit": vit_params, "head": head_params}

    def __call__(self, image_normalized, condition=None):
        """(B, H, W, 3) normalized, H/W multiples of 14 → (B, H, W) output.
        ``condition``: (B, H, W, cond_dim) map for conditioned variants."""
        return self._forward(self.params, image_normalized, condition)


def preprocess(rgb: np.ndarray, input_size: int = 518):
    """lower-bound aspect-preserving resize to /14 multiples + ImageNet norm
    (reference dav2/util/transform.py semantics)."""
    import cv2

    h, w = rgb.shape[:2]
    scale = input_size / min(h, w)
    nh = max(int(round(h * scale / 14)) * 14, 14)
    nw = max(int(round(w * scale / 14)) * 14, 14)
    img = cv2.resize(np.asarray(rgb, np.float32), (nw, nh),
                     interpolation=cv2.INTER_CUBIC)
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img, (h, w)


class DepthAnythingV2Model(DepthEstimationModel):
    """Adapter (reference dav2/__init__.py DepthAnythingDepthModel)."""

    def __init__(self, variant: str = "vitl", ckpt: str = "default",
                 ckpt_path: Optional[str] = None, input_size: int = 518):
        self.is_metric = ckpt.startswith("metric")
        self.max_depth = (
            (20.0 if ckpt == "metric-indoor" else 80.0) if self.is_metric else None
        )
        self.depth_type = (
            DepthType.METRIC_DEPTH if self.is_metric else DepthType.AFFINE_DISP
        )
        self.input_size = input_size
        params = None
        if ckpt_path is not None:
            from ...models.convert import load_dav2_checkpoint

            params = load_dav2_checkpoint(ckpt_path, variant)
        else:
            from ...models import zoo

            params = zoo.load_params(f"dav2_{variant}")
        self.net = DepthAnythingV2Net(variant, self.max_depth, params)

    def estimate(self, inp: DepthEstimationInput) -> DepthEstimationResult:
        img, (h, w) = preprocess(np.asarray(inp.rgb), self.input_size)
        out = self.net(jnp.asarray(img)[None])[0]
        # reference resizes predictions with align_corners=True (dpt.py:248)
        out = resize_align_corners(out, (h, w))
        return DepthEstimationResult(depth=out)
