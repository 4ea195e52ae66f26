"""Depth-prior interface (reference /root/reference/vipe/priors/depth/base.py).

``DepthType`` semantics preserved (base.py:24-42):
  METRIC_DEPTH          — metric, focal-scalable without re-running the model
  MODEL_METRIC_DEPTH    — metric, but needs a re-run if intrinsics change
  MODEL_METRIC_DISTANCE — metric ray distance (not plane depth)
  AFFINE_DISP           — disparity up to affine transform
  SCALE_DISP            — disparity up to scale
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Optional


class DepthType(Enum):
    METRIC_DEPTH = "metric_depth"
    MODEL_METRIC_DEPTH = "model_metric_depth"
    MODEL_METRIC_DISTANCE = "model_metric_distance"
    AFFINE_DISP = "affine_disp"
    SCALE_DISP = "scale_disp"


@dataclass
class DepthEstimationInput:
    rgb: "object"  # (H, W, 3) float in [0, 1]
    focal_length: Optional[float] = None


@dataclass
class DepthEstimationResult:
    depth: "object"  # (H, W) — interpretation governed by depth_type
    confidence: Optional["object"] = None


class DepthEstimationModel:
    """ABC for depth priors (reference base.py:79-93)."""

    depth_type: DepthType = DepthType.METRIC_DEPTH

    def estimate(self, inp: DepthEstimationInput) -> DepthEstimationResult:
        raise NotImplementedError

    def estimate_depth(self, rgb, focal_length=None):
        return self.estimate(
            DepthEstimationInput(rgb=rgb, focal_length=focal_length)
        ).depth

    def estimate_depth_batch(self, rgbs, focal_length=None):
        """Depth for several same-shaped frames (one shared focal).

        Default = per-frame loop; models whose forward batches trivially
        (stacked ViT inference) override it — per-frame dispatches of a
        large prior amortize poorly on accelerators, and the post-SLAM
        depth pass is the hottest per-frame consumer."""
        return [self.estimate_depth(r, focal_length) for r in rgbs]


class ConstantDepthModel(DepthEstimationModel):
    """Test/dummy prior: constant metric depth (DummyDepthModel analog,
    reference base.py:98-104)."""

    depth_type = DepthType.METRIC_DEPTH

    def __init__(self, depth: float = 2.0):
        self.depth = depth

    def estimate(self, inp):
        import jax.numpy as jnp

        h, w = inp.rgb.shape[0], inp.rgb.shape[1]
        return DepthEstimationResult(depth=jnp.full((h, w), self.depth))
