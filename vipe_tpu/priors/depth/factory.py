"""Depth-model factory (reference /root/reference/vipe/priors/depth/__init__.py:19-36).

Model names follow the reference scheme ``"<family>-<variant>"``
(``unidepth-l``, ``metric3d-small``, …).  Families land incrementally; absent
ones raise with a clear message so configs can gate on availability.
"""

from __future__ import annotations

from .base import ConstantDepthModel, DepthEstimationModel


def make_depth_model(name: str) -> DepthEstimationModel:
    family, _, variant = name.partition("-")
    if family == "constant":
        return ConstantDepthModel(float(variant) if variant else 2.0)
    if family == "unidepth":
        from .unidepth import UniDepthModel

        return UniDepthModel(variant or "l")
    if family == "metric3d":
        from .metric3d import Metric3DModel

        return Metric3DModel(variant or "small")
    if family == "dav2":
        from .dav2 import DepthAnythingV2Model

        return DepthAnythingV2Model(variant or "vitl")
    raise ValueError(
        f"Unknown or not-yet-ported depth model family: {family!r} "
        f"(from {name!r})"
    )
