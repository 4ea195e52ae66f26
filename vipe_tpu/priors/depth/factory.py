"""Depth-model factory (reference /root/reference/vipe/priors/depth/__init__.py:19-36).

Model names follow the reference scheme ``"<family>-<variant>"``
(``unidepth-l``, ``metric3d-small``, …).  Families land incrementally; absent
ones raise with a clear message so configs can gate on availability.
"""

from __future__ import annotations

from .base import ConstantDepthModel, DepthEstimationModel


def make_depth_model(name: str) -> DepthEstimationModel:
    """Depth models are stateless (params + jit closures), so instances are
    process-cached by name — a fresh pipeline per video must not re-trace
    a ViT-L zoo (models/model_cache.py)."""
    from ...models.model_cache import cached_global

    return cached_global(("depth_model", name), lambda: _build(name))


def _build(name: str) -> DepthEstimationModel:
    family, _, variant = name.partition("-")
    if family == "constant":
        return ConstantDepthModel(float(variant) if variant else 2.0)
    if family == "dav2":
        from .dav2 import DepthAnythingV2Model

        return DepthAnythingV2Model(variant or "vitl")
    if family in ("vda", "videodepthanything"):
        from .videodepthanything import VideoDepthAnythingModel

        return VideoDepthAnythingModel(variant or "vitl")
    if family in ("unidepth", "metric3d", "priorda"):
        try:
            if family == "unidepth":
                from .unidepth import UniDepthModel as _M
            elif family == "metric3d":
                from .metric3d import Metric3DModel as _M
            else:
                from .priorda import PriorDAModel as _M
        except ImportError as e:
            raise NotImplementedError(
                f"depth model family {family!r} is not ported yet "
                f"(planned; see SURVEY.md §2.4)"
            ) from e
        return _M(variant) if variant else _M()
    raise ValueError(
        f"Unknown depth model family: {family!r} (from {name!r})"
    )
