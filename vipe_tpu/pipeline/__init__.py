"""Pipeline orchestration (reference /root/reference/vipe/pipeline/__init__.py).

``Pipeline.run(video_stream) -> AnnotationPipelineOutput`` with the reference's
``return_payload`` switches, and the dotted ``instance:``-string factory
``make_pipeline`` (reference :70-80).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Iterator, List, Optional

import numpy as np

from ..ops.cameras import CameraType


@dataclasses.dataclass
class AnnotationPipelineOutput:
    """Everything the annotation pipeline can produce for one video
    (reference pipeline/__init__.py:25-34 + io.save_artifacts schema)."""

    trajectory: Optional[np.ndarray] = None          # (T, 7) c2w SE3
    intrinsics: Optional[np.ndarray] = None          # (D,) full-res
    camera_type: str = "pinhole"
    depths: Optional[Iterator[np.ndarray]] = None    # per-frame metric depth
    instance_masks: Optional[Iterator[np.ndarray]] = None
    # id→phrase dict when instance ids were tracked, else the prompt list
    mask_phrases: Optional[object] = None
    rgb_frames: Optional[Iterator[np.ndarray]] = None
    frame_inds: Optional[np.ndarray] = None
    fps: float = 30.0
    ba_residual: float = 0.0
    slam_map: Optional[object] = None
    payload: Optional[dict] = None


class Pipeline:
    """Base pipeline (reference :36-67)."""

    def __init__(self, **kwargs):
        self.return_payload = kwargs.get("return_payload", False)
        self.return_output_streams = kwargs.get("return_output_streams", False)

    def run(self, video_stream) -> AnnotationPipelineOutput:
        raise NotImplementedError

    def should_filter(self, stream_name: str) -> bool:
        """Skip already-processed videos (reference :63-64)."""
        return False


def make_pipeline(config: dict) -> Pipeline:
    """Instantiate pipeline class from dotted ``instance:`` string
    (reference :70-80)."""
    path = config["instance"]
    module, cls = path.rsplit(".", 1)
    klass = getattr(importlib.import_module(module), cls)
    kwargs = {k: v for k, v in config.items() if k != "instance"}
    return klass(**kwargs)
