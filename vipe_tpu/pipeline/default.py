"""DefaultAnnotationPipeline (reference
/root/reference/vipe/pipeline/default.py:46-148): init processors →
SLAMSystem → post processors → artifact save + visualization."""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np

from ..ops.cameras import CameraType
from ..slam.system import SLAMSystem
from ..streams.base import (
    AssignAttributesProcessor,
    FrameAttribute,
    ProcessedVideoStream,
    VideoStream,
)
from ..utils import io as io_utils
from . import AnnotationPipelineOutput, Pipeline
from .processors import (
    AdaptiveDepthProcessor,
    HeuristicIntrinsicsProcessor,
    TrackAnythingProcessor,
)


class DefaultAnnotationPipeline(Pipeline):
    def __init__(self, init=None, slam=None, post=None, output=None, **kwargs):
        super().__init__(**kwargs)
        self.init_cfg = dict(init or {})
        self.slam_cfg = dict(slam or {})
        self.post_cfg = dict(post or {})
        self.output_cfg = dict(output or {})

    def should_filter(self, stream_name: str) -> bool:
        if not self.output_cfg.get("skip_exists", False):
            return False
        root = self.output_cfg.get("path")
        if root is None:
            return False
        return io_utils.ArtifactPath(root, stream_name).exists()

    def _init_processors(self, video_stream=None):
        procs = []
        intr_mode = self.init_cfg.get("intrinsics", "fov")
        if intr_mode == "geocalib":
            from .processors import GeoCalibIntrinsicsProcessor

            procs.append(GeoCalibIntrinsicsProcessor(
                camera_type=self.init_cfg.get("camera_type", "pinhole"),
                sample_stream=video_stream,
            ))
        elif intr_mode in ("fov", None):
            procs.append(HeuristicIntrinsicsProcessor(
                fov_deg=self.init_cfg.get("fov_deg", 60.0)
            ))
        # intr_mode == "gt": stream already carries intrinsics
        if self.init_cfg.get("instance"):
            procs.append(TrackAnythingProcessor(
                phrases=self.init_cfg.get("phrases", []),
            ))
        return procs

    def run(self, video_stream: VideoStream) -> AnnotationPipelineOutput:
        camera_type = CameraType(self.slam_cfg.get("camera_type", "pinhole"))

        init_procs = self._init_processors(video_stream)
        stream = ProcessedVideoStream(video_stream, init_procs).cache(
            "process", online=True
        )

        metric_depth = None
        kd = self.slam_cfg.get("keyframe_depth")
        if kd:
            from ..priors.depth.factory import make_depth_model

            metric_depth = make_depth_model(kd)

        slam = SLAMSystem(config=self.slam_cfg, metric_depth=metric_depth)
        slam_out = slam.run(stream, camera_type=camera_type)

        # ------------------------------------------------------------- post
        post_procs = [
            AssignAttributesProcessor(
                poses=slam_out.trajectory,
                intrinsics=slam_out.intrinsics,
            )
        ]
        depth_model_str = self.post_cfg.get("depth_align_model")
        if depth_model_str:
            adp = AdaptiveDepthProcessor(depth_model_str, slam_output=slam_out)
            post_procs.append(adp)
        out_stream = ProcessedVideoStream(stream, post_procs).cache(
            "depth", online=True
        )

        frames = list(out_stream)
        output = AnnotationPipelineOutput(
            trajectory=slam_out.trajectory,
            intrinsics=slam_out.intrinsics,
            camera_type=camera_type.value,
            frame_inds=np.arange(len(frames)),
            fps=video_stream.fps(),
            ba_residual=slam_out.ba_residual,
            slam_map=slam_out.slam_map,
        )
        if depth_model_str:
            output.depths = (f.metric_depth for f in frames)
        if any(f.instance is not None for f in frames):
            output.instance_masks = (
                (f.instance if f.instance is not None else
                 np.zeros(f.size(), np.uint8))
                for f in frames
            )
            output.mask_phrases = self.init_cfg.get("phrases", [])
        output.rgb_frames = (f.rgb for f in frames)

        root = self.output_cfg.get("path")
        if root is not None:
            art = io_utils.ArtifactPath(pathlib.Path(root), stream.name())
            io_utils.save_artifacts(art, output)
            if self.output_cfg.get("save_viz", False):
                from ..utils.visualization import save_projection_video

                save_projection_video(
                    art, frames, slam_out,
                    attributes=self.output_cfg.get(
                        "viz_attributes", ["rgb", "depth"]
                    ),
                    fps=video_stream.fps(),
                )

        if self.return_payload:
            output.payload = {"slam_output": slam_out}
        return output
