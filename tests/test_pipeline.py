"""DefaultAnnotationPipeline integration: single-pass streaming artifact
writing (rgb/pose/intrinsics/depth/mask/info/vis), reader round-trips, and
the in-memory (no output path) mode.

SLAM is stubbed with a canned SLAMOutput — the full SLAM stack has its own
oracle e2e test (test_slam_system.py); here the subject is the pipeline
layer's orchestration + IO (reference vipe/pipeline/default.py:93-148,
vipe/utils/io.py:338-378).
"""

import numpy as np
import pytest

import vipe_tpu.pipeline.default as default_mod
from vipe_tpu.ops import cameras as cam
from vipe_tpu.pipeline.default import DefaultAnnotationPipeline
from vipe_tpu.slam.interface import SLAMOutput
from vipe_tpu.streams.base import FrameAttribute, VideoFrame, VideoStream
from vipe_tpu.utils import io as io_utils

H, W, T = 48, 64, 6


class TinyStream(VideoStream):
    def __init__(self, with_depth=True, with_instance=True):
        rng = np.random.default_rng(0)
        self.rgbs = [rng.random((H, W, 3)).astype(np.float32) for _ in range(T)]
        self.with_depth = with_depth
        self.with_instance = with_instance
        self._name = "tiny"

    def __len__(self):
        return T

    def frame_size(self):
        return (H, W)

    def attributes(self):
        return {FrameAttribute.RGB}

    def __iter__(self):
        for k in range(T):
            yield VideoFrame(
                raw_frame_idx=k,
                rgb=self.rgbs[k],
                metric_depth=(
                    np.full((H, W), 2.0 + k, np.float32)
                    if self.with_depth else None
                ),
                instance=(
                    np.full((H, W), k % 3, np.uint8)
                    if self.with_instance else None
                ),
            )


def canned_slam_output():
    traj = np.zeros((T, 7), np.float32)
    traj[:, 6] = 1.0  # identity quaternions
    traj[:, 0] = np.arange(T) * 0.1
    intr = np.asarray([W * 1.2, W * 1.2, W / 2, H / 2], np.float32)
    return SLAMOutput(
        trajectory=traj, intrinsics=intr, camera_type=cam.CameraType.PINHOLE
    )


class StubSLAM:
    def __init__(self, config=None, metric_depth=None, **kw):
        pass

    def run(self, stream, camera_type=cam.CameraType.PINHOLE):
        for _ in stream:  # consume like the real system would
            pass
        return canned_slam_output()


@pytest.fixture()
def stub_slam(monkeypatch):
    monkeypatch.setattr(default_mod, "SLAMSystem", StubSLAM)


class TestPipelineStreaming:
    def test_artifacts_written_single_pass(self, stub_slam, tmp_path):
        pipe = DefaultAnnotationPipeline(
            init={"intrinsics": "fov"},
            slam={},
            post={},
            output={"path": str(tmp_path), "save_viz": True,
                    "viz_attributes": ["rgb", "depth"]},
        )
        out = pipe.run(TinyStream())
        art = io_utils.ArtifactPath(tmp_path, "tiny")
        assert art.pose_path.exists()
        assert art.intrinsics_path.exists()
        assert art.camera_type_path.exists()
        assert art.rgb_path.exists()
        assert art.depth_path.exists()
        assert art.mask_path.exists()
        assert art.info_path.exists()
        assert art.vis_path.exists()

        mats, inds = io_utils.read_pose_artifacts(art)
        assert mats.shape == (T, 4, 4)
        np.testing.assert_array_equal(inds, np.arange(T))
        depths = list(io_utils.read_depth_artifacts(art))
        assert len(depths) == T
        np.testing.assert_allclose(depths[3], 5.0, rtol=1e-3)
        masks = list(io_utils.read_mask_artifacts(art))
        assert len(masks) == T
        np.testing.assert_array_equal(masks[2], np.full((H, W), 2))
        intr, ctype = io_utils.read_intrinsics_artifacts(art)
        assert ctype == "pinhole"
        assert out.frame_inds.shape == (T,)

    def test_no_mask_entries_when_absent(self, stub_slam, tmp_path):
        pipe = DefaultAnnotationPipeline(
            init={"intrinsics": "fov"},
            output={"path": str(tmp_path)},
        )
        pipe.run(TinyStream(with_depth=False, with_instance=False))
        art = io_utils.ArtifactPath(tmp_path, "tiny")
        assert art.pose_path.exists()
        assert not art.depth_path.exists()
        assert not art.mask_path.exists()

    def test_in_memory_mode(self, stub_slam):
        pipe = DefaultAnnotationPipeline(init={"intrinsics": "fov"})
        out = pipe.run(TinyStream())
        rgbs = list(out.rgb_frames)
        assert len(rgbs) == T
        masks = list(out.instance_masks)
        assert len(masks) == T

    def test_skip_exists(self, stub_slam, tmp_path):
        pipe = DefaultAnnotationPipeline(
            init={"intrinsics": "fov"},
            output={"path": str(tmp_path), "skip_exists": True},
        )
        assert not pipe.should_filter("tiny")
        pipe.run(TinyStream())
        assert pipe.should_filter("tiny")


class StubSLAMMultiview(StubSLAM):
    def run(self, stream, camera_type=cam.CameraType.PINHOLE, rig=None):
        from vipe_tpu.streams.base import MultiviewVideoList

        assert isinstance(stream, MultiviewVideoList)
        for s in stream:
            for _ in s:
                pass
        out = canned_slam_output()
        out.intrinsics = np.stack([out.intrinsics] * len(stream))
        out.rig = stream.rig
        return out


class TestPipelineMultiview:
    def test_per_view_artifacts(self, tmp_path, monkeypatch):
        from vipe_tpu.streams.base import MultiviewVideoList

        monkeypatch.setattr(default_mod, "SLAMSystem", StubSLAMMultiview)
        rig = np.zeros((2, 7), np.float32)
        rig[:, 6] = 1.0
        rig[1, 0] = 0.1
        s0, s1 = TinyStream(), TinyStream()
        s0._name, s1._name = "rig_v0", "rig_v1"
        mv = MultiviewVideoList("rig", [s0, s1], rig)
        pipe = DefaultAnnotationPipeline(
            init={"intrinsics": "fov"},
            output={"path": str(tmp_path), "save_artifacts": True},
        )
        out = pipe.run(mv)
        assert out.trajectory.shape == (T, 7)
        for name in ("rig_v0", "rig_v1"):
            art = io_utils.ArtifactPath(tmp_path, name)
            assert art.pose_path.exists(), name
            assert art.intrinsics_path.exists(), name
        # view-1 trajectory offset by the rig translation
        m0, _ = io_utils.read_pose_artifacts(
            io_utils.ArtifactPath(tmp_path, "rig_v0")
        )
        m1, _ = io_utils.read_pose_artifacts(
            io_utils.ArtifactPath(tmp_path, "rig_v1")
        )
        np.testing.assert_allclose(
            m1[:, :3, 3] - m0[:, :3, 3],
            np.broadcast_to([0.1, 0.0, 0.0], (T, 3)),
            atol=1e-5,
        )


class TestCachedStreamCompression:
    def test_uint8_roundtrip_exact_for_video_values(self):
        src = TinyStream()
        # quantize source to k/255 like real decoded video
        for k in range(T):
            src.rgbs[k] = np.rint(src.rgbs[k] * 255) / np.float32(255.0)
        cached = src.cache(online=True, compress_rgb=True)
        out1 = [f.rgb.copy() for f in cached]
        out2 = [f.rgb.copy() for f in cached]  # second pass: from cache
        for a, b, c in zip((f.rgb for f in src), out1, out2):
            np.testing.assert_allclose(a, b, atol=1e-7)
            np.testing.assert_array_equal(b, c)
