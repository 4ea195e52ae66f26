"""Stream layer tests: mp4 decode, caching, processors, resize semantics."""

import numpy as np
import pytest

from vipe_tpu.streams.base import (
    AssignAttributesProcessor,
    CachedVideoStream,
    FrameAttribute,
    ProcessedVideoStream,
    StreamList,
    VideoFrame,
)


@pytest.fixture(scope="module")
def tiny_mp4(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    rng = np.random.default_rng(0)
    base = (rng.random((48 + 16, 64 + 16, 3)) * 255).astype(np.uint8)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for k in range(10):
        w.write(base[k: k + 48, k: k + 64])
    w.release()
    return str(path)


class TestMp4Stream:
    def test_decode_all(self, tiny_mp4):
        from vipe_tpu.streams.raw_mp4_stream import RawMp4Stream

        s = RawMp4Stream(tiny_mp4)
        frames = list(s)
        assert len(frames) == len(s) == 10
        assert frames[0].rgb.shape == (48, 64, 3)
        assert frames[0].rgb.dtype == np.float32
        assert 0.0 <= frames[0].rgb.min() and frames[0].rgb.max() <= 1.0
        assert s.frame_size() == (48, 64)

    def test_seek_range(self, tiny_mp4):
        from vipe_tpu.streams.raw_mp4_stream import RawMp4Stream

        s = RawMp4Stream(tiny_mp4, seek_range=(2, 8, 2))
        frames = list(s)
        assert len(frames) == 3
        assert [f.raw_frame_idx for f in frames] == [2, 4, 6]

    def test_stream_list_glob(self, tiny_mp4):
        import pathlib

        from vipe_tpu.streams.raw_mp4_stream import RawMp4StreamList

        sl = RawMp4StreamList(pathlib.Path(tiny_mp4).parent)
        assert len(sl) == 1
        assert next(iter(sl)).name() == "clip"


class TestCaching:
    def _stream(self, n=6):
        class _S(__import__("vipe_tpu.streams.base", fromlist=["VideoStream"]).VideoStream):
            def __init__(self):
                self.decode_count = 0

            def __len__(self):
                return n

            def frame_size(self):
                return (8, 8)

            def __iter__(self):
                for k in range(n):
                    self.decode_count += 1
                    yield VideoFrame(k, np.full((8, 8, 3), k / 10, np.float32))

        return _S()

    def test_eager_cache_decodes_once(self):
        src = self._stream()
        c = CachedVideoStream(src)
        assert src.decode_count == 6
        list(c); list(c)
        assert src.decode_count == 6  # no re-decode

    def test_online_cache(self):
        src = self._stream()
        c = CachedVideoStream(src, online=True)
        assert src.decode_count == 0
        f = list(c)
        assert len(f) == 6 and src.decode_count == 6

    def test_online_cache_partial_reiteration(self):
        """A fresh iteration after a PARTIAL fill must resume the source at
        the first uncached index, not re-yield the source's frame 0 there."""
        src = self._stream()
        c = CachedVideoStream(src, online=True)
        it = iter(c)
        first3 = [next(it) for _ in range(3)]
        assert [f.raw_frame_idx for f in first3] == [0, 1, 2]
        # abandon `it`, start over
        frames = list(c)
        assert [f.raw_frame_idx for f in frames] == [0, 1, 2, 3, 4, 5]
        assert [float(f.rgb[0, 0, 0]) for f in frames] == pytest.approx(
            [k / 10 for k in range(6)]
        )
        # fully cached now: no further decodes on re-iteration
        n = src.decode_count
        list(c)
        assert src.decode_count == n


class TestPrefill:
    """start_prefill: the cache fills from a background thread (masking
    overlaps SLAM, pipeline/default.py) with pull semantics unchanged."""

    def _stream(self, n=6, delay=0.0, fail_at=None):
        import time as _t

        class _S(__import__("vipe_tpu.streams.base", fromlist=["VideoStream"]).VideoStream):
            def __init__(self):
                self.decode_count = 0

            def __len__(self):
                return n

            def frame_size(self):
                return (8, 8)

            def __iter__(self):
                for k in range(n):
                    if fail_at is not None and k == fail_at:
                        raise RuntimeError("bad frame")
                    if delay:
                        _t.sleep(delay)
                    self.decode_count += 1
                    yield VideoFrame(k, np.full((8, 8, 3), k / 10, np.float32))

        return _S()

    def test_prefill_same_frames_and_order(self):
        src = self._stream()
        c = CachedVideoStream(src, online=True, compress_rgb=True)
        c.start_prefill()
        frames = list(c)
        assert [f.raw_frame_idx for f in frames] == list(range(6))
        assert [float(f.rgb[0, 0, 0]) for f in frames] == pytest.approx(
            [round(k / 10 * 255) / 255 for k in range(6)]
        )
        assert src.decode_count == 6
        list(c)
        assert src.decode_count == 6  # fully cached, no re-decode

    def test_consumer_blocks_until_filled(self):
        src = self._stream(delay=0.02)
        c = CachedVideoStream(src, online=True)
        c.start_prefill()
        # immediate consumption must still see every frame, in order
        assert [f.raw_frame_idx for f in c] == list(range(6))

    def test_prefill_exception_reaches_consumer(self):
        c = CachedVideoStream(self._stream(fail_at=3), online=True)
        c.start_prefill()
        it = iter(c)
        got = [next(it).raw_frame_idx for _ in range(3)]
        assert got == [0, 1, 2]
        with pytest.raises(RuntimeError, match="bad frame"):
            next(it)

    def test_prefill_early_exhaustion_truncates(self):
        class _Short(__import__("vipe_tpu.streams.base", fromlist=["VideoStream"]).VideoStream):
            def __len__(self):
                return 6  # lies: only 4 real frames

            def frame_size(self):
                return (8, 8)

            def __iter__(self):
                for k in range(4):
                    yield VideoFrame(k, np.zeros((8, 8, 3), np.float32))

        c = CachedVideoStream(_Short(), online=True)
        c.start_prefill()
        assert len(list(c)) == 4
        assert len(c) == 4

    def test_prefill_noop_on_filled_cache(self):
        src = self._stream()
        c = CachedVideoStream(src, online=False)
        c.start_prefill()  # already filled: no thread, still iterable
        assert len(list(c)) == 6


class TestProcessors:
    def test_assign_attributes(self):
        poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (4, 1))
        intr = np.asarray([10.0, 10, 4, 4])

        class _S(__import__("vipe_tpu.streams.base", fromlist=["VideoStream"]).VideoStream):
            def __len__(self):
                return 4

            def frame_size(self):
                return (8, 8)

            def __iter__(self):
                for k in range(4):
                    yield VideoFrame(k, np.zeros((8, 8, 3), np.float32))

        p = AssignAttributesProcessor(poses=poses, intrinsics=intr)
        ps = ProcessedVideoStream(_S(), [p])
        assert FrameAttribute.POSE in ps.attributes()
        f = list(ps)[2]
        np.testing.assert_array_equal(f.pose, poses[2])
        np.testing.assert_array_equal(f.intrinsics, intr)

    def test_resize_processor_intrinsics(self):
        from vipe_tpu.slam.system import StandardResizeStreamProcessor

        proc = StandardResizeStreamProcessor(target_area=24 * 32)
        frame = VideoFrame(
            0, np.zeros((48, 64, 3), np.float32),
            intrinsics=np.asarray([100.0, 100.0, 32.0, 24.0], np.float32),
        )
        out = proc(0, frame)
        h, w = out.size()
        assert h % 8 == 0 and w % 8 == 0
        assert abs(h * w - 24 * 32) < 200
        # recover_intrinsics inverts the transform
        rec = proc.recover_intrinsics(out.intrinsics)
        np.testing.assert_allclose(rec, [100.0, 100.0, 32.0, 24.0], rtol=0.05)

    def test_frame_crop_resize(self):
        frame = VideoFrame(
            0, np.arange(48 * 64 * 3, dtype=np.float32).reshape(48, 64, 3) / 1e4,
            mask=np.ones((48, 64), bool),
            metric_depth=np.full((48, 64), 2.0, np.float32),
            intrinsics=np.asarray([50.0, 50.0, 32.0, 24.0], np.float32),
        )
        f2 = frame.resize((24, 32)).crop(2, 2, 4, 4)
        assert f2.size() == (20, 24)
        assert f2.mask.shape == (20, 24)
        assert f2.metric_depth.shape == (20, 24)
        np.testing.assert_allclose(f2.intrinsics[2], 32.0 / 2 - 4)


class TestMultiviewStreamFactory:
    def test_config_factory_builds_rig_list(self, tmp_path):
        import cv2

        from vipe_tpu.streams.base import MultiviewVideoList, StreamList

        for name in ("cam0.mp4", "cam1.mp4"):
            w = cv2.VideoWriter(str(tmp_path / name),
                                cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
            for k in range(5):
                w.write(np.full((48, 64, 3), k * 20, np.uint8))
            w.release()
        rig = [[0, 0, 0, 0, 0, 0, 1], [0.1, 0, 0, 0, 0, 0, 1]]
        sl = StreamList.make({
            "instance":
                "vipe_tpu.streams.raw_mp4_stream.MultiviewMp4StreamList",
            "videos": [str(tmp_path / "cam0.mp4"), str(tmp_path / "cam1.mp4")],
            "rig": rig,
        })
        mv = list(sl)[0]
        assert isinstance(mv, MultiviewVideoList)
        assert len(mv) == 2 and mv.num_frames() == 5
        np.testing.assert_allclose(mv.rig, np.asarray(rig, np.float32))
        assert mv.cache() is mv  # run.py compatibility
