"""Lazy video stream layer (reference /root/reference/vipe/streams/base.py).

Same shapes as the reference: ``VideoFrame`` (per-frame attribute record),
``VideoStream`` (sized iterable), ``ProcessedVideoStream`` (processor
composition), ``CachedVideoStream`` (decode-once memory cache), and the
``StreamList`` factory.  Frames are numpy HWC float32 RGB in [0, 1] on the
host; device placement happens at the consumer (SLAM / priors) so the stream
layer stays decode-only.
"""

from __future__ import annotations

import dataclasses
import importlib
from enum import Enum
from typing import Iterator, List, Optional, Sequence

import numpy as np


class FrameAttribute(Enum):
    """Reference streams/base.py:37-44."""

    RGB = "rgb"
    MASK = "mask"
    INSTANCE = "instance"
    METRIC_DEPTH = "metric_depth"
    POSE = "pose"
    INTRINSICS = "intrinsics"


@dataclasses.dataclass
class VideoFrame:
    """Per-frame record (reference streams/base.py:46-263).

    rgb: (H, W, 3) float32 in [0, 1].
    mask: (H, W) bool, True = valid (dynamic pixels False) — NOTE the
      reference stores 1=valid here and inverts into buffer masks.
    instance: (H, W) int32 instance ids (0 = background).
    metric_depth: (H, W) float32 metric depth.
    pose: (7,) cam2world SE3 [t, q] if known (GT streams).
    intrinsics: (D,) full-res intrinsics if known.
    """

    SKY_PROMPT = "sky"

    raw_frame_idx: int
    rgb: np.ndarray
    mask: Optional[np.ndarray] = None
    instance: Optional[np.ndarray] = None
    instance_phrases: Optional[dict] = None
    metric_depth: Optional[np.ndarray] = None
    pose: Optional[np.ndarray] = None
    intrinsics: Optional[np.ndarray] = None

    def size(self) -> tuple:
        return self.rgb.shape[0], self.rgb.shape[1]

    @property
    def sky_mask(self) -> np.ndarray:
        """(H, W) bool, True where an instance labelled ``sky`` sits
        (reference base.py:256-263).  Sky is kept valid for SLAM weights
        but excluded from depth alignment."""
        out = np.zeros(self.size(), bool)
        if self.instance is not None and self.instance_phrases:
            sky_ids = [
                i for i, p in self.instance_phrases.items()
                if p == self.SKY_PROMPT
            ]
            if sky_ids:
                # one LUT gather — a full-res pass per sky id is
                # O(ids·H·W) host time at dense instance maps
                lut = np.zeros(int(max(
                    self.instance.max(), max(sky_ids)
                )) + 1, bool)
                lut[sky_ids] = True
                out = lut[self.instance]
        return out

    def resize(self, new_size: tuple) -> "VideoFrame":
        import cv2

        h1, w1 = new_size
        h0, w0 = self.size()
        if (h0, w0) == (h1, w1):
            return self

        def _img(x, interp):
            return cv2.resize(np.asarray(x), (w1, h1), interpolation=interp)

        out = dataclasses.replace(self, rgb=_img(self.rgb, cv2.INTER_LINEAR))
        if self.mask is not None:
            out.mask = _img(self.mask.astype(np.uint8), cv2.INTER_NEAREST).astype(bool)
        if self.instance is not None:
            out.instance = _img(self.instance, cv2.INTER_NEAREST)
        if self.metric_depth is not None:
            out.metric_depth = _img(self.metric_depth, cv2.INTER_NEAREST)
        if self.intrinsics is not None:
            intr = self.intrinsics.copy()
            intr[0:4:2] *= w1 / w0
            intr[1:4:2] *= h1 / h0
            out.intrinsics = intr
        return out

    def crop(self, top: int, bottom: int, left: int, right: int) -> "VideoFrame":
        h, w = self.size()
        sl = (slice(top, h - bottom), slice(left, w - right))
        out = dataclasses.replace(self, rgb=self.rgb[sl])
        for name in ("mask", "instance", "metric_depth"):
            v = getattr(self, name)
            if v is not None:
                setattr(out, name, v[sl])
        if self.intrinsics is not None:
            intr = self.intrinsics.copy()
            intr[2] -= left
            intr[3] -= top
            out.intrinsics = intr
        return out


class VideoStream:
    """Sized, re-iterable stream of VideoFrames (reference base.py:266-291)."""

    def __iter__(self) -> Iterator[VideoFrame]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def frame_size(self) -> tuple:
        raise NotImplementedError

    def fps(self) -> float:
        return 30.0

    def attributes(self) -> set:
        return {FrameAttribute.RGB}

    def name(self) -> str:
        return getattr(self, "_name", "stream")

    def cache(self, desc: str = "cache", online: bool = False,
              compress_rgb: bool = False) -> "CachedVideoStream":
        return CachedVideoStream(self, online=online, compress_rgb=compress_rgb)


class StreamProcessor:
    """Per-frame transform protocol (reference base.py:402-420)."""

    def __call__(self, frame_idx: int, frame: VideoFrame) -> VideoFrame:
        raise NotImplementedError

    def update_frame_size(self, previous: tuple) -> tuple:
        return previous

    def update_attributes(self, previous: set) -> set:
        return previous

    def update_iterator(self, it: Iterator[VideoFrame]) -> Iterator[VideoFrame]:
        """Optional whole-stream hook (used by video-level processors)."""
        for idx, frame in enumerate(it):
            yield self(idx, frame)


class ProcessedVideoStream(VideoStream):
    """Composed lazy stream (reference base.py:436-483)."""

    def __init__(self, stream: VideoStream, processors: Sequence[StreamProcessor]):
        self.stream = stream
        self.processors = list(processors)
        self._name = stream.name()

    def __len__(self):
        return len(self.stream)

    def fps(self):
        return self.stream.fps()

    def frame_size(self):
        size = self.stream.frame_size()
        for p in self.processors:
            size = p.update_frame_size(size)
        return size

    def attributes(self):
        attrs = self.stream.attributes()
        for p in self.processors:
            attrs = p.update_attributes(attrs)
        return attrs

    def __iter__(self):
        it = iter(self.stream)
        for p in self.processors:
            it = p.update_iterator(it)
        return it


class CachedVideoStream(VideoStream):
    """Decode-once memory cache (reference base.py:330-399).  ``online=True``
    fills lazily as consumed; otherwise eagerly on construction."""

    def __init__(self, stream: VideoStream, online: bool = False,
                 compress_rgb: bool = False):
        self.stream = stream
        self._name = stream.name()
        self._compress = compress_rgb
        self._frames: List[Optional[VideoFrame]] = [None] * len(stream)
        self._iter = None
        self._src_pos = 0
        self._filled = 0
        self._prefill = None  # background filler thread (start_prefill)
        if not online:
            for i, f in enumerate(stream):
                self._frames[i] = self._pack(f)
            self._filled = len(self._frames)

    def start_prefill(self):
        """Fill the cache from a background daemon thread so the upstream
        processor chain (TrackAnything masking: GDINO/SAM detection + DeAOT
        propagation) runs AHEAD of the consumer instead of inline with its
        pull.  The SLAM loop's blocking readbacks release the GIL and the
        filler dispatches its device programs into those gaps — mask
        tracking overlaps tracking instead of serializing with it
        (reference pipeline semantics preserved: same frames, same order,
        masks computed from the same detector cadence).

        Consumers that out-run the filler block until the frame is cached;
        a filler exception re-raises at the consumer's next pull.  Must be
        called before the first consumption of a fresh online cache."""
        if self._filled >= len(self._frames) or self._prefill is not None:
            return self
        assert self._iter is None and self._filled == 0, (
            "start_prefill requires a fresh (unconsumed) online cache"
        )
        import threading

        self._cond = threading.Condition()
        self._prefill_exc: Optional[BaseException] = None
        self._prefill_done = False

        def _fill():
            try:
                for i, f in enumerate(self.stream):
                    if i >= len(self._frames):
                        break
                    packed = self._pack(f)
                    with self._cond:
                        self._frames[i] = packed
                        self._filled = i + 1
                        self._cond.notify_all()
                with self._cond:
                    if self._filled < len(self._frames):
                        # early source exhaustion: truncate like the inline
                        # path does
                        self._frames = self._frames[: self._filled]
                    self._prefill_done = True
                    self._cond.notify_all()
            except BaseException as e:  # noqa: BLE001 — re-raised at consumer
                with self._cond:
                    self._prefill_exc = e
                    self._prefill_done = True
                    self._cond.notify_all()

        self._prefill = threading.Thread(
            target=_fill, daemon=True, name=f"prefill-{self._name}"
        )
        self._prefill.start()
        return self

    def _iter_prefilled(self):
        i = 0
        while True:
            with self._cond:
                while i >= self._filled and not self._prefill_done:
                    self._cond.wait()
                if (i < self._filled and i < len(self._frames)
                        and self._frames[i] is not None):
                    f = self._frames[i]  # drain cached frames first …
                elif self._prefill_exc is not None:
                    # … so a filler failure surfaces AT the failing frame
                    raise self._prefill_exc
                else:
                    return
            yield self._unpack(f)
            i += 1

    def _pack(self, frame: VideoFrame) -> VideoFrame:
        """Store rgb as uint8 (4× smaller; exact round-trip for video-decoded
        k/255 values via rint)."""
        if not self._compress or frame.rgb.dtype == np.uint8:
            return frame
        rgb8 = np.rint(np.clip(frame.rgb, 0.0, 1.0) * 255.0).astype(np.uint8)
        return dataclasses.replace(frame, rgb=rgb8)

    def _unpack(self, frame: VideoFrame) -> VideoFrame:
        if not self._compress or frame.rgb.dtype != np.uint8:
            return frame
        return dataclasses.replace(
            frame, rgb=frame.rgb.astype(np.float32) / 255.0
        )

    def __len__(self):
        return len(self._frames)

    def fps(self):
        return self.stream.fps()

    def frame_size(self):
        return self.stream.frame_size()

    def attributes(self):
        return self.stream.attributes()

    def __iter__(self):
        if self._filled >= len(self._frames):
            for f in self._frames:
                yield self._unpack(f)  # type: ignore[arg-type]
            return
        if self._prefill is not None:
            yield from self._iter_prefilled()
            return
        for i in range(len(self._frames)):
            if self._frames[i] is not None:
                yield self._unpack(self._frames[i])
                continue
            # Uncached index: pull from ONE persistent source iterator whose
            # position is tracked, so a re-iteration after a partial fill
            # resumes where the cache ends instead of re-yielding the
            # source's frame 0 into slot i (silent frame misassignment).
            if self._iter is None:
                self._iter = iter(self.stream)
                self._src_pos = 0
            try:
                while self._src_pos < i:  # skip source frames already cached
                    next(self._iter)
                    self._src_pos += 1
                frame = next(self._iter)
                self._src_pos += 1
            except StopIteration:
                self._frames = self._frames[:i]
                self._filled = i
                self._iter = None
                return
            self._frames[i] = self._pack(frame)
            self._filled = i + 1
            yield self._unpack(self._frames[i])


class AssignAttributesProcessor(StreamProcessor):
    """Write precomputed per-frame attributes into the stream
    (reference base.py:423-434)."""

    def __init__(self, poses=None, intrinsics=None, metric_depths=None):
        self.poses = poses
        self.intrinsics = intrinsics
        self.metric_depths = metric_depths

    def update_attributes(self, previous):
        attrs = set(previous)
        if self.poses is not None:
            attrs.add(FrameAttribute.POSE)
        if self.intrinsics is not None:
            attrs.add(FrameAttribute.INTRINSICS)
        if self.metric_depths is not None:
            attrs.add(FrameAttribute.METRIC_DEPTH)
        return attrs

    def __call__(self, frame_idx: int, frame: VideoFrame) -> VideoFrame:
        if self.poses is not None:
            frame.pose = np.asarray(self.poses[frame_idx])
        if self.intrinsics is not None:
            intr = self.intrinsics
            frame.intrinsics = np.asarray(
                intr[frame_idx] if np.ndim(intr) > 1 else intr
            )
        if self.metric_depths is not None:
            frame.metric_depth = np.asarray(self.metric_depths[frame_idx])
        return frame


class MultiviewVideoList:
    """Synchronized per-view streams of one rig capture (reference
    base.py:293-326).  ``rig``: (V, 7) camera-to-rig SE3 (xyz + quat),
    view v's camera pose = frame pose ∘ rig[v]."""

    def __init__(self, name: str, video_streams: Sequence[VideoStream], rig):
        import numpy as np

        rig = np.asarray(rig, np.float32)
        if rig.ndim == 1:
            rig = rig[None]
        assert rig.shape == (len(video_streams), 7)
        self._name = name
        self._streams = list(video_streams)
        self.rig = rig
        self._len = len(video_streams[0])
        for vs in video_streams:
            assert len(vs) == self._len

    def __len__(self):
        return len(self._streams)

    def __iter__(self):
        return iter(self._streams)

    def __getitem__(self, idx: int) -> VideoStream:
        return self._streams[idx]

    def name(self) -> str:
        return self._name

    def num_frames(self) -> int:
        return self._len

    def cache(self, *a, **k):
        """No-op (run.py calls .cache() uniformly; the multiview pipeline
        caches per view internally)."""
        return self


class StreamList:
    """Multi-video collection + factory (reference base.py:486-503)."""

    def __init__(self, streams: Sequence[VideoStream]):
        self.streams = list(streams)

    def __len__(self):
        return len(self.streams)

    def __iter__(self):
        return iter(self.streams)

    @staticmethod
    def make(config: dict) -> "StreamList":
        """Instantiate from a dotted ``instance:`` config string, mirroring the
        reference importlib factory."""
        path = config["instance"]
        module, cls = path.rsplit(".", 1)
        klass = getattr(importlib.import_module(module), cls)
        kwargs = {k: v for k, v in config.items() if k != "instance"}
        return klass(**kwargs)
