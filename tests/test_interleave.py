"""Per-chip multi-video interleaving (vipe_tpu/parallel/interleave.py).

The interleaved driver must be a pure wall-clock optimization: each video's
trajectory must be BIT-IDENTICAL to running it alone, because every video
owns its buffers and the shared pieces (params, compiled programs) are
read-only.  Plus plain unit semantics of run_interleaved.
"""

import functools
import threading
import time

import numpy as np
import pytest

from vipe_tpu.parallel.interleave import run_interleaved


class TestRunInterleaved:
    def test_order_and_results(self):
        jobs = [lambda k=k: k * k for k in range(7)]
        assert run_interleaved(jobs, workers=3) == [k * k for k in range(7)]

    def test_serial_fallback(self):
        seen = []
        jobs = [lambda k=k: seen.append(k) or k for k in range(4)]
        assert run_interleaved(jobs, workers=1) == [0, 1, 2, 3]
        assert seen == [0, 1, 2, 3]

    def test_exception_propagates_after_drain(self):
        done = []

        def bad():
            raise ValueError("boom")

        def good(k):
            time.sleep(0.01)
            done.append(k)
            return k

        with pytest.raises(ValueError, match="boom"):
            run_interleaved(
                [bad] + [functools.partial(good, k) for k in range(5)],
                workers=2,
            )
        assert sorted(done) == [0, 1, 2, 3, 4]  # pending jobs still ran

    def test_device_fatal_skips_queued_and_reports(self):
        """A device-fatal fault (dead TPU worker connection) cannot be
        contained in-process — but finished videos keep their results,
        queued videos are skipped fast instead of failing against the dead
        device one by one, and the raised error carries the status map so a
        driver can re-run the unfinished set in a fresh process."""
        from vipe_tpu.parallel.interleave import DeviceFatalError

        class JaxRuntimeError(RuntimeError):
            """Name-matched stand-in for jax's error type (is_device_fatal
            classifies by type NAME + status substring, so tests don't have
            to manufacture a real dead PJRT client)."""

        started = []

        def ok(k):
            started.append(k)
            return k

        def fatal():
            started.append("fatal")
            raise JaxRuntimeError(
                "UNAVAILABLE: TPU worker process crashed or restarted."
            )

        jobs = [functools.partial(ok, 0), fatal] + [
            functools.partial(ok, k) for k in range(2, 6)
        ]
        # serial path: deterministic — job 0 done, job 1 fatal, rest skipped
        with pytest.raises(DeviceFatalError) as ei:
            run_interleaved(jobs, workers=1)
        assert ei.value.statuses == ["done", "failed"] + ["skipped"] * 4
        assert ei.value.results[0] == 0
        assert "fresh process" in str(ei.value)
        assert started == [0, "fatal"]

        # threaded path: statuses partition into done/failed/skipped and the
        # fatal cause is preserved
        started.clear()
        with pytest.raises(DeviceFatalError) as ei:
            run_interleaved(jobs, workers=2)
        sts = ei.value.statuses
        assert sts[1] == "failed"
        assert all(s in ("done", "failed", "skipped") for s in sts)
        assert "UNAVAILABLE" in str(ei.value.cause)

    def test_ordinary_exception_still_drains(self):
        """Non-fatal errors keep the old isolation contract: every other
        video still runs (no skipping)."""
        done = []

        def bad():
            raise ValueError("per-video bug")

        jobs = [bad] + [lambda k=k: done.append(k) or k for k in range(4)]
        with pytest.raises(ValueError):
            run_interleaved(jobs, workers=1)
        assert sorted(done) == [0, 1, 2, 3]

    def test_actually_concurrent(self):
        gate = threading.Barrier(2, timeout=10)

        def job():
            gate.wait()  # deadlocks unless two jobs run at once
            return 1

        assert run_interleaved([job, job], workers=2) == [1, 1]

    def test_on_result_callback(self):
        got = {}
        run_interleaved(
            [lambda k=k: k + 10 for k in range(4)],
            workers=2,
            on_result=lambda k, r: got.__setitem__(k, r),
        )
        assert got == {0: 10, 1: 11, 2: 12, 3: 13}


def _tiny_stream(seed: int, n: int = 12, h: int = 48, w: int = 64):
    from vipe_tpu.streams.base import FrameAttribute, VideoFrame, VideoStream

    rng = np.random.default_rng(seed)
    base = rng.random((h + 16, w + 16, 3)).astype(np.float32)

    class _S(VideoStream):
        def __len__(self):
            return n

        def frame_size(self):
            return (h, w)

        def attributes(self):
            return {FrameAttribute.RGB, FrameAttribute.INTRINSICS}

        def __iter__(self):
            for k in range(n):
                ox, oy = (k * 3) % 16, (k * 2) % 16
                yield VideoFrame(
                    raw_frame_idx=k,
                    rgb=base[oy: oy + h, ox: ox + w],
                    intrinsics=np.asarray(
                        [w * 0.9, w * 0.9, w / 2, h / 2], np.float32
                    ),
                )

    return _S()


def _run_one(seed: int):
    from vipe_tpu.slam.system import SLAMSystem

    sys_ = SLAMSystem(config=dict(
        warmup=4, buffer=64, infill_chunk_size=8, backend_iters=2,
        filter_thresh=float("inf"), keyframe_stride=3,
        resize_area=48 * 64,
    ))
    return sys_.run(_tiny_stream(seed))


class TestInterleavedSLAM:
    def test_matches_serial_bitwise(self):
        serial = [_run_one(0), _run_one(1)]
        inter = run_interleaved(
            [functools.partial(_run_one, 0), functools.partial(_run_one, 1)],
            workers=2,
        )
        for s, p in zip(serial, inter):
            np.testing.assert_array_equal(s.trajectory, p.trajectory)
            np.testing.assert_array_equal(s.intrinsics, p.intrinsics)
