"""Unit tests for the threaded host→device feed prefetcher
(vipe_tpu/utils/prefetch.py).  The SLAM-level equivalence (prefetch depth
cannot change trajectories) lives in test_frontend_deferred.py."""

import time

import pytest

from vipe_tpu.utils.prefetch import ThreadPrefetcher


class TestThreadPrefetcher:
    def test_order_preserved(self):
        out = list(ThreadPrefetcher(range(100), lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in range(100)]

    def test_depth_zero_is_synchronous(self):
        seen = []

        def prepare(x):
            seen.append(x)
            return x

        it = iter(ThreadPrefetcher(range(5), prepare, depth=0))
        assert next(it) == 0
        assert seen == [0]  # nothing ran ahead

    def test_runs_ahead(self):
        started = []

        def prepare(x):
            started.append(x)
            return x

        it = iter(ThreadPrefetcher(range(10), prepare, depth=3))
        assert next(it) == 0
        deadline = time.time() + 2.0
        # producer should fill the queue (depth 3) + hold one in flight
        while len(started) < 4 and time.time() < deadline:
            time.sleep(0.01)
        assert len(started) >= 4

    def test_prepare_exception_propagates(self):
        def prepare(x):
            if x == 3:
                raise ValueError("boom")
            return x

        it = iter(ThreadPrefetcher(range(10), prepare, depth=2))
        assert [next(it) for _ in range(3)] == [0, 1, 2]
        with pytest.raises(ValueError, match="boom"):
            # drain until the error surfaces (it may be queued behind
            # already-prepared items)
            for _ in range(5):
                next(it)

    def test_source_exception_propagates(self):
        def src():
            yield 1
            raise RuntimeError("bad stream")

        with pytest.raises(RuntimeError, match="bad stream"):
            list(ThreadPrefetcher(src(), lambda x: x, depth=2))

    def test_early_exit_does_not_hang(self):
        # consumer abandons mid-iteration with a full queue: the producer
        # thread must not deadlock the process at exit (daemon + unblock)
        it = iter(ThreadPrefetcher(range(1000), lambda x: x, depth=2))
        assert next(it) == 0
        it.close()
