"""Per-chip multi-video interleaving.

A single video's SLAM loop leaves the device idle during host↔device
boundaries — keyframe-decision readbacks, proximity-matrix fetches, frame
uploads.  Over a remote-TPU tunnel those gaps dominate wall clock (~40 ms
per round trip at ~2 syncs/keyframe); even co-located they are dead time on
the device queue.  Running K independent videos from one process fills the
gaps: while video A's host thread blocks on a readback (releasing the GIL),
video B's thread dispatches its next fused step into the same device queue.

Per-video semantics are untouched: each video runs the standard single-chip
``SLAMSystem`` / pipeline — results are bit-identical to a serial loop
(pinned by tests/test_interleave.py).  Only the wall-clock overlap changes.
This is the production deployment shape for a batch annotation engine
(reference run.py:5-24 loops videos serially on one GPU): chips/hosts split
the corpus via ``sharding.host_shard_indices``; each chip then interleaves
``workers`` videos.

Device-memory note: each in-flight video holds its own GraphBuffer + factor
graph (≈0.5–2 GB at production resolution depending on ``corr_mode``), so
``workers`` is bounded by HBM, not host cores: the host threads spend their
time blocked on the device/tunnel, which is exactly the point.

Fault isolation: an ordinary per-video Python exception (bad file, shape
mismatch, lstsq failure) is contained — the other videos finish and the
first error re-raises after the drain.  A DEVICE-FATAL fault (a kernel
fault crashing the TPU worker process, surfacing as ``UNAVAILABLE``/
``DATA_LOSS`` JaxRuntimeError) CANNOT be contained in-process: every
in-flight video shares the one device connection, so their next dispatch
fails too.  What the boundary does guarantee: already-finished videos keep
their results, queued not-yet-started videos are skipped fast instead of
each timing out against a dead device, and the raised ``DeviceFatalError``
carries the per-video status map so a driver can re-run the unfinished
videos in a FRESH process (the only real recovery — the device client
cannot be re-initialized in-process).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence

# Substrings that mark a dead device connection rather than a per-video
# bug.  UNAVAILABLE = "TPU worker process crashed or restarted" (measured:
# the panorama extract kernel fault, STATUS r04); DATA_LOSS/INTERNAL are
# the other XLA status codes PJRT surfaces for device-side corruption.
_DEVICE_FATAL_MARKERS = ("UNAVAILABLE", "DATA_LOSS", "INTERNAL")


def is_device_fatal(exc: BaseException) -> bool:
    """True when ``exc`` indicates the device connection itself died (so
    every subsequent dispatch from ANY thread will fail)."""
    name = type(exc).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError"):
        return False
    msg = str(exc)
    return any(m in msg for m in _DEVICE_FATAL_MARKERS)


class DeviceFatalError(RuntimeError):
    """The device connection died mid-batch.  ``statuses[k]`` is one of
    'done' | 'failed' | 'skipped' per job; ``results[k]`` holds finished
    results; ``cause`` is the first fatal exception."""

    def __init__(self, cause: BaseException, statuses, results):
        self.cause = cause
        self.statuses = list(statuses)
        self.results = list(results)
        done = statuses.count("done")
        skipped = statuses.count("skipped")
        super().__init__(
            f"device-fatal fault after {done}/{len(statuses)} videos "
            f"finished ({skipped} skipped unstarted); re-run unfinished "
            f"videos in a fresh process: {cause}"
        )


def run_interleaved(
    jobs: Sequence[Callable],
    workers: int = 4,
    on_result: Optional[Callable] = None,
):
    """Run zero-arg callables in ``workers`` threads; return results in job
    order.

    ``workers <= 1`` degrades to a plain serial loop (the equivalence
    baseline).  ``on_result(index, result)`` fires as each job finishes
    (any thread).  The first job exception propagates after all in-flight
    jobs drain (pending ones still run — a bad video must not kill the
    batch; mirror of run.py's per-video isolation).  A device-fatal fault
    (see module docstring) short-circuits instead: queued jobs are skipped
    and a ``DeviceFatalError`` with the per-video status map is raised.
    """
    import gc

    jobs = list(jobs)
    statuses = ["queued"] * len(jobs)
    results = [None] * len(jobs)

    if workers <= 1:
        errors = []
        for k, job in enumerate(jobs):
            if errors and is_device_fatal(errors[0][1]):
                statuses[k] = "skipped"
                continue
            try:
                results[k] = job()
                statuses[k] = "done"
            except BaseException as e:  # noqa: BLE001 — re-raised below
                statuses[k] = "failed"
                errors.append((k, e))
                continue
            finally:
                # a finished video's SLAM device state (GBs) sits in
                # reference cycles; collect before the next video allocates
                gc.collect()
            if on_result is not None:
                on_result(k, results[k])
        if errors:
            if is_device_fatal(errors[0][1]):
                raise DeviceFatalError(errors[0][1], statuses, results)
            raise errors[0][1]
        return results

    errors = []
    fatal = threading.Event()

    def _run(k):
        if fatal.is_set():
            # dead device: starting this video would block against a dead
            # connection until its own UNAVAILABLE — skip fast instead
            statuses[k] = "skipped"
            return
        try:
            r = jobs[k]()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            statuses[k] = "failed"
            errors.append((k, e))
            if is_device_fatal(e):
                fatal.set()
            return
        finally:
            gc.collect()  # free this video's cyclic SLAM device state
        results[k] = r
        statuses[k] = "done"
        if on_result is not None:
            on_result(k, r)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_run, range(len(jobs))))
    if errors:
        fatal_errs = [e for _, e in errors if is_device_fatal(e)]
        if fatal_errs:
            raise DeviceFatalError(fatal_errs[0], statuses, results)
        raise errors[0][1]
    return results
