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
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence


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
    batch; mirror of run.py's per-video isolation).
    """
    import gc

    jobs = list(jobs)
    if workers <= 1:
        results = []
        for k, job in enumerate(jobs):
            r = job()
            # a finished video's SLAM device state (GBs) sits in reference
            # cycles; collect before the next video allocates its own
            gc.collect()
            if on_result is not None:
                on_result(k, r)
            results.append(r)
        return results

    results = [None] * len(jobs)
    errors = []

    def _run(k):
        try:
            r = jobs[k]()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors.append(e)
            return
        finally:
            gc.collect()  # free this video's cyclic SLAM device state
        results[k] = r
        if on_result is not None:
            on_result(k, r)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_run, range(len(jobs))))
    if errors:
        raise errors[0]
    return results
