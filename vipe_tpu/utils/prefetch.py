"""Threaded iterator prefetch for the host→device feed.

SURVEY §2.6.4 (streaming overlap): the reference pays a CPU→GPU copy per
frame inline with tracking (/root/reference/vipe/streams/raw_mp4_stream.py:90).
Here the per-frame host work — video decode, resize (cv2), uint8 conversion,
mask downsampling and the device upload itself — runs on a side thread a
bounded number of items ahead of the consumer.  The win on a remote-TPU
tunnel is direct: the tracking loop's blocking readbacks (proximity-matrix /
decision fetches) release the GIL while they wait on the network, and the
prefetch thread fills exactly that shadow with the next frames' decode +
upload.  Decisions stay timing-independent (tokens are re-scored on
promotion), so prefetch depth cannot change results.

jax transfers are thread-safe; the thread only calls ``prepare`` (host work
+ ``jnp.asarray`` uploads) — it never traces or dispatches compiled programs.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class ThreadPrefetcher:
    """Iterate ``prepare(item)`` for each item of ``src``, computed up to
    ``depth`` items ahead on a daemon thread.

    ``depth <= 0`` degrades to a synchronous map (no thread) — the
    equivalence baseline and the fallback for debugging.
    Exceptions raised by ``src`` or ``prepare`` re-raise at the consumer's
    ``next()`` call, preserving order.
    """

    _DONE = object()

    def __init__(self, src: Iterable, prepare: Callable, depth: int = 2):
        self.src = src
        self.prepare = prepare
        self.depth = int(depth)
        self._thread: Optional[threading.Thread] = None
        self._q: Optional[queue.Queue] = None
        self._stop = threading.Event()

    def _worker(self):
        try:
            for item in self.src:
                if self._stop.is_set():
                    return
                self._q.put(self.prepare(item))
            self._q.put(self._DONE)
        except BaseException as e:  # re-raised at the consumer
            self._q.put(e)

    def __iter__(self) -> Iterator:
        if self.depth <= 0:
            for item in self.src:
                yield self.prepare(item)
            return
        self._q = queue.Queue(maxsize=self.depth)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        try:
            while True:
                out = self._q.get()
                if out is self._DONE:
                    return
                if isinstance(out, BaseException):
                    raise out
                yield out
        finally:
            # consumer abandoned the iterator (exception/early exit):
            # unblock a producer stuck on a full queue, then detach
            self._stop.set()
            if self._thread.is_alive():
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    pass
