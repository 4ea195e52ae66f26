"""Process-level prior-model cache.

The reference (and run.py, mirroring it) constructs a FRESH pipeline per
video (reference run.py:14-24).  In torch that is cheap; in jax every
instance-level ``jax.jit`` closure is a new trace cache, so a fresh
pipeline re-traces (and re-loads from the compile cache over the remote
tunnel) every prior program — measured ~hundreds of seconds of
construction + first-call overhead per video for the full zoo
(GDINO/SAM/DeAOT/UniDepth/VDA/GeoCalib).  A batch annotation process
should pay that once.

Two tiers:

* ``cached_global`` — STATELESS models (depth zoo nets, GeoCalib, the
  GDINO detector): instances hold only params + jit closures; concurrent
  jitted calls are thread-safe, so one instance serves every video and
  every interleave worker.
* ``cached_thread`` — STATEFUL engines (the TrackAnything pipeline: SAM's
  cached image embed, DeAOT's long/short-term memory, id-assignment
  counters): run.py's interleave runs one video at a time per worker
  thread, so per-thread instances make reuse safe across that thread's
  sequential videos while never sharing mutable state across concurrent
  ones.  Callers must reset per-video state on reuse (e.g.
  ``TrackAnythingPipeline.reset``).

Keys should include the class/builder identity when the class is
monkeypatchable (tests swap tiny variants in).
"""

from __future__ import annotations

import threading
from typing import Callable, Hashable

_global: dict = {}
_global_lock = threading.Lock()
_tls = threading.local()


def cached_global(key: Hashable, builder: Callable):
    with _global_lock:
        if key not in _global:
            _global[key] = builder()
        return _global[key]


def cached_thread(key: Hashable, builder: Callable):
    d = getattr(_tls, "d", None)
    if d is None:
        d = _tls.d = {}
    if key not in d:
        d[key] = builder()
    return d[key]


def clear():
    """Test hook: drop every cached model (global + this thread's)."""
    with _global_lock:
        _global.clear()
    if getattr(_tls, "d", None) is not None:
        _tls.d.clear()
