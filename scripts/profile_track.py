"""Per-stage TPU timing of the TrackAnything path at 720p — the full
pipeline budget says track_anything ≈ 5 s/frame dominates everything
(BENCH_r05 stage budget); this separates GDINO detect / SAM segment /
DeAOT add_reference / DeAOT propagate / host mask glue so the 5 s can be
attributed and attacked.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp python scripts/profile_track.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(name, fn, reps=3):
    # first call may compile; report first + steady-state separately
    t0 = time.perf_counter()
    fn()
    cold = time.perf_counter() - t0
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: cold {cold:.2f}s, warm best {best:.3f}s", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    rgb = (rng.random((720, 1280, 3)) * 255).astype(np.uint8)
    phrases = ["person", "animal", "vehicle", "ball", "balloon",
               "gun", "pet", "car", "bus", "sky"]

    from vipe_tpu.priors.track_anything import TrackAnythingPipeline

    t0 = time.perf_counter()
    pipe = TrackAnythingPipeline(phrases)
    print(f"construct: {time.perf_counter() - t0:.2f}s", flush=True)

    det = pipe.seg_tracker.detector
    seg = pipe.seg_tracker.segmentor
    trk = pipe.tracker

    t("gdino detect", lambda: det.run_grounding(rgb, phrases,
                                                return_phrases=True))
    t("sam set_image", lambda: seg.set_image(rgb))
    box = np.asarray([200.0, 100.0, 500.0, 300.0], np.float32)
    t("sam segment_with_box", lambda: seg.segment_with_box(box))

    inst = np.zeros((720, 1280), np.int32)
    inst[100:300, 200:500] = 1
    inst[400:600, 700:1000] = 2
    t("deaot add_reference", lambda: trk.add_reference(rgb, inst))
    # long memory now has several blocks (bucket>1) — production-like
    t("deaot propagate (memory updated)", lambda: trk.propagate(rgb), reps=6)
    t("deaot propagate no-update", lambda: trk.propagate(
        rgb, update_memory=False), reps=3)

    # host glue: the processor's erode + sky masking
    from vipe_tpu.ops.morph import erode

    valid = inst == 0
    t("host erode(5) 720p", lambda: np.asarray(erode(valid, 5)))

    # full per-frame track() as the processor calls it (first call is the
    # internal frame-0 detection; warm reps are propagate frames)
    t("pipeline.track per frame", lambda: pipe.track(1, rgb), reps=6)
    print("done", flush=True)


if __name__ == "__main__":
    main()
