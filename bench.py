"""Benchmark: SLAM annotation throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the end-to-end SLAM hot path (per-frame feature encoding + motion
filter + frontend GRU/BA tracking at the production ~512×384 operating
resolution) on a synthetic 720p video, in frames/second.  vs_baseline is
against the BASELINE.json north-star of 150 fps/chip.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def synth_stream(n_frames: int, h: int = 720, w: int = 1280, seed: int = 0,
                 with_intrinsics: bool = True):
    # BENCH_RES=HxW overrides the 720p default (structural smoke runs)
    res = os.environ.get("BENCH_RES")
    if res:
        h, w = (int(v) for v in res.split("x"))
    from vipe_tpu.streams.base import FrameAttribute, VideoFrame, VideoStream

    rng = np.random.default_rng(seed)
    base = rng.random((h + 64, w + 64, 3)).astype(np.float32)

    class _S(VideoStream):
        _name = f"bench{seed}"

        def __len__(self):
            return n_frames

        def frame_size(self):
            return (h, w)

        def attributes(self):
            attrs = {FrameAttribute.RGB}
            if with_intrinsics:
                attrs.add(FrameAttribute.INTRINSICS)
            return attrs

        def __iter__(self):
            for k in range(n_frames):
                # translate a textured canvas → real parallax-free flow, which
                # keeps the motion filter + frontend busy like real footage
                ox, oy = (k * 5) % 64, (k * 3) % 64
                yield VideoFrame(
                    raw_frame_idx=k,
                    rgb=base[oy: oy + h, ox: ox + w],
                    intrinsics=np.asarray(
                        [w * 0.9, w * 0.9, w / 2, h / 2], np.float32
                    ) if with_intrinsics else None,
                )

    return _S()


def calibrate_filter_thresh(n: int = 12) -> float:
    """With random (untrained) DroidNet weights the flow-delta scores are
    arbitrary in scale; pick the threshold as the 60th percentile of observed
    scores so the bench exercises a realistic ~1-in-3 keyframe rate (what
    trained weights produce on normal footage)."""
    import jax.numpy as jnp

    from vipe_tpu.slam.motion_filter import MotionFilter
    from vipe_tpu.slam.system import default_droidnet

    import jax.numpy as jnp2

    _, params, ef, ec, uf = default_droidnet()
    # promote EVERY frame (manually) so each score measures consecutive-frame
    # motion; a finite huge threshold keeps the score path live (±inf takes
    # the fixed-decision fast path that skips scoring entirely)
    mf = MotionFilter(ef, ec, uf, params, thresh=1e9)
    scores = []
    for frame in synth_stream(n, seed=7):
        rgb8 = (np.clip(frame.rgb, 0, 1) * 255).astype(np.uint8)
        tok = mf.submit(jnp2.asarray(rgb8))
        if tok.score is not None:
            scores.append(float(tok.score))
        mf._promote_kf(tok)
    return float(np.quantile(scores, 0.66))


def main_pipeline_full(gate: dict):
    """BENCH_PIPELINE=full: the COMPLETE annotation pipeline — GeoCalib
    intrinsics, TrackAnything per-frame instance masking, UniDepth-L
    keyframe depth, SLAM, adaptive post depth (PriorDA/VDA branches), and
    artifact writing — i.e. what the reference's
    DefaultAnnotationPipeline.run does (reference pipeline/default.py:93-143)
    and what the 150 fps north star actually names.  Reference-default
    hyperparameters (configs/pipeline/full.yaml: backend_iters=24,
    buffer=1024).  Reports aggregate fps + a per-stage wall-clock budget
    (utils/profiling.py) on stderr."""
    import shutil
    import sys as _sys
    import tempfile

    from vipe_tpu.pipeline.default import DefaultAnnotationPipeline
    from vipe_tpu.utils import profiling

    n_frames = int(os.environ.get("BENCH_FRAMES", "48"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    phrases = ["person", "animal", "vehicle", "ball", "balloon",
               "gun", "pet", "car", "bus", "sky"]

    def run_once():
        out_dir = tempfile.mkdtemp(prefix="bench_pipe_")
        pipe = DefaultAnnotationPipeline(
            init=dict(intrinsics="geocalib", camera_type="pinhole",
                      instance="track_anything", phrases=phrases),
            slam=dict(camera_type="pinhole", keyframe_depth="unidepth-l",
                      optimize_intrinsics=True, buffer=1024,
                      backend_iters=24, infill_chunk_size=16,
                      corr_mode=os.environ.get("BENCH_CORR_MODE", "volume"),
                      **gate),
            post=dict(depth_align_model="adaptive_unidepth-l_svda"),
            output=dict(path=out_dir, save_viz=True,
                        viz_attributes=["rgb", "depth"]),
        )
        out = pipe.run(synth_stream(n_frames, with_intrinsics=False))
        shutil.rmtree(out_dir, ignore_errors=True)
        return out

    run_once()  # warm: identical workload (remote compiles, jit buckets)
    profiling.snapshot(reset=True)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_once()
        dt = time.perf_counter() - t0
        assert len(out.frame_inds) == n_frames
        best = dt if best is None else min(best, dt)

    fps = n_frames / best
    budget = profiling.snapshot()
    print(json.dumps({"stage_budget_s_over_reps": budget}), file=_sys.stderr)
    print(json.dumps({
        "metric": "pipeline_annotation_fps_720p",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 150.0, 4),
    }))


def main():
    import jax

    from vipe_tpu.slam.system import SLAMSystem

    n_frames = int(os.environ.get("BENCH_FRAMES", "48"))
    # BENCH_MODE=real exercises the production decision path: a calibrated
    # motion-filter threshold with live score readbacks instead of the
    # deterministic stride fast path (the default stays deterministic for
    # run-to-run comparability with random weights)
    real_mode = os.environ.get("BENCH_MODE") == "real"
    if real_mode:
        thresh = calibrate_filter_thresh()
        gate = dict(filter_thresh=thresh)
    else:
        # untrained weights make the motion-filter score nearly constant
        # (content-insensitive), so gate keyframes deterministically at the
        # realistic trained-weights cadence of 1 in 3
        gate = dict(filter_thresh=float("inf"), keyframe_stride=3)

    # BENCH_PIPELINE=full: the complete annotation pipeline (priors +
    # masking + depth + artifacts), not just the SLAM hot path
    if os.environ.get("BENCH_PIPELINE") == "full":
        return main_pipeline_full(gate)

    # BENCH_CORR_MODE=alt: packed-feature edge state with on-the-fly
    # window dots (pair with VIPE_PALLAS=1 for the fused kernel) — A/B
    # against the default materialized volumes on real hardware
    corr_mode = os.environ.get("BENCH_CORR_MODE", "volume")

    # BENCH_PARK=1: park pass-1 fmaps in fixed-stride skip mode (trades
    # batched pass-2 transfers for per-frame pass-1 ones — tunnel A/B)
    park = os.environ.get("BENCH_PARK") == "1"

    # BENCH_VIDEOS=K: interleave K independent videos on the one chip —
    # the production batch-annotation shape (run.py `interleave`).  Each
    # video's host syncs overlap the other videos' device work; per-video
    # results are identical to serial (tests/test_interleave.py).  Reported
    # fps is aggregate chip throughput (K·n_frames / wall).  Default 2:
    # measured round-2/3 A/B — 2-video volume-mode interleave beats single
    # (+15%); 4-video volume OOMs the chip and 4-video alt is slower than
    # 1-video volume (alt's on-the-fly window recompute costs ~8x on
    # device).  The north star (150 fps/chip) is chip throughput, so the
    # headline measures the deployment shape.
    n_videos = int(os.environ.get("BENCH_VIDEOS", "2"))

    def run(n, seed: int = 0):
        sys_ = SLAMSystem(config=dict(
            warmup=8, buffer=256, infill_chunk_size=16, backend_iters=4,
            corr_mode=corr_mode, park_fmaps_in_skip_mode=park,
            **gate,
        ))
        stream = synth_stream(n, seed=seed)
        return sys_.run(stream)

    def run_batch(n):
        if n_videos == 1:
            return [run(n)]
        import functools

        from vipe_tpu.parallel.interleave import run_interleaved

        return run_interleaved(
            [functools.partial(run, n, seed=v) for v in range(n_videos)],
            workers=n_videos,
        )

    # warmup with the IDENTICAL workload: jit programs are cached in-process
    # per shape bucket, and the remote-compile path has no persistent cache,
    # so the warm run must traverse exactly the shapes the measured run will
    # (incl. every interleaved video's seed — removals are content-dependent
    # and can shift a video into a different pow2 bucket)
    run_batch(n_frames)

    # best of N: the shared remote-TPU tunnel has large run-to-run variance
    # (measured 2x swings with identical code)
    best = None
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        t0 = time.perf_counter()
        outs = run_batch(n_frames)
        dt = time.perf_counter() - t0
        assert all(o.trajectory.shape[0] == n_frames for o in outs)
        best = dt if best is None else min(best, dt)

    fps = n_frames * n_videos / best
    name = (
        "slam_annotation_fps_720p_real" if real_mode
        else "slam_annotation_fps_720p"
    )
    if n_videos > 1:
        # aggregate chip throughput over an n-video interleave (the
        # production shape); suffix keeps the metric self-describing
        name += f"_x{n_videos}"
    print(json.dumps({
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 150.0, 4),
    }))


if __name__ == "__main__":
    main()
