"""Hardware A/B sweep: corr_mode x n_videos on one chip, ONE process.

Runs the bench workload for each BENCH_SWEEP_VIDEOS value (comma list,
default "1,2,4") inside a single process so the expensive remote compiles
(~10-100 s/program over the tunnel) are paid once per shape bucket and
shared across the interleave widths.  corr_mode / VIPE_PALLAS come from the
same env knobs as bench.py (VIPE_PALLAS is a trace-time gate -> one process
per setting).

Prints one JSON line per config:
  {"corr_mode", "pallas", "videos", "fps", "wall_s", "per_video_fps"}
and never dies on a single config's failure (e.g. volume-mode 4-video
RESOURCE_EXHAUSTED) -- it reports {"error": ...} for that config and moves on.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import bench  # noqa: E402


def main():
    from vipe_tpu.parallel.interleave import run_interleaved
    from vipe_tpu.slam.system import SLAMSystem

    n_frames = int(os.environ.get("BENCH_FRAMES", "48"))
    corr_mode = os.environ.get("BENCH_CORR_MODE", "volume")
    pallas = os.environ.get("VIPE_PALLAS") == "1"
    reps = int(os.environ.get("BENCH_REPS", "2"))
    widths = [int(v) for v in
              os.environ.get("BENCH_SWEEP_VIDEOS", "1,2,4").split(",")]

    def run(n, seed: int = 0):
        sys_ = SLAMSystem(config=dict(
            warmup=8, buffer=256, infill_chunk_size=16, backend_iters=4,
            corr_mode=corr_mode,
            filter_thresh=float("inf"), keyframe_stride=3,
        ))
        return sys_.run(bench.synth_stream(n, seed=seed))

    def run_batch(n, n_videos):
        if n_videos == 1:
            return [run(n)]
        return run_interleaved(
            [functools.partial(run, n, seed=v) for v in range(n_videos)],
            workers=n_videos,
        )

    for n_videos in widths:
        try:
            t_c0 = time.perf_counter()
            run_batch(n_frames, n_videos)  # warm: identical workload
            warm_s = time.perf_counter() - t_c0
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                outs = run_batch(n_frames, n_videos)
                dt = time.perf_counter() - t0
                assert all(o.trajectory.shape[0] == n_frames for o in outs)
                best = dt if best is None else min(best, dt)
            fps = n_frames * n_videos / best
            print(json.dumps({
                "corr_mode": corr_mode, "pallas": pallas, "videos": n_videos,
                "fps": round(fps, 2), "wall_s": round(best, 2),
                "warm_s": round(warm_s, 1),
                "per_video_fps": round(fps / n_videos, 2),
            }), flush=True)
        except Exception as e:  # keep sweeping past OOMs
            print(json.dumps({
                "corr_mode": corr_mode, "pallas": pallas, "videos": n_videos,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
