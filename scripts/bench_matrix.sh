#!/bin/bash
# Hardware measurement matrix (run on the TPU tunnel; sequential — the box
# has ONE host core and the axon remote-compile path has no persistent
# cache, so every step re-pays its cold compiles ~8-12 min).
#
#   bash scripts/bench_matrix.sh [logfile]
#
# Steps, in value order: full (full annotation pipeline — the north-star
# metric), triple (default bench: stride single + x2 aggregate + MFU +
# real-mode headline, one process), volume3 + volume4 (volume-mode
# interleave past the old 2-video OOM ceiling — in-jit corr slicing),
# realknobs (one-process real-mode A/B: prox-spec off / per-frame uploads /
# baseline), pano1 (panorama camera path).  Each step prints JSON lines;
# compare within ONE day's log only — the shared tunnel swings 2x
# day-to-day.
cd "$(dirname "$0")/.." || exit 1
log=${1:-/tmp/bench_matrix.log}
: > "$log"
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> "$log"
  timeout "$to" env "$@" python bench.py >> "$log" 2>&1
  echo "=== $name rc=$? end $(date +%T) ===" >> "$log"
}
run full      4800 BENCH_PIPELINE=full BENCH_REPS=2 BENCH_VIDEOS=1
run triple    2400
run volume3   1200 BENCH_VIDEOS=3
run volume4   1200 BENCH_VIDEOS=4
# int8 quantized volumes: ~half the edge-state HBM (ops/corr.QVol) — the
# production ≥3-video batch shape without alt-mode's recompute cost
run i8x3      1200 BENCH_VIDEOS=3 BENCH_CORR_DTYPE=int8
run i8x4      1200 BENCH_VIDEOS=4 BENCH_CORR_DTYPE=int8
run realknobs 2400 BENCH_AB=real_knobs
run pano1     1200 BENCH_CAMERA=panorama BENCH_VIDEOS=1
echo "=== MATRIX DONE $(date +%T) ===" >> "$log"
