#!/bin/bash
# Hardware measurement matrix (run on the TPU tunnel; sequential — the box
# has ONE host core and the axon remote-compile path has no persistent
# cache, so every step re-pays its cold compiles ~8-12 min).
#
#   bash scripts/bench_matrix.sh [logfile]
#
# Steps, in value order: volume baseline (same-day tunnel reference),
# corr_mode=alt, 4-video interleave (the production batch shape), real-mode
# keyframing, Pallas fused corr, full annotation pipeline.  Each prints one
# JSON line; compare within ONE day's log only — the shared tunnel swings
# 2x day-to-day.
cd "$(dirname "$0")/.." || exit 1
log=${1:-/tmp/bench_matrix.log}
: > "$log"
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> "$log"
  timeout "$to" env "$@" python bench.py >> "$log" 2>&1
  echo "=== $name rc=$? end $(date +%T) ===" >> "$log"
}
run volume1 900  BENCH_VIDEOS=1
run volume2 900  BENCH_VIDEOS=2
run alt1    1500 BENCH_CORR_MODE=alt BENCH_VIDEOS=1
run alt4    1500 BENCH_CORR_MODE=alt BENCH_VIDEOS=4
run real1   900  BENCH_MODE=real BENCH_VIDEOS=1
run alt1p   900  BENCH_CORR_MODE=alt VIPE_PALLAS=1 BENCH_VIDEOS=1
run full    1800 BENCH_PIPELINE=full BENCH_REPS=1 BENCH_VIDEOS=1
echo "=== MATRIX DONE $(date +%T) ===" >> "$log"
