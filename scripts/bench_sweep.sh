#!/bin/bash
# Sequential hardware A/B sweep. Appends one line per config to the log.
# Usage: bench_sweep.sh <logfile> [config ...]
# Each config is a comma-separated KEY=VAL list applied as env vars.
LOG="$1"; shift
for cfg in "$@"; do
  echo "=== $cfg $(date +%H:%M:%S)" >> "$LOG"
  env $(echo "$cfg" | tr ',' ' ') python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "SWEEP DONE $(date +%H:%M:%S)" >> "$LOG"
