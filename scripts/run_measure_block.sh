#!/bin/bash
# Round-2 TPU measurement block: bench validation, batch-scaling curve,
# 3D multigrid A/B, shedding spectrum -- then resume the dataset queue.
# Single-tenant TPU: strictly sequential, each step bounded.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/measure_block.log}
step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-2400}" "$@" >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}
STEP_TIMEOUT=7200 step python -u bench.py
step python -u scripts/batch_curve.py
step python -u scripts/mg_3d_ab.py
step python -u scripts/shedding_spectrum.py
echo "=== MEASURE BLOCK DONE $(date) ===" >> "$LOG"
exec bash scripts/run_dataset_queue.sh
