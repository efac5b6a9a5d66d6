#!/bin/bash
# Round-2 follow-up block: merged-CG A/B + MB-enabled bench measurement,
# then resume the (resumable) dataset queue and phase D.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/followup_r2.log}
step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1 || echo "!!! FAILED: $*" >> "$LOG"
}
T=3600 step python -u scripts/merged_cg_ab.py
T=7200 step env FLUIDGYM_TPU_FUSED_CG_MB=1 python -u bench.py
echo "=== FOLLOWUP MEASUREMENTS DONE $(date) ===" >> "$LOG"
bash scripts/run_dataset_queue.sh
bash scripts/run_phase_d.sh
