#!/bin/bash
# Phase D: heavy-tier initial-domain datasets + TCF resolution study.
# Chained after the running dataset queue: pass QPID=<pid of the running
# run_dataset_queue.sh shell> and this script waits for it to exit before
# touching the (single-tenant) TPU.
#
# Watchdog-prone configs (adaptive CFL at hard-tier Reynolds numbers can
# push one device call past the ~2 min TPU per-call watchdog) run their
# WHOLE burn-in through the split-step path (--transient-steps 999999).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/dataset_queue.log}
GEN="python -u scripts/generate_datasets.py"

if [ -n "${QPID:-}" ]; then
  echo "=== phase D waiting on queue pid $QPID ===" >> "$LOG"
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) PHASE D START ===" >> "$LOG"

if [ ! -e /tmp/extrap_ab.done ]; then
  echo "=== $(date +%H:%M:%S) extrap_ab ===" >> "$LOG"
  timeout 2700 python -u scripts/extrap_ab.py >> "$LOG" 2>&1 \
    && touch /tmp/extrap_ab.done \
    || echo "!!! FAILED: extrap_ab" >> "$LOG"
fi
if [ ! -e /tmp/rbc_scaling.done ]; then
  echo "=== $(date +%H:%M:%S) rbc_scaling ===" >> "$LOG"
  timeout 2700 python -u scripts/rbc_scaling.py >> "$LOG" 2>&1 \
    && touch /tmp/rbc_scaling.done \
    || echo "!!! FAILED: rbc_scaling" >> "$LOG"
fi
if [ ! -e /tmp/solve_breakdown.done ]; then
  echo "=== $(date +%H:%M:%S) solve_breakdown ===" >> "$LOG"
  timeout 2700 python -u scripts/solve_breakdown.py >> "$LOG" 2>&1 \
    && touch /tmp/solve_breakdown.done \
    || echo "!!! FAILED: solve_breakdown" >> "$LOG"
fi

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-7200}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

run Airfoil2D-hard-v0 --lanes 5
# retry: crashed the TPU worker twice mid-burn-in with whole-env-step calls
run CylinderJet2D-hard-v0 --lanes 3 --transient-steps 999999 --transient-split 4
run TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-easy-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30

echo "=== $(date +%H:%M:%S) phase D datasets done; TCF resolution study ===" >> "$LOG"
timeout 10800 python -u scripts/tcf_resolution_study.py >> "$LOG" 2>&1 \
  || echo "!!! FAILED: tcf_resolution_study" >> "$LOG"
echo "=== PHASE D DONE $(date) ===" >> "$LOG"
