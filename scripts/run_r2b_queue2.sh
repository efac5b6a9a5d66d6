#!/bin/bash
# Revised remainder of the round-2 queue (swapped in at a config boundary):
# the TCF resolution study (96^3 point only — 64^3 statistics are already
# recorded in VALIDATION.md round 1) is promoted above the long tail so
# VERDICT round-1 weak #9/#10 gets its measurement inside the round budget.
# Every generator call skips configs whose datasets already exist.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r2b_queue.log}
GEN="python -u scripts/generate_datasets.py"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}
meas() {
  local flag="/tmp/$1.done"; shift
  if [ ! -e "$flag" ]; then
    echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
    timeout "${T:-2700}" "$@" >> "$LOG" 2>&1 && touch "$flag" \
      || echo "!!! FAILED: $*" >> "$LOG"
  fi
}

# ---- tier 1 remainder (skip-if-done) ----------------------------------------
run RBC3D-easy-v0          --lanes 6 --n-domains 2 --episode-steps 100
run CylinderJet3D-easy-v0  --lanes 3 --n-domains 3
run TCFSmall3D-bottom-easy-v0 --lanes 3 --n-domains 3 --episode-steps 100
run Airfoil3D-easy-v0      --lanes 3 --n-domains 3 --episode-steps 100

# ---- tier 2: 2D hard tiers ----------------------------------------------------
run CylinderJet2D-hard-v0  --lanes 3 --transient-steps 999999 --transient-split 8
run Airfoil2D-hard-v0      --lanes 5

# ---- TCF resolution study: the 96^3 convergence point ------------------------
T=7200 meas tcf_resolution python -u scripts/tcf_resolution_study.py 96

# ---- tier 3: remaining RBC3D tiers --------------------------------------------
run RBC3D-medium-v0        --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-hard-v0          --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-easy-v0     --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-medium-v0   --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-hard-v0     --lanes 3 --n-domains 1 --episode-steps 100

# ---- tier 4: 3D medium tiers ----------------------------------------------------
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60
run Airfoil3D-medium-v0    --lanes 2 --n-domains 2 --episode-steps 60

# ---- tier 5: heavy tiers + measurements -----------------------------------------
run TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-easy-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40
meas rbc_scaling     python -u scripts/rbc_scaling.py
meas solve_breakdown python -u scripts/solve_breakdown.py
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30

echo "=== R2B QUEUE2 DONE $(date) ===" >> "$LOG"
