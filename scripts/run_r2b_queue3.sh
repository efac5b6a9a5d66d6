#!/bin/bash
# Remainder queue (relaunched after the RL/DPC demo window).  Includes the
# Airfoil3D-easy RETRY through the split-step path: its whole-env-step
# burn-in call exceeded the ~2 min TPU per-call watchdog and crashed the
# worker (UNAVAILABLE), same failure mode the earlier session hit on
# airfoil medium/hard.  Split-step burn-ins issue short device calls.
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

# skip-if-done guards for everything already bundled
run CylinderJet2D-hard-v0  --lanes 3 --transient-steps 999999 --transient-split 8
run Airfoil2D-hard-v0      --lanes 5 --transient-steps 999999 --transient-split 4
run Airfoil3D-easy-v0      --lanes 2 --n-domains 3 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4

# TCF resolution study: the 96^3 convergence point
T=7200 meas tcf_resolution python -u scripts/tcf_resolution_study.py 96

# remaining RBC3D tiers
run RBC3D-medium-v0        --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-hard-v0          --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-easy-v0     --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-medium-v0   --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-hard-v0     --lanes 3 --n-domains 1 --episode-steps 100

# 3D medium tiers (split-step for the watchdog-prone airfoil/cylinder)
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60
run Airfoil3D-medium-v0    --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4

# heavy tail
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

echo "=== R2B QUEUE3 DONE $(date) ===" >> "$LOG"
