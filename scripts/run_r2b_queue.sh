#!/bin/bash
# Round-2 continuation queue: remaining dataset configs and measurements.
# Single-tenant TPU: one process at a time; every generator call is
# resumable (skips finished snapshots/episodes) so the queue can be re-run.
#
# Dataset sizing: the 3D burn-ins are HBM-bound (total time scales with
# lane-steps, not chunking), so 3D configs ship REDUCED datasets —
# 1-3 domains per mode instead of the reference's 10 — trading depth for
# covering every env id within the round's TPU budget.  `env.init()`
# extends any of them to 10 later (resumable, skip-existing).
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
meas() {  # one-shot measurement, marked done via /tmp flag
  local flag="/tmp/$1.done"; shift
  if [ ! -e "$flag" ]; then
    echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
    timeout "${T:-2700}" "$@" >> "$LOG" 2>&1 && touch "$flag" \
      || echo "!!! FAILED: $*" >> "$LOG"
  fi
}

# ---- tier 1: one config per family first (maximum id coverage early) -------
run RBC3D-easy-v0          --lanes 6 --n-domains 2 --episode-steps 100
run CylinderJet3D-easy-v0  --lanes 3 --n-domains 3
run TCFSmall3D-bottom-easy-v0 --lanes 3 --n-domains 3 --episode-steps 100
run Airfoil3D-easy-v0      --lanes 3 --n-domains 3 --episode-steps 100

# ---- tier 2: 2D hard tiers (upwind-blended advection; split-step burn-in
#      mitigations from the earlier session's crash notes) -------------------
run CylinderJet2D-hard-v0  --lanes 3 --transient-steps 999999 --transient-split 8
run Airfoil2D-hard-v0      --lanes 5

# ---- tier 3: remaining RBC3D tiers ------------------------------------------
run RBC3D-medium-v0        --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-hard-v0          --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-easy-v0     --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-medium-v0   --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-hard-v0     --lanes 3 --n-domains 1 --episode-steps 100

# ---- tier 4: 3D medium tiers -------------------------------------------------
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60
run Airfoil3D-medium-v0    --lanes 2 --n-domains 2 --episode-steps 60

# ---- queued one-shot measurements -------------------------------------------
meas rbc_scaling     python -u scripts/rbc_scaling.py
meas solve_breakdown python -u scripts/solve_breakdown.py

# ---- tier 5: heavy tiers ------------------------------------------------------
run TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-easy-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40
T=10800 meas tcf_resolution python -u scripts/tcf_resolution_study.py
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30

echo "=== R2B QUEUE DONE $(date) ===" >> "$LOG"
