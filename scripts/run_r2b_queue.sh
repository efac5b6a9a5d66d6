#!/bin/bash
# Round-2 continuation queue: the dataset configs and measurements that the
# earlier round-2 session queued (phases B/C/D of run_dataset_queue.sh +
# run_phase_d.sh) but whose runs were lost with that machine's /tmp.
# Single-tenant TPU: exactly one process at a time; every generator call is
# resumable (skips finished snapshots/episodes) so the queue can be re-run.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r2b_queue.log}
GEN="python -u scripts/generate_datasets.py"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-7200}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
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

# ---- pending hardware A/B of the merged BiCGStab advection kernel ----------
# (off by default until this validates lowering and wins end-to-end; if it
# wins, flip the default and the round bench inherits the gain)
T=3600 meas fused_bicg_ab python -u scripts/fused_bicg_ab.py

# ---- phase B: 3D moderate --------------------------------------------------
run RBC3D-easy-v0          --lanes 10
run RBC3D-medium-v0        --lanes 10
run RBC3D-hard-v0          --lanes 10
run RBC3D-wide-easy-v0     --lanes 6
run RBC3D-wide-medium-v0   --lanes 6
run RBC3D-wide-hard-v0     --lanes 6
run CylinderJet3D-easy-v0  --lanes 3 --n-domains 3
run Airfoil3D-easy-v0      --lanes 3 --n-domains 3 --episode-steps 100

# ---- 2D hard tiers (upwind-blended advection; prior session's crash
#      mitigations: whole-burn-in split-step path, small lane counts) --------
run CylinderJet2D-hard-v0  --lanes 3 --transient-steps 999999 --transient-split 8
run Airfoil2D-hard-v0      --lanes 5

# ---- phase C: TCF + 3D medium (bottom/both share domain datasets) ----------
run TCFSmall3D-bottom-easy-v0 --lanes 3 --n-domains 3 --episode-steps 100
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2
run Airfoil3D-medium-v0    --lanes 2 --n-domains 2 --episode-steps 100
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60

# ---- queued one-shot measurements (phase D head) ----------------------------
meas rbc_scaling     python -u scripts/rbc_scaling.py
meas solve_breakdown python -u scripts/solve_breakdown.py

# ---- phase D: heavy tiers ----------------------------------------------------
run TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60
T=10800 meas tcf_resolution python -u scripts/tcf_resolution_study.py
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-easy-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=14400 run TCFLarge3D-bottom-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30

echo "=== R2B QUEUE DONE $(date) ===" >> "$LOG"
