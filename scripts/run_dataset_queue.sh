#!/bin/bash
# Sequential initial-domain dataset generation on the TPU (single-tenant:
# one process at a time).  Each config resumes from partial output, so the
# queue can be re-run after interruption.  Cheap 2D configs first.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/dataset_queue.log}
GEN="python -u scripts/generate_datasets.py"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-7200}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

# ---- phase 0: one-shot measurements queued ahead of dataset work ----------
if [ ! -e /tmp/merged_ab_airfoil.done ]; then
  echo "=== $(date +%H:%M:%S) merged_cg_ab (airfoil rows) ===" >> "$LOG"
  timeout 3600 python -u scripts/merged_cg_ab.py >> "$LOG" 2>&1 \
    && touch /tmp/merged_ab_airfoil.done \
    || echo "!!! FAILED: merged_cg_ab airfoil" >> "$LOG"
fi
if [ ! -e /tmp/batch_curve_chunked.done ]; then
  echo "=== $(date +%H:%M:%S) batch_curve (chunked) ===" >> "$LOG"
  timeout 2400 python -u scripts/batch_curve.py >> "$LOG" 2>&1 \
    && touch /tmp/batch_curve_chunked.done \
    || echo "!!! FAILED: batch_curve chunked" >> "$LOG"
fi

# ---- phase A: 2D (RBC restart=True -> 30 lockstep lanes; others 10) -------
run RBC2D-medium-v0        --lanes 30
run RBC2D-hard-v0          --lanes 30
run RBC2D-wide-easy-v0     --lanes 30
run RBC2D-wide-medium-v0   --lanes 30
run RBC2D-wide-hard-v0     --lanes 30
run CylinderJet2D-medium-v0 --lanes 10
# res-48: one impulsive-transient vmapped step can trip the ~2 min TPU
# per-call watchdog (crashed 3x, even with split 4): run the WHOLE burn-in
# through the split-step path with short calls and fewer lanes
run CylinderJet2D-hard-v0   --lanes 3 --transient-steps 999999 --transient-split 8
run Airfoil2D-easy-v0      --lanes 10
# airfoil medium/hard: stage-2 episode steps crashed the worker at 10 lanes
# (one vmapped env step per call; Re>=3000 adaptive CFL); halve the call size
run Airfoil2D-medium-v0    --lanes 5
# airfoil-hard moved to phase D: 3D easy/medium coverage and the TCF
# resolution study outrank a hard-tier 2D config for round-2 runtime

# ---- phase B: 3D moderate --------------------------------------------------
run RBC3D-easy-v0          --lanes 10
run RBC3D-medium-v0        --lanes 10
run RBC3D-hard-v0          --lanes 10
run RBC3D-wide-easy-v0     --lanes 6
run RBC3D-wide-medium-v0   --lanes 6
run RBC3D-wide-hard-v0     --lanes 6
run CylinderJet3D-easy-v0  --lanes 3 --n-domains 3
run Airfoil3D-easy-v0      --lanes 3 --n-domains 3 --episode-steps 100

# ---- phase C: TCF (burn-ins measured in ETT; bottom/both share domains) ----
run TCFSmall3D-bottom-easy-v0 --lanes 3 --n-domains 3 --episode-steps 100
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2
run Airfoil3D-medium-v0    --lanes 2 --n-domains 2 --episode-steps 100
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60

# ---- TCF resolution study (VERDICT round-1 #10) ahead of hard tiers -------
if [ ! -e /tmp/tcf_resolution.done ]; then
  echo "=== $(date +%H:%M:%S) tcf_resolution_study ===" >> "$LOG"
  timeout 10800 python -u scripts/tcf_resolution_study.py >> "$LOG" 2>&1 \
    && touch /tmp/tcf_resolution.done \
    || echo "!!! FAILED: tcf_resolution_study" >> "$LOG"
fi
echo "=== QUEUE DONE $(date) ===" >> "$LOG"
