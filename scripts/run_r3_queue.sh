#!/bin/bash
# Round-3 dataset queue: the 19 ids still missing bundled datasets
# (VERDICT r2 missing #1), cheapest/highest-coverage first, plus the
# advisor-flagged Airfoil2D-medium episode repair (screening + re-pooled
# statistics now live in generate_datasets.py / FluidEnv).
#
# Each TCF op point covers BOTH the -bottom and -both ids (shared dataset);
# sizing follows the documented reduced-3D policy (docs/data.md) --
# env.init()/generate_datasets.py are resumable, so later rounds extend
# these in place.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3_queue.log}
GEN="python -u scripts/generate_datasets.py"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

# 0. advisor repair: screen + repair the contaminated Re3000 episodes and
#    re-pool statistics with non-converged/outlier rows excluded
STEP_TIMEOUT=9000 run Airfoil2D-medium-v0 --lanes 5 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4

# 1. RBC3D-wide tiers (NH16)
run RBC3D-wide-easy-v0   --lanes 3 --n-domains 2 --episode-steps 100
run RBC3D-wide-medium-v0 --lanes 3 --n-domains 2 --episode-steps 100
run RBC3D-wide-hard-v0   --lanes 3 --n-domains 2 --episode-steps 100

# 2. TCFSmall Re330/Re550 (each covers bottom+both)
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60
run TCFSmall3D-bottom-hard-v0   --lanes 2 --n-domains 2 --episode-steps 60

# 3. 3D cylinder medium (split-step burn-in: TPU per-call watchdog)
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4

# 4. 2D airfoil hard tier
STEP_TIMEOUT=9000 run Airfoil2D-hard-v0 --lanes 5 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4

# 5. 3D airfoil (easy first; watchdog-safe split steps)
run Airfoil3D-easy-v0   --lanes 2 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-medium-v0 --lanes 1 --n-domains 2 --episode-steps 40 \
    --transient-steps 999999 --transient-split 4

# 6. remaining 3D hard tiers
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 1 --episode-steps 40 \
    --transient-steps 999999 --transient-split 8

# 7. heavy tail: TCFLarge 128x65x128 (each covers bottom+both)
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-easy-v0   --lanes 1 --n-domains 2 \
    --episode-steps 40
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-hard-v0   --lanes 1 --n-domains 1 \
    --episode-steps 30

# 8. opportunistic: extend reduced 3D datasets toward >=5 snapshots/mode
#    (resumable; skip-existing makes these cheap no-ops if already there)
run RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100
run RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100
run RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100
run CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4

echo "=== R3 QUEUE DONE $(date) ===" >> "$LOG"
