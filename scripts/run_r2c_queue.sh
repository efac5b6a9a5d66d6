#!/bin/bash
# Round-2 continuation queue (post-restart).  The machine restart wiped the
# user data dir (/root/.cache/fluidgym_tpu), so the airfoil_2D_Re3000 dataset
# -- whose 30 snapshots are bundled but whose episodes/statistics were lost
# mid-generation -- is seeded back from the bundle before resuming.  Order is
# cheapest/highest-coverage first; the TCFLarge 128-cubed tail runs last.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r2c_queue.log}
GEN="python -u scripts/generate_datasets.py"
USERDIR=/root/.cache/fluidgym_tpu/initial_domains

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

# 1. finish Airfoil2D-medium: snapshots are bundled, episodes+stats missing
mkdir -p "$USERDIR/airfoil_2D_Re3000"
cp -n fluidgym_tpu/data/initial_domains/airfoil_2D_Re3000/* \
      "$USERDIR/airfoil_2D_Re3000/" 2>/dev/null || true
run Airfoil2D-medium-v0 --lanes 5 --transient-steps 999999 --transient-split 4

# 2. RBC3D-wide tiers (NH16; the NH8 runs were quick)
run RBC3D-wide-easy-v0   --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-medium-v0 --lanes 3 --n-domains 1 --episode-steps 100
run RBC3D-wide-hard-v0   --lanes 3 --n-domains 1 --episode-steps 100

# 3. TCFSmall Re330 covers both-medium + bottom-medium
run TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 --episode-steps 60

# 4. cylinder/airfoil 3D medium+easy (split-step: TPU per-call watchdog)
run CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-easy-v0 --lanes 2 --n-domains 3 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4

# 5. 2D hard tier
run Airfoil2D-hard-v0 --lanes 5 --transient-steps 999999 --transient-split 4

# 6. TCFSmall Re550 covers both-hard + bottom-hard
run TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60

# 7. remaining 3D medium/hard
run Airfoil3D-medium-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4
run CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4
run Airfoil3D-hard-v0 --lanes 1 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4

# 8. heavy tail: TCFLarge 128^3 tiers (each covers both+bottom ids)
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-easy-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-medium-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30
STEP_TIMEOUT=10800 run TCFLarge3D-bottom-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 30

echo "=== R2C QUEUE DONE $(date) ===" >> "$LOG"
