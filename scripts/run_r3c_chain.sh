#!/bin/bash
# Round-3 post-queue TPU chain: waits for the dataset queue (run_r3_queue.sh,
# pid in /tmp/queue.pid) and its chaser (run_r3b_queue.sh, pid in
# /tmp/r3b.pid) to release the single-tenant TPU, then:
#   1. validates the upper-difficulty tiers from their fresh bundled datasets
#      (VERDICT r2 "Next round" item #3),
#   2. records a SAC control result (completing the reference's RL-baseline
#      roster next to the recorded PPO/MA-PPO/DPC results),
#   3. re-runs bench.py so BENCH-family rows see the new datasets.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3c_chain.log}

wait_pid_file() {
  [ -f "$1" ] || return 0
  local pid
  pid=$(cat "$1")
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/queue.pid
wait_pid_file /tmp/r3b.pid
sleep 90   # let a killed holder's stale TPU grant clear

step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

# 1. upper-tier physics validation (each tier separately so one failure
#    doesn't sink the rest; validator skips ids without bundled data)
V="python -u scripts/validate_upper_tiers.py"
STEP_TIMEOUT=9000 step $V TCFSmall3D-bottom-medium-v0
STEP_TIMEOUT=9000 step $V TCFSmall3D-bottom-hard-v0
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40
STEP_TIMEOUT=7200 step $V CylinderJet3D-hard-v0 --steps 30
STEP_TIMEOUT=7200 step $V Airfoil3D-easy-v0 --steps 30

# 2. recorded SAC control run (RBC2D-easy, same benchmark config as PPO/DPC)
mkdir -p bench_assets/control
STEP_TIMEOUT=3600 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 16 --iters 80 --minutes 30
# persist the result line (the trainer prints one JSON object last)
grep -h '"algo": "SAC"' "$LOG" | tail -1 > bench_assets/control/sac_rbc2d_easy.json || true

# 3. refresh the bench so the per-family rows see the new datasets
STEP_TIMEOUT=3600 step python -u bench.py

echo "=== R3C CHAIN DONE $(date) ===" >> "$LOG"
