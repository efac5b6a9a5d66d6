#!/bin/bash
# Round-3 chaser queue: waits for the live run_r3_queue.sh process (its pid
# is in /tmp/queue.pid) to finish, then re-runs the one item that failed so
# far -- the advisor-flagged Airfoil2D-medium episode repair.  5 concurrent
# 90k-cell airfoil lanes tripped the TPU per-call watchdog mid-episode
# (/tmp/r3_queue.log 13:29 "!!! FAILED"), so the retry uses 2 lanes.
# The generator is resumable and skips existing snapshots, so this is cheap
# if the screening already repaired part of the set.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3b_queue.log}
GEN="python -u scripts/generate_datasets.py"

# wait for the primary queue to release the (single-tenant) TPU
if [ -f /tmp/queue.pid ]; then
  QPID=$(cat /tmp/queue.pid)
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" $GEN "$@" --bundle >> "$LOG" 2>&1 \
    || echo "!!! FAILED: $*" >> "$LOG"
}

# Airfoil2D-medium episode repair retry (watchdog-safe: 2 lanes)
STEP_TIMEOUT=9000 run Airfoil2D-medium-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4

# re-run any items the primary queue marked FAILED (resumable + skip-existing
# makes re-runs cheap); lanes halved via the generator's own defaults is not
# possible generically, so just repeat the line with --lanes clamped to 2.
grep '^!!! FAILED:' /tmp/r3_queue.log 2>/dev/null | sed 's/^!!! FAILED: //' | \
while read -r line; do
  case "$line" in
    Airfoil2D-medium-v0*) continue ;;  # handled above
  esac
  retry=$(echo "$line" | sed -E 's/--lanes [0-9]+/--lanes 2/')
  STEP_TIMEOUT=9000 run $retry
done

echo "=== R3B CHASER DONE $(date) ===" >> "$LOG"
