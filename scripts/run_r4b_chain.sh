#!/bin/bash
# Round-4 phase-2 chain: runs AFTER run_r4_chain.sh (pass its shell pid as
# $1, or it starts immediately).  Contains the TD-MPC baseline run (the
# sixth algorithm of the reference's set) and any high-value steps that
# phase 1 may have missed; every step is resumable/skip-existing.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r4b_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r4b_chain_latest.log

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  sleep 60
fi
echo $$ > /tmp/r4.pid

step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout -k 30 "${STEP_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/tpu_step.pid
  (
    local last=-1 quiet=0 size
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$size" = "$last" ]; then quiet=$((quiet + 60)); else quiet=0; fi
      last=$size
      if [ "$quiet" -ge 900 ]; then
        echo "!!! STALL WATCHDOG: no log output for ${quiet}s, killing step" >> "$LOG"
        kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
        kill "$pid" $kids 2>/dev/null
        sleep 10
        kill -9 "$pid" $kids 2>/dev/null
        break
      fi
    done
  ) &
  local mon=$!
  wait "$pid" || echo "!!! FAILED: $*" >> "$LOG"
  kill "$mon" 2>/dev/null
  rm -f /tmp/tpu_step.pid
}

mkdir -p bench_assets/control

grab() {
  local out
  out=$(grep -h "$1" "$LOG" | tail -1)
  [ -n "$out" ] && echo "$out" > "$2"
}

# 1. TD-MPC baseline on RBC2D-easy (the last missing algorithm artifact)
STEP_TIMEOUT=5400 step python -u scripts/train_tdmpc_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 32 --iters 200 --minutes 45
grab '"algo": "TD-MPC"' bench_assets/control/tdmpc_rbc2d_easy.json

# 2. merged-frame XLA solve A/B on the airfoil (round-4 perf work; flips
#    block_merge._XLA_MODE default if it wins)
STEP_TIMEOUT=3600 step python -u scripts/merged_xla_ab.py Airfoil2D-easy-v0
grab '"merged_xla_speedup"' bench_assets/control/merged_xla_ab.json

echo "=== $(date +%H:%M:%S) r4b chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
