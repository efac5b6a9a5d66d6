#!/bin/bash
# Round-5 MAIN chain: datasets first (VERDICT r4 next-round #1), each tier
# validated as it lands (#2), with the recorded-control and bench-variance
# steps (#4, #7, #9) between the cheap and expensive dataset halves and the
# lowest-priority retries (#5, #8) at the end where the DEADLINE cut can
# only cost the least-ranked work.
#
# Launched AFTER scripts/mg_3d_ab.py decided whether the 3D tiers ride the
# aggregation coarse preconditioner (run_r5_chain.sh step 0b, run manually
# this round so the default flip can land between A/B and generation).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export FLUIDGYM_HB_GRACE=4500
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r5b1_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r5b1_chain_latest.log
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"
# REQUIRED: set DEADLINE to this session's chip handoff epoch before launch.
DEADLINE=${DEADLINE:?set DEADLINE=<epoch seconds>}

echo $$ > /tmp/r4.pid   # bench.py yields the chip via this pid file

step() {
  local now remaining cap
  now=$(date +%s)
  remaining=$((DEADLINE - now))
  if [ "$remaining" -le 300 ]; then
    echo "=== $(date +%H:%M:%S) DEADLINE: skipping $* ===" >> "$LOG"
    return
  fi
  cap=${STEP_TIMEOUT:-5400}
  [ "$cap" -gt "$remaining" ] && cap=$remaining
  echo "=== $(date +%H:%M:%S) [cap ${cap}s] $* ===" >> "$LOG"
  timeout -k 30 "$cap" "$@" >> "$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/tpu_step.pid
  (
    local last=-1 quiet=0 size
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$size" = "$last" ]; then quiet=$((quiet + 60)); else quiet=0; fi
      last=$size
      if [ "$quiet" -ge 1500 ]; then
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

mkdir -p bench_assets/control bench_assets/validation

grab() {
  local out
  out=$(grep -h "$1" "$LOG" | tail -1)
  [ -n "$out" ] && echo "$out" > "$2"
}

# 0. seed the user data dir from the repo bundle (fresh VMs wipe it)
USER_DATA=$(python -c "from fluidgym_tpu.config import config; print(config.data_path)")
mkdir -p "$USER_DATA/initial_domains"
cp -rn fluidgym_tpu/data/initial_domains/. "$USER_DATA/initial_domains/" 2>>"$LOG"

# 1. Airfoil2D-medium regeneration under the Re-gated upwind blend
#    (on-chip probe confirmed blend=0.3 removes the negative-drag bursts)
STEP_TIMEOUT=12600 step $GEN Airfoil2D-medium-v0 --n-domains 2 --lanes 6 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=900 step python -u scripts/repool_statistics.py --apply

# 2. TCFSmall Re550 dataset + validation (never stepped in any artifact)
STEP_TIMEOUT=7200 step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 \
    --n-domains 2 --episode-steps 60 --bundle
STEP_TIMEOUT=3600 step $V TCFSmall3D-bottom-hard-v0 --burnin 150 --n-stat 400
grab '"env_id": "TCFSmall3D-bottom-hard-v0"' \
    bench_assets/validation/tcf_re550.json

# 3. First TCF control result: classical opposition control (VERDICT #4)
STEP_TIMEOUT=3600 step python -u scripts/opposition_control_tpu.py \
    --steps 150 --settle 40 --gains 1.0 0.5
grab '"controller"' bench_assets/control/opposition_tcf.json

# 4. SAC with the long budget it needs (round-4 chain never reached it)
STEP_TIMEOUT=2700 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 600 --minutes 35
grab '"algo": "SAC"' bench_assets/control/sac_rbc2d_easy.json

# 5. flagship bench variance (VERDICT #9): two back-to-back runs
STEP_TIMEOUT=1500 step python -u bench.py
STEP_TIMEOUT=1500 step python -u bench.py
grep -h '"metric"' "$LOG" | tail -2 > bench_assets/validation/bench_variance.jsonl

echo "=== $(date +%H:%M:%S) r5-B1 chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
