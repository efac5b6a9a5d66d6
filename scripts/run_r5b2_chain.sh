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
LOG=${LOG:-/tmp/r5b2_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r5b2_chain_latest.log
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
      if [ "$quiet" -ge 450 ]; then
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

# dataset long tail, cheapest-first (maximize landed ids; every TCF gen
# covers its -both sibling via the shared initial_domain_id)
STEP_TIMEOUT=5400 step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=2700 step $V CylinderJet3D-medium-v0 --steps 200
grab '"env_id": "CylinderJet3D-medium-v0"' \
    bench_assets/validation/cyljet3d_medium.json
STEP_TIMEOUT=7200 step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=9000 step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=2700 step $V Airfoil3D-easy-v0 --steps 200
grab '"env_id": "Airfoil3D-easy-v0"' bench_assets/validation/airfoil3d_easy.json
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=2700 step $V Airfoil2D-hard-v0 --steps 200
grab '"env_id": "Airfoil2D-hard-v0"' bench_assets/validation/airfoil2d_hard.json
STEP_TIMEOUT=9000 step $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle
STEP_TIMEOUT=2700 step $V TCFLarge3D-bottom-easy-v0 --burnin 100 --n-stat 250
grab '"env_id": "TCFLarge3D-bottom-easy-v0"' \
    bench_assets/validation/tcflarge_re180.json
STEP_TIMEOUT=9000 step $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=9000 step $GEN Airfoil3D-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 40 --transient-steps 999999 --transient-split 8 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-medium-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-hard-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle

# cylinder RL retry with the round-4 diagnosis applied (VERDICT #5)
STEP_TIMEOUT=2700 step python -u scripts/train_ppo_tpu.py \
    --env-id CylinderJet2D-easy-v0 --n-envs 32 --iters 600 --minutes 35 \
    --init-log-std -2.3 --ent-coef 0.0
grab '"algo": "PPO"' bench_assets/control/ppo_cylinder_retry.json

# hard-tier blend bias bound (VERDICT #8)
STEP_TIMEOUT=4500 step python -u scripts/hard_stability_probe.py \
    central upwind03 --res 48 --steps 400
grab '"variant": "upwind03"' bench_assets/validation/blend_bias_res48.json

# snapshot-count extension for the thin 3D dirs (reference ships 10)
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle

echo "=== $(date +%H:%M:%S) r5-B2 chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
