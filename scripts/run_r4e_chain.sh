#!/bin/bash
# Round-4 chain, take 4 (fresh VM after the r4d session died mid-repair).
# Differences from run_r4d_chain.sh:
#   * Step 0 seeds the user data dir (/root/.cache/fluidgym_tpu) from the
#     repo bundle: the VM restart wiped it, and without the seed the
#     repair step would regenerate every snapshot from scratch instead of
#     repairing the two contaminated episodes.
#   * The repair step passes --n-domains 2 so stage 1 is a no-op and the
#     advisor-HIGH Airfoil2D-medium decontamination is the FIRST device
#     work; generate_datasets.py now also bundles immediately after the
#     post-repair pooling, so even a cap kill ships the fix.
#   * The merged-XLA A/B is gone (decided: 0.69x, routing stays off).
#   * No retry-grep pass (round-3 advisor: it matched stale FAILED lines
#     from earlier chains sharing the log).  Every step is resumable; a
#     rerun of this script is always safe.
#   * DEADLINE is this session's: no step starts after it, caps shrink to
#     the remaining window, chip is free for the driver's bench run.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r4e_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r4e_chain_latest.log
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"
DEADLINE=${DEADLINE:-1787279700}   # ~02:35 local; driver bench needs the chip

echo $$ > /tmp/r4.pid

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

mkdir -p bench_assets/control bench_assets/validation

grab() {
  local out
  out=$(grep -h "$1" "$LOG" | tail -1)
  [ -n "$out" ] && echo "$out" > "$2"
}

# 0. seed the user data dir from the repo bundle (VM restart wiped it)
USER_DATA=$(python -c "from fluidgym_tpu.config import config; print(config.data_path)")
mkdir -p "$USER_DATA/initial_domains"
cp -rn fluidgym_tpu/data/initial_domains/. "$USER_DATA/initial_domains/" 2>>"$LOG"
echo "=== seeded $USER_DATA/initial_domains from bundle ===" >> "$LOG"

# 1. advisor HIGH (open since round 2): Airfoil2D-medium episode repair.
#    n-domains 2 => stage 1 no-op, repairs are the first device work.
STEP_TIMEOUT=4800 step $GEN Airfoil2D-medium-v0 --n-domains 2 --lanes 6 \
    --episode-steps 100 --bundle

# 2. statistics repool audit over the shipped bundle
STEP_TIMEOUT=900 step python -u scripts/repool_statistics.py --apply

# 3. flagship control win, take 2: base-bleed + harmonic jet forcing via
#    antithetic common-state ES (PPO converged to do-nothing; artifact kept)
STEP_TIMEOUT=2700 step python -u scripts/train_es_tpu.py \
    --env-id CylinderJet2D-easy-v0 --pop 32 --gens 8 --minutes 35
grab '"algo": "ES", "env_id": "CylinderJet2D-easy-v0"' \
    bench_assets/control/es_cylinder_easy.json

# 4. PPO RBC re-run with the fixed GAE estimator (round-3 weak #6)
STEP_TIMEOUT=1200 step python -u scripts/train_ppo_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 60 --minutes 12
grab '"algo": "PPO", "env_id": "RBC2D-easy-v0"' \
    bench_assets/control/ppo_rbc2d_easy.json

# 5. TCF Re330 time-averaged validation (replaces the snapshot-ensemble
#    method-calibration argument with a measurement)
STEP_TIMEOUT=3900 step $V TCFSmall3D-bottom-medium-v0
grab '"env_id": "TCFSmall3D-bottom-medium-v0"' \
    bench_assets/validation/tcf_re330.json

# 6. TCFSmall Re550 dataset (Re550 has never been stepped in any artifact;
#    covers the bottom-hard and both-hard ids)
STEP_TIMEOUT=4800 step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 \
    --n-domains 2 --episode-steps 60 --bundle

# 7. TD-MPC baseline (the last missing algorithm artifact)
STEP_TIMEOUT=2100 step python -u scripts/train_tdmpc_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 32 --iters 200 --minutes 25
grab '"algo": "TD-MPC"' bench_assets/control/tdmpc_rbc2d_easy.json

# 8. SAC with a real budget on the NaN-fixed path; then NaN-free MA-SAC
STEP_TIMEOUT=2700 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 400 --minutes 35
grab '"algo": "SAC"' bench_assets/control/sac_rbc2d_easy.json
STEP_TIMEOUT=1500 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 16 --iters 200 --minutes 18 --marl
grab '"algo": "MA-SAC"' bench_assets/control/masac_rbc2d_easy.json

# 9. Re550 time-averaged validation (after its dataset lands)
STEP_TIMEOUT=3600 step $V TCFSmall3D-bottom-hard-v0
grab '"env_id": "TCFSmall3D-bottom-hard-v0"' \
    bench_assets/validation/tcf_re550.json

# 10. dataset long tail, cheapest-first, as wall-clock allows
STEP_TIMEOUT=4800 step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $GEN Airfoil2D-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle

echo "=== $(date +%H:%M:%S) r4e chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
