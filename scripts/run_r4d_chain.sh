#!/bin/bash
# Round-4 chain, take 3.  Differences from run_r4c_chain.sh:
#   * The merged-frame XLA A/B runs FIRST (it is short) and, if it wins,
#     the slow airfoil generator runs WITH the routing enabled -- the
#     repair step is the chain's long pole and rides on airfoil solves.
#   * generate_datasets.py now runs contamination repairs BEFORE the
#     fresh-episode long tail and re-pools statistics immediately after,
#     so the advisor-HIGH Airfoil2D-medium fix lands even if the step is
#     later timed out mid-queue.
#   * A global DEADLINE: no step starts after it and the per-step timeout
#     is capped to the remaining window, so the chip is free for the
#     driver's end-of-round bench run.
# PPO-cylinder is NOT here: the r4c chain instance that survived recorded
# it (bench_assets/control/ppo_cylinder_easy.json).
# Every step is resumable + skip-existing; re-running is always safe.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r4d_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r4d_chain_latest.log
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"
DEADLINE=${DEADLINE:-1787241900}   # ~15:45 local; driver bench needs the chip

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  sleep 30
fi
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

# 1. merged-frame XLA solve A/B (short; decides the generator's solver path)
STEP_TIMEOUT=3600 step python -u scripts/merged_xla_ab.py Airfoil2D-easy-v0
grab '"merged_xla_speedup"' bench_assets/control/merged_xla_ab.json
MERGED_ENV=""
if [ -f bench_assets/control/merged_xla_ab.json ]; then
  if python -c "
import json,sys
r=json.load(open('bench_assets/control/merged_xla_ab.json'))
sys.exit(0 if r.get('merged_xla_speedup',0)>1.05 and r.get('drag_rel_diff',1)<0.01 else 1)
"; then
    MERGED_ENV=1
    echo "=== merged XLA routing WON its A/B; generator runs with it ===" >> "$LOG"
  fi
fi

# 2. advisor HIGH (round 2!): Airfoil2D-medium episode repair -- repairs
#    now run first inside the generator, so the contamination fix lands
#    within the cap even though the fresh-episode tail exceeds it.
STEP_TIMEOUT=5400 FLUIDGYM_MERGED_XLA_SOLVES=${MERGED_ENV:+auto} step \
    $GEN Airfoil2D-medium-v0 --lanes 4 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle

# 3. statistics repool audit over the shipped bundle (right after the
#    repair so the decontaminated zero-point ships no matter what follows)
STEP_TIMEOUT=1200 step python -u scripts/repool_statistics.py --apply

# 3b. flagship control win, take 2: PPO converged to do-nothing (artifact
#     kept), so search the known-good controller family directly --
#     base-bleed + harmonic jet forcing via antithetic ES (~35 min)
STEP_TIMEOUT=3300 step python -u scripts/train_es_tpu.py \
    --env-id CylinderJet2D-easy-v0 --pop 32 --gens 8 --minutes 40
grab '"algo": "ES", "env_id": "CylinderJet2D-easy-v0"' \
    bench_assets/control/es_cylinder_easy.json

# 4. TCF Re330 time-averaged validation (replaces the snapshot-ensemble
#    method-calibration argument with a measurement)
STEP_TIMEOUT=5400 step $V TCFSmall3D-bottom-medium-v0
grab '"env_id": "TCFSmall3D-bottom-medium-v0"' \
    bench_assets/validation/tcf_re330.json

# 5. PPO RBC re-run with the fixed GAE estimator
STEP_TIMEOUT=2400 step python -u scripts/train_ppo_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 200 --minutes 25
grab '"algo": "PPO", "env_id": "RBC2D-easy-v0"' \
    bench_assets/control/ppo_rbc2d_easy.json

# 6. TD-MPC baseline (the last missing algorithm artifact)
STEP_TIMEOUT=2700 step python -u scripts/train_tdmpc_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 32 --iters 200 --minutes 30
grab '"algo": "TD-MPC"' bench_assets/control/tdmpc_rbc2d_easy.json

# 7. TCFSmall Re550 dataset + validation (Re550 has never been stepped in
#    any artifact -- VERDICT missing #2; covers bottom+both hard ids)
STEP_TIMEOUT=5400 step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 \
    --n-domains 2 --episode-steps 60 --bundle
STEP_TIMEOUT=5400 step $V TCFSmall3D-bottom-hard-v0
grab '"env_id": "TCFSmall3D-bottom-hard-v0"' \
    bench_assets/validation/tcf_re550.json

# 8. SAC with a real budget on the NaN-fixed path
STEP_TIMEOUT=3600 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 400 --minutes 45
grab '"algo": "SAC"' bench_assets/control/sac_rbc2d_easy.json
STEP_TIMEOUT=2100 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 16 --iters 200 --minutes 25 --marl
grab '"algo": "MA-SAC"' bench_assets/control/masac_rbc2d_easy.json

# 9. dataset long tail, cheapest-first, as wall-clock allows
step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40
grab '"env_id": "CylinderJet3D-medium-v0"' \
    bench_assets/validation/cyljet3d_medium.json
STEP_TIMEOUT=9000 FLUIDGYM_MERGED_XLA_SOLVES=${MERGED_ENV:+auto} step \
    $GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60
grab '"env_id": "Airfoil2D-hard-v0"' bench_assets/validation/airfoil2d_hard.json
step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil3D-easy-v0 --steps 30
grab '"env_id": "Airfoil3D-easy-v0"' bench_assets/validation/airfoil3d_easy.json
step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
step $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 --episode-steps 40 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle
step $GEN Airfoil3D-hard-v0 --lanes 1 --n-domains 1 --episode-steps 40 \
    --transient-steps 999999 --transient-split 8 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-medium-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-hard-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

echo "=== $(date +%H:%M:%S) r4d chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
