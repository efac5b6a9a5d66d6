#!/bin/bash
# Round-4 TPU chain.  Order follows VERDICT.md (round 3) "Next round":
#   1. advisor-HIGH Airfoil2D-medium episode repair (open since round 2)
#   2. PPO control win on the flagship cylinder benchmark
#   3. missing upper-tier datasets cheapest-first + time-averaged validation
#   4. PPO re-run with the fixed GAE, SAC with a real budget, MA-SAC NaN-free
#   5. TCFLarge / Airfoil3D long tail, 3D snapshot extension
#   6. statistics repool audit
# Every step is resumable + skip-existing, so re-running is always safe.
#
# ADVICE.md (round 3) fix: per-run log file + exact-command FAILED matching,
# so a stale log or a failed *validation* step can no longer trigger a
# spurious generation retry.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r4_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r4_chain_latest.log
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  sleep 60
fi
# advertise the chain shell so bench.py's round-end reclaim can kill the
# WHOLE chain tree (not just the current step)
echo $$ > /tmp/r4.pid

step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout -k 30 "${STEP_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/tpu_step.pid
  # log-silence watchdog: scripts emit in-process heartbeats during compiles
  # and slow marches, so silence >15 min means a genuine wedge
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

# capture the LAST json line a trainer printed into an artifact file
grab() {  # grab <marker> <outfile>
  local out
  out=$(grep -h "$1" "$LOG" | tail -1)
  [ -n "$out" ] && echo "$out" > "$2"
}

# 1. advisor HIGH (round 2!): Airfoil2D-medium episode repair
STEP_TIMEOUT=10800 step $GEN Airfoil2D-medium-v0 --lanes 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle

# 2. flagship control win: PPO on the cylinder (reference's own RL route,
#    Rabault-style drag reduction at Re100)
STEP_TIMEOUT=7200 step python -u scripts/train_ppo_tpu.py \
    --env-id CylinderJet2D-easy-v0 --n-envs 32 --iters 400 --minutes 75
grab '"algo": "PPO", "env_id": "CylinderJet2D-easy-v0"' \
    bench_assets/control/ppo_cylinder_easy.json

# 3. TCF Re330 time-averaged validation (replaces the snapshot-ensemble
#    method-calibration argument with a measurement)
STEP_TIMEOUT=9000 step $V TCFSmall3D-bottom-medium-v0
grab '"env_id": "TCFSmall3D-bottom-medium-v0"' \
    bench_assets/validation/tcf_re330.json

# 4. TCFSmall Re550 dataset + validation (covers bottom+both hard ids)
step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --bundle
STEP_TIMEOUT=9000 step $V TCFSmall3D-bottom-hard-v0
grab '"env_id": "TCFSmall3D-bottom-hard-v0"' \
    bench_assets/validation/tcf_re550.json

# 5. PPO RBC re-run with the fixed GAE estimator (the recorded win predates
#    the episode-boundary fix)
STEP_TIMEOUT=3600 step python -u scripts/train_ppo_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 200 --minutes 25
grab '"algo": "PPO", "env_id": "RBC2D-easy-v0"' \
    bench_assets/control/ppo_rbc2d_easy.json

# 6. CylinderJet3D-medium + stability validation
step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40
grab '"env_id": "CylinderJet3D-medium-v0"' \
    bench_assets/validation/cyljet3d_medium.json

# 7. Airfoil2D-hard + validation
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60
grab '"env_id": "Airfoil2D-hard-v0"' bench_assets/validation/airfoil2d_hard.json

# 8. SAC with a real budget (round-3 20k-step run never left the entropy
#    phase); NaN sanitization for diverged lanes landed this round
STEP_TIMEOUT=7200 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 400 --minutes 75
grab '"algo": "SAC"' bench_assets/control/sac_rbc2d_easy.json
STEP_TIMEOUT=3600 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 16 --iters 200 --minutes 30 --marl
grab '"algo": "MA-SAC"' bench_assets/control/masac_rbc2d_easy.json

# 9. long tail: Airfoil3D, CylinderJet3D-hard, TCFLarge
step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil3D-easy-v0 --steps 30
grab '"env_id": "Airfoil3D-easy-v0"' bench_assets/validation/airfoil3d_easy.json
step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-hard-v0 --steps 30
grab '"env_id": "CylinderJet3D-hard-v0"' \
    bench_assets/validation/cyljet3d_hard.json
step $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 --episode-steps 40 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle
STEP_TIMEOUT=7200 step $V TCFLarge3D-bottom-easy-v0 --steps 60
grab '"env_id": "TCFLarge3D-bottom-easy-v0"' \
    bench_assets/validation/tcflarge_easy.json
step $GEN Airfoil3D-hard-v0 --lanes 1 --n-domains 1 --episode-steps 40 \
    --transient-steps 999999 --transient-split 8 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-medium-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-hard-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle

# 10. opportunistic: extend reduced 3D datasets toward >=5 snapshots/mode
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

# 11. retry pass: exact-command FAILED matching against THIS run's log only
for retry in \
  "$GEN Airfoil2D-medium-v0 --lanes 2 --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle" \
  "$GEN TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60 --bundle" \
  "$GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 --transient-steps 999999 --transient-split 4 --bundle" \
  "$GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle" \
  ; do
  if grep -qF "!!! FAILED: $retry" "$LOG"; then
    STEP_TIMEOUT=9000 step $retry
  fi
done

# 12. statistics repool audit over the final shipped bundle (ADVICE r3 low:
#     the known-contaminated airfoil_2D_Re3000 zero-point must not survive)
STEP_TIMEOUT=1800 step python -u scripts/repool_statistics.py --apply

echo "=== $(date +%H:%M:%S) chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
