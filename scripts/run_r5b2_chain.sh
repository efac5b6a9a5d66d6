#!/bin/bash
# Round-5 B2: the dataset long tail, cheapest-first, every step under the
# wedge-resilient runner (silent-log auto-restart + stage-1 burn-in
# checkpoints), tiers validated as they land.  Every TCF generation covers
# its -both sibling via the shared initial_domain_id.  DEADLINE caps the
# whole chain; per-step budgets are passed to run_resilient.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export FLUIDGYM_HB_GRACE=4500
export FLUIDGYM_BURNIN_CKPT=4000
LOG=${LOG:-/tmp/r5b2_chain_$(date +%Y%m%d_%H%M%S).log}
ln -sf "$LOG" /tmp/r5b2_chain_latest.log
DEADLINE=${DEADLINE:?set DEADLINE=<epoch seconds>}
R="bash scripts/run_resilient.sh"
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"
echo $$ > /tmp/r4.pid
mkdir -p bench_assets/control bench_assets/validation

step() {  # step <budget_s> <cmd...>: run resiliently within the deadline
  local budget=$1; shift
  local now remaining
  now=$(date +%s)
  remaining=$((DEADLINE - now))
  if [ "$remaining" -le 300 ]; then
    echo "=== $(date +%H:%M:%S) DEADLINE: skipping $* ===" >> "$LOG"
    return
  fi
  [ "$budget" -gt "$remaining" ] && budget=$remaining
  $R "$budget" "$LOG" "$@"
}

grab() {
  local out
  out=$(grep -h "$1" "$LOG" | tail -1)
  [ -n "$out" ] && echo "$out" > "$2"
}

# seed the user data dir from the repo bundle (fresh VMs wipe it)
USER_DATA=$(python -c "from fluidgym_tpu.config import config; print(config.data_path)")
mkdir -p "$USER_DATA/initial_domains"
cp -rn fluidgym_tpu/data/initial_domains/. "$USER_DATA/initial_domains/" 2>>"$LOG"

# (CylinderJet3D-medium generated + validated in the first B2 launch)
step 9000 $GEN CylinderJet3D-hard-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
step 9000 $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --transient-steps 999999 --transient-split 4 --bundle
step 2700 $V Airfoil3D-easy-v0 --steps 200
grab '"env_id": "Airfoil3D-easy-v0"' bench_assets/validation/airfoil3d_easy.json
step 9000 $GEN Airfoil2D-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
step 2700 $V Airfoil2D-hard-v0 --steps 200
grab '"env_id": "Airfoil2D-hard-v0"' bench_assets/validation/airfoil2d_hard.json
step 9000 $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle
step 2700 $V TCFLarge3D-bottom-easy-v0 --burnin 100 --n-stat 250
grab '"env_id": "TCFLarge3D-bottom-easy-v0"' \
    bench_assets/validation/tcflarge_re180.json
step 9000 $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40 --transient-steps 999999 --transient-split 4 --bundle
step 9000 $GEN Airfoil3D-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 40 --transient-steps 999999 --transient-split 8 --bundle
# cylinder RL retry with the round-4 diagnosis applied (VERDICT #5)
step 2700 python -u scripts/train_ppo_tpu.py \
    --env-id CylinderJet2D-easy-v0 --n-envs 32 --iters 600 --minutes 35 \
    --init-log-std -2.3 --ent-coef 0.0
grab '"algo": "PPO"' bench_assets/control/ppo_cylinder_retry.json

step 10800 $GEN TCFLarge3D-bottom-medium-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
step 10800 $GEN TCFLarge3D-bottom-hard-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle

# hard-tier blend bias bound (VERDICT #8)
step 4500 python -u scripts/hard_stability_probe.py \
    central upwind03 --res 48 --steps 400
grab '"variant": "upwind03"' bench_assets/validation/blend_bias_res48.json

echo "=== $(date +%H:%M:%S) r5-B2 chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
