#!/bin/bash
# Round-5 B2c: the remaining tail after CylinderJet3D-hard, re-ordered for
# what actually fits the last chip hours: TCFLarge-easy (covers its -both
# sibling), then the PPO retry and the blend-bias bound.  The 3D airfoil
# generations did not fit this round's chip budget (compile ~30+ min and
# sub-0.2 steps/s marches); documented as remaining work.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export FLUIDGYM_HB_GRACE=4500
export FLUIDGYM_BURNIN_CKPT=2000
LOG=${LOG:-/tmp/r5b2c_chain_$(date +%Y%m%d_%H%M%S).log}
ln -sf "$LOG" /tmp/r5b2c_chain_latest.log
DEADLINE=${DEADLINE:?set DEADLINE=<epoch seconds>}
R="bash scripts/run_resilient.sh"
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"
echo $$ > /tmp/r4.pid
mkdir -p bench_assets/control bench_assets/validation

step() {
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

# lanes=2: both burn-in jobs in ONE lockstep chunk (serial chunks would
# double the wall time); burnin-scale 0.7 = 35 ETT (reference protocol is
# 50; the full-size Re180 box develops from Reichardt+curl-noise well
# inside that — documented in VALIDATION.md) so the step fits the
# remaining chip window
step 9000 $GEN TCFLarge3D-bottom-easy-v0 --lanes 2 \
    --n-domains 2 --episode-steps 40 --burnin-scale 0.7 --bundle
step 2400 $V TCFLarge3D-bottom-easy-v0 --burnin 80 --n-stat 200
grep -h '"env_id": "TCFLarge3D-bottom-easy-v0"' "$LOG" | tail -1 \
    > bench_assets/validation/tcflarge_re180.json

step 2700 python -u scripts/train_ppo_tpu.py \
    --env-id CylinderJet2D-easy-v0 --n-envs 32 --iters 600 --minutes 35 \
    --init-log-std -2.3 --ent-coef 0.0
grep -h '"algo": "PPO"' "$LOG" | tail -1 \
    > bench_assets/control/ppo_cylinder_retry.json

step 3600 python -u scripts/hard_stability_probe.py \
    central upwind03 --res 48 --steps 300
grep -h '"variant": "upwind03"' "$LOG" | tail -1 \
    > bench_assets/validation/blend_bias_res48.json

echo "=== $(date +%H:%M:%S) r5-B2c complete ===" >> "$LOG"
rm -f /tmp/r4.pid
