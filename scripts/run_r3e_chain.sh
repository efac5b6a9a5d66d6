#!/bin/bash
# Round-3 chain, take 5 -- replaces run_r3d_chain.sh's remainder after its
# Airfoil2D-medium repair step was watchdog-killed (root cause: the repair
# path's unbatched compile was log-silent >15 min; fixed in
# generate_datasets.py by lane-parallel repairs + in-process heartbeats).
# Order: finish the RL-baseline roster (MA-PPO / MA-SAC) while their
# programs are cache-warm, then the advisor-HIGH Airfoil2D-medium repair,
# then upper-tier datasets + validation, then the long tail, then a retry
# pass.  Every step is resumable + skip-existing.
#
# Usage: run_r3e_chain.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3d_chain.log}
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
sleep 60
# advertise the chain shell so bench.py's round-end reclaim can kill the
# WHOLE chain tree (not just the current step, which would be replaced by
# the next one within seconds)
echo $$ > /tmp/r3d.pid

step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout -k 30 "${STEP_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/tpu_step.pid
  # log-silence watchdog: scripts now emit in-process heartbeats during
  # compiles and slow marches, so silence >15 min means a genuine wedge
  (
    local last=-1 quiet=0 size
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$size" = "$last" ]; then quiet=$((quiet + 60)); else quiet=0; fi
      last=$size
      if [ "$quiet" -ge 900 ]; then
        echo "!!! STALL WATCHDOG: no log output for ${quiet}s, killing step" >> "$LOG"
        # kill the python child too: TERM-ing only the timeout wrapper can
        # orphan a TERM-resistant wedged TPU holder (it keeps the
        # single-tenant grant and wedges every later step)
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
# collect the SAC result the r3d chain's step produced before handover
out=$(grep -h '"algo": "SAC"' "$LOG" | tail -1)
[ -n "$out" ] && echo "$out" > bench_assets/control/sac_rbc2d_easy.json

# 1. MA-PPO / MA-SAC recorded results (complete the RL-baseline roster)
STEP_TIMEOUT=2700 step python -u scripts/train_ppo_tpu.py \
    --env-id RBC2D-easy-v0 --marl --n-envs 8 --iters 40 --minutes 18
out=$(grep -h '"algo": "MA-PPO"' "$LOG" | tail -1)
[ -n "$out" ] && echo "$out" > bench_assets/control/mappo_rbc2d_easy.json
STEP_TIMEOUT=2700 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --marl --n-envs 8 --iters 50 --minutes 18
out=$(grep -h '"algo": "MA-SAC"' "$LOG" | tail -1)
[ -n "$out" ] && echo "$out" > bench_assets/control/masac_rbc2d_easy.json

# 2. advisor HIGH: Airfoil2D-medium episode repair (lane-parallel now)
STEP_TIMEOUT=10800 step $GEN Airfoil2D-medium-v0 --lanes 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle

# 3. TCFSmall Re550 + validation
step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --bundle
STEP_TIMEOUT=7200 step $V TCFSmall3D-bottom-hard-v0

# 4. CylinderJet3D-medium + stability validation
step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40

# 5. Airfoil2D-hard + validation
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60

# 6. long tail
step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 --episode-steps 60 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil3D-easy-v0 --steps 30
step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-hard-v0 --steps 30
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

# 7. opportunistic: extend reduced 3D datasets toward >=5 snapshots/mode
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

# 8. one retry pass over anything that FAILED above (resumable steps)
grep '^!!! FAILED:' "$LOG" 2>/dev/null | sed 's/^!!! FAILED: //' | sort -u | \
while read -r line; do
  retry=$(echo "$line" | sed -E 's/--lanes [0-9]+/--lanes 2/')
  STEP_TIMEOUT=9000 step $retry
done

rm -f /tmp/r3d.pid
echo "=== R3E CHAIN DONE $(date) ===" >> "$LOG"
