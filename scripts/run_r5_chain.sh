#!/bin/bash
# Round-5 TPU chain — written at the end of round 4 so the next session
# starts device work immediately instead of re-deriving the queue.
#
# Round-4 state this plan builds on:
#   * Cylinder control win recorded (ES harmonic jet, -2.3% drag);
#     TD-MPC / PPO-fixed-GAE / Re330 time-average all recorded.
#   * Airfoil2D-medium contamination root-caused to a growing advective
#     instability (NOT underdeveloped snapshots — burn-in extensions make
#     it worse); scripts/airfoil_blend_probe.py measures whether the
#     cylinder's Re-gated upwind blend removes it.  If round 4 shipped
#     the blend gate, step 1 REGENERATES that dataset under it.
#   * Aggregation coarse preconditioner (pressure_coarse_tile) shipped
#     opt-in with a 3.0x iteration cut on the real airfoil operator;
#     step 0 is its hardware A/B — if it wins >=1.5x end-to-end, flip
#     the airfoil preset default before the heavy airfoil generation
#     steps so they ride the speedup.
#
# Compile-cost reality (measured round 4): every first compile on a fresh
# VM is cold — 56 min for the 6-lane airfoil-medium program, ~3 min for
# cylinder/RBC programs, ~5 min for 2-lane TCF.  Order steps so heavy
# compiles amortize across later steps, and export FLUIDGYM_HB_GRACE so
# in-process heartbeats outlive them.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export FLUIDGYM_HB_GRACE=4500
RUN_TAG=$(date +%Y%m%d_%H%M%S)
LOG=${LOG:-/tmp/r5_chain_${RUN_TAG}.log}
ln -sf "$LOG" /tmp/r5_chain_latest.log
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

# 0a. seed the user data dir from the repo bundle (fresh VMs wipe it)
USER_DATA=$(python -c "from fluidgym_tpu.config import config; print(config.data_path)")
mkdir -p "$USER_DATA/initial_domains"
cp -rn fluidgym_tpu/data/initial_domains/. "$USER_DATA/initial_domains/" 2>>"$LOG"

# 0b. aggregation-coarse A/B on the 3D stall-bound tiers (the 2D
#     warm-started airfoil A/B was a recorded 0.79x negative in round 4;
#     the remaining agg targets are cold/stall-bound solves: CylJet3D
#     burns 1596 Jacobi iters/step where MG cut 5.25x but lost on
#     per-iteration cost — agg's per-iteration tax is far smaller)
STEP_TIMEOUT=5400 step python -u scripts/mg_3d_ab.py \
    "CylinderJet3D-easy-v0,variants=['jacobi','agg8','agg16']"
grab '"agg8"' bench_assets/control/agg_3d_ab.json

# 1. Airfoil2D-medium regeneration (if the blend gate shipped) or repair
STEP_TIMEOUT=10800 step $GEN Airfoil2D-medium-v0 --n-domains 2 --lanes 6 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=900 step python -u scripts/repool_statistics.py --apply

# 2. TCFSmall Re550 dataset + validation (never stepped in any artifact)
STEP_TIMEOUT=7200 step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 \
    --n-domains 2 --episode-steps 60 --bundle
STEP_TIMEOUT=3600 step $V TCFSmall3D-bottom-hard-v0
grab '"env_id": "TCFSmall3D-bottom-hard-v0"' \
    bench_assets/validation/tcf_re550.json

# 3. SAC with the long budget it needs (round-4 chain never reached it)
STEP_TIMEOUT=4200 step python -u scripts/train_sac_tpu.py \
    --env-id RBC2D-easy-v0 --n-envs 64 --iters 600 --minutes 60
grab '"algo": "SAC"' bench_assets/control/sac_rbc2d_easy.json

# 4. dataset long tail, cheapest-first
STEP_TIMEOUT=5400 step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60
grab '"env_id": "Airfoil2D-hard-v0"' bench_assets/validation/airfoil2d_hard.json
STEP_TIMEOUT=9000 step $GEN Airfoil3D-easy-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $GEN CylinderJet3D-hard-v0 --lanes 1 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=9000 step $GEN Airfoil3D-medium-v0 --lanes 1 --n-domains 2 \
    --episode-steps 40 --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-easy-v0 --lanes 1 \
    --n-domains 2 --episode-steps 40 --bundle
STEP_TIMEOUT=9000 step $GEN Airfoil3D-hard-v0 --lanes 1 --n-domains 1 \
    --episode-steps 40 --transient-steps 999999 --transient-split 8 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-medium-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle
STEP_TIMEOUT=10800 step $GEN TCFLarge3D-bottom-hard-v0 --lanes 1 \
    --n-domains 1 --episode-steps 30 --bundle

# 5. snapshot-count extension for the thin 3D dirs (reference ships 10)
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

echo "=== $(date +%H:%M:%S) r5 chain complete ===" >> "$LOG"
rm -f /tmp/r4.pid
