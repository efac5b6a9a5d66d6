#!/bin/bash
# Round-3 chain, take 6 -- fresh-machine restart of run_r3e_chain.sh with the
# already-landed steps removed (MA-PPO / MA-SAC results are recorded in
# bench_assets/control/; RBC3D-wide datasets are bundled).  Order: the
# advisor-HIGH Airfoil2D-medium episode repair first, then upper-tier
# datasets + validation cheapest-first, then the long tail, then the
# opportunistic 3D-dataset extension.  Every step is resumable +
# skip-existing, so re-running this script is always safe.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=${LOG:-/tmp/r3d_chain.log}
GEN="python -u scripts/generate_datasets.py"
V="python -u scripts/validate_upper_tiers.py"

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  sleep 60
fi
# advertise the chain shell so bench.py's round-end reclaim can kill the
# WHOLE chain tree (not just the current step, which would be replaced by
# the next one within seconds)
echo $$ > /tmp/r3d.pid

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

# 1. advisor HIGH: Airfoil2D-medium episode repair (lane-parallel repairs)
STEP_TIMEOUT=10800 step $GEN Airfoil2D-medium-v0 --lanes 2 \
    --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle

# 2. TCFSmall Re550 + validation (covers bottom+both hard ids)
step $GEN TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 \
    --episode-steps 60 --bundle
STEP_TIMEOUT=7200 step $V TCFSmall3D-bottom-hard-v0

# 3. CylinderJet3D-medium + stability validation
step $GEN CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V CylinderJet3D-medium-v0 --steps 40

# 4. Airfoil2D-hard + validation
STEP_TIMEOUT=9000 step $GEN Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 \
    --transient-steps 999999 --transient-split 4 --bundle
STEP_TIMEOUT=7200 step $V Airfoil2D-hard-v0 --steps 60

# 5. long tail
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

# 6. opportunistic: extend reduced 3D datasets toward >=5 snapshots/mode
step $GEN RBC3D-easy-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-medium-v0 --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN RBC3D-hard-v0   --lanes 3 --n-domains 5 --episode-steps 100 --bundle
step $GEN CylinderJet3D-easy-v0 --lanes 2 --n-domains 5 \
    --transient-steps 999999 --transient-split 4 --bundle

# 7. one retry pass over anything that FAILED above (resumable steps)
for retry in \
  "TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60 --bundle" \
  "CylinderJet3D-medium-v0 --lanes 2 --n-domains 2 --transient-steps 999999 --transient-split 4 --bundle" \
  "Airfoil2D-hard-v0 --lanes 2 --episode-steps 100 --transient-steps 999999 --transient-split 4 --bundle" \
  ; do
  if grep -q "FAILED.*${retry%% *}" "$LOG"; then
    STEP_TIMEOUT=9000 step $GEN $retry
  fi
done

echo "=== $(date +%H:%M:%S) chain complete ===" >> "$LOG"
rm -f /tmp/r3d.pid
