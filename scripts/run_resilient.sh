#!/bin/bash
# run_resilient.sh <max_seconds> <log> <cmd...>
# Runs cmd appending to log, watching for the silent axon-tunnel wedge:
# if the log grows nothing for SILENCE seconds (healthy steps print every
# <=240 s via the in-process heartbeat; a wedge blocks even that), the
# process tree is killed BY PID, the stale TPU grant is given 90 s to
# clear, and the command relaunches (work is checkpoint/resume-safe:
# generate_datasets burn-in checkpoints via FLUIDGYM_BURNIN_CKPT, stage-2
# episodes are reused, repairs re-screen).  Stops at max_seconds total.
set -u
MAX=$1; LOG=$2; shift 2
SILENCE=${SILENCE:-450}
# No silence-kill inside an attempt's first GRACE seconds: cold server-side
# compiles are host-idle AND (on this client) heartbeat-suppressed, so they
# are indistinguishable from a wedge; killing one restarts the compile from
# scratch (kill-loop).  An early wedge just costs GRACE instead of SILENCE.
GRACE=${GRACE:-1500}
START=$(date +%s)
attempt=0
while :; do
  now=$(date +%s)
  left=$((MAX - (now - START)))
  [ "$left" -le 60 ] && { echo "resilient: budget exhausted" >> "$LOG"; exit 1; }
  attempt=$((attempt + 1))
  echo "=== resilient attempt $attempt ($(date +%H:%M:%S), ${left}s left): $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  astart=$(date +%s)
  last=$(stat -c %s "$LOG" 2>/dev/null || echo 0); quiet=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    if [ $((MAX - (now - START))) -le 0 ]; then
      echo "resilient: budget exhausted mid-run, stopping" >> "$LOG"
      kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
      kill "$pid" $kids 2>/dev/null; sleep 5; kill -9 "$pid" $kids 2>/dev/null
      exit 1
    fi
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$size" = "$last" ]; then quiet=$((quiet + 30)); else quiet=0; fi
    last=$size
    if [ "$quiet" -ge "$SILENCE" ] \
        && [ $((now - astart)) -ge "$GRACE" ]; then
      echo "!!! resilient: ${quiet}s silent (wedge), killing attempt $attempt" >> "$LOG"
      kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
      kill "$pid" $kids 2>/dev/null; sleep 5; kill -9 "$pid" $kids 2>/dev/null
      sleep 90   # stale-grant clearance
      continue 2
    fi
  done
  wait "$pid"; rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== resilient: success on attempt $attempt ===" >> "$LOG"
    exit 0
  fi
  echo "!!! resilient: attempt $attempt exited rc=$rc; retrying" >> "$LOG"
  sleep 90
done
