#!/bin/bash
# Wait out an axon-tunnel wedge: probe the TPU with a trivial jitted call
# until it responds, then launch the round-4c chain.  Probes are short-lived
# subprocesses so a hung probe never becomes a stuck holder itself.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=/tmp/probe_then_r4c.log
echo "$(date +%H:%M:%S) probing for TPU recovery" >> "$LOG"
n=0
while true; do
  n=$((n + 1))
  if timeout 240 python -c \
    "import jax, jax.numpy as jnp; print(float(jax.jit(lambda a: a.sum())(jnp.ones((8,8)))))" \
    >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) probe $n ok -- launching r4c" >> "$LOG"
    break
  fi
  echo "$(date +%H:%M:%S) probe $n failed; sleeping 120s" >> "$LOG"
  sleep 120
done
exec bash scripts/run_r4c_chain.sh
