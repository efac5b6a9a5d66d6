#!/bin/bash
# Round-5 B1.5: the recovery + decision block between B1 and B2.
#   1. 3D aggregation A/B (CylinderJet3D-easy) FIRST — if agg8 wins, the
#      B2 cylinder-3D generations ride the speedup (flip applied manually
#      between B1.5 and B2; the A/B costs ~45 min, the flip can save
#      multiples of that across the 3D tail).
#   2. TCF Re550 dataset redo (the B1 attempt was lost to a tunnel wedge
#      at t=40400/59403) — now wedge-resilient: burn-in checkpoints every
#      4000 steps + silent-log auto-restart.
#   3. TCF Re550 time-averaged validation.
#   4. Re180 dead-lane regeneration (relaminarized idx-00 lane).
#   5. Opposition control on a turbulent Re180 snapshot (idx 1).
#   6. Airfoil2D-medium settle pass (zero-negative episode records).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export FLUIDGYM_HB_GRACE=4500
export FLUIDGYM_BURNIN_CKPT=4000
LOG=${LOG:-/tmp/r5b15_chain_$(date +%Y%m%d_%H%M%S).log}
ln -sf "$LOG" /tmp/r5b15_chain_latest.log
R="bash scripts/run_resilient.sh"
echo $$ > /tmp/r4.pid
mkdir -p bench_assets/control bench_assets/validation

$R 4500 "$LOG" python -u scripts/mg_3d_ab.py \
    "CylinderJet3D-easy-v0;variants=['jacobi','agg8']"
grep -h '"agg8"' "$LOG" | tail -1 > bench_assets/control/agg_3d_ab.json

$R 7200 "$LOG" python -u scripts/generate_datasets.py \
    TCFSmall3D-bottom-hard-v0 --lanes 2 --n-domains 2 --episode-steps 60 --bundle
$R 3000 "$LOG" python -u scripts/validate_upper_tiers.py \
    TCFSmall3D-bottom-hard-v0 --burnin 150 --n-stat 400
grep -h '"env_id": "TCFSmall3D-bottom-hard-v0"' "$LOG" | tail -1 \
    > bench_assets/validation/tcf_re550.json

$R 4500 "$LOG" python -u scripts/regen_tcf_dead_lanes.py \
    --env-id TCFSmall3D-bottom-easy-v0

$R 2400 "$LOG" python -u scripts/opposition_control_tpu.py \
    --steps 150 --settle 40 --gains 1.0 0.5 --idx 1
grep -h '"controller"' "$LOG" | tail -1 \
    > bench_assets/control/opposition_tcf_re180.json

$R 2700 "$LOG" python -u scripts/settle_airfoil_medium.py

echo "=== $(date +%H:%M:%S) r5-B1.5 complete ===" >> "$LOG"
rm -f /tmp/r4.pid
