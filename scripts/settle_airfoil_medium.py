"""Settle the Airfoil2D-medium snapshots under the gated blend solver.

The round-5 regeneration repaired all six episode records on attempt 0,
but the episodes were re-recorded from snapshots developed under the OLD
central scheme — so each episode opens with a config-switch transient
(test_00 keeps 2 negative-drag rows, min -0.098).  This pass forces the
burn-in pre-extension for every episode (run_repairs with prior rows):
each snapshot marches FLUIDGYM_REPAIR_EXTRA steps under the shipping
blend+agg8 config, is re-saved (snapshots become blend-consistent), and
the episode is re-recorded from the settled state.  Statistics are
repooled and the bundle refreshed.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/settle_airfoil_medium.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

os.environ.setdefault("FLUIDGYM_REPAIR_EXTRA", "80")

import _heartbeat  # noqa: E402

_heartbeat.start()

from generate_datasets import bundle, log, run_repairs  # noqa: E402


def main() -> None:
    import numpy as np

    import fluidgym_tpu
    from fluidgym_tpu.envs.fluid_env import MODE_SEEDS
    from fluidgym_tpu.utils import data_utils

    env = fluidgym_tpu.make(
        "Airfoil2D-medium-v0", load_initial_domain=False,
        load_domain_statistics=False, use_marl=False)
    env._load_domain_on_reset = False
    env._enable_actions = False
    env.reset(seed=0)

    repairs = []
    for mode in MODE_SEEDS:
        for idx in range(2):
            rows = [{k: float(v) for k, v in r.items()}
                    for r in data_utils.load_uncontrolled_episode(
                        env.initial_domain_id, mode.value, idx)]
            repairs.append((mode, idx, rows))
    log(f"settling {len(repairs)} episodes "
        f"(pre-extension {os.environ['FLUIDGYM_REPAIR_EXTRA']} steps)")
    all_rows = run_repairs(env, repairs, episode_steps=100, lanes=6)

    env._save_domain_statistics(env._pool_statistics_rows(all_rows))
    log("saved domain_statistics.json (settled pooling)")
    bundle(env)

    # verification: no negative drag anywhere
    worst = 0.0
    for mode in MODE_SEEDS:
        for idx in range(2):
            rows = data_utils.load_uncontrolled_episode(
                env.initial_domain_id, mode.value, idx)
            d = np.asarray([float(r["drag"]) for r in rows])
            worst = min(worst, float(d.min()))
            log(f"  {mode.value}_{idx:02d}: min drag {d.min():+.3f}, "
                f"neg rows {int((d <= 0).sum())}/{len(d)}")
    log(f"settle pass complete; global min drag {worst:+.3f}")


if __name__ == "__main__":
    main()
