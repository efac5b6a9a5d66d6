"""Nusselt-Rayleigh scaling validation for the RBC family.

Runs uncontrolled RBC2D episodes at the three bundled Rayleigh numbers
(8e4 / 4e5 / 8e5, the easy/medium/hard tiers) from their developed initial
domains and fits Nu ~ Ra^beta over the statistically steady tail.
Literature: beta in [0.25, 0.33] for moderate-Ra 2D convection
(classical scaling ~2/7 = 0.286).

Run (TPU): PYTHONPATH=/root/repo python -u scripts/rbc_scaling.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu

IDS = [("RBC2D-easy-v0", 8e4), ("RBC2D-medium-v0", 4e5),
       ("RBC2D-hard-v0", 8e5)]
N_STEPS = 150
N_TAIL = 100
LANES = 4


def measure(env_id: str) -> dict:
    env = fluidgym_tpu.make(env_id, load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False,
                            episode_length=10**9)
    env.reset(seed=0)
    carries = []
    for idx in range(LANES):
        env.load_initial_domain(env.mode, idx, user_only=False)
        carries.append(env._pure_carry())
    bcarry = jax.tree.map(lambda *xs: jnp.stack(xs), *carries)
    fn = jax.jit(jax.vmap(env._pure_step))
    n_act = int(np.prod(env.action_space.shape)) or 1
    a0 = jnp.zeros((LANES, n_act), jnp.float32)
    nus = []
    t0 = time.perf_counter()
    c = bcarry
    for t in range(N_STEPS):
        c, _o, _r, info = fn(c, a0)
        nus.append(np.asarray(info["nusselt"]))
    jax.block_until_ready(jax.tree.leaves(c)[0])
    tail = np.stack(nus[-N_TAIL:])
    return {
        "nu_mean": round(float(tail.mean()), 4),
        "nu_std_over_lanes": round(float(tail.mean(axis=0).std()), 4),
        "steps_per_sec": round(N_STEPS * LANES /
                               (time.perf_counter() - t0), 2),
    }


def main() -> None:
    out = {}
    ras, nus = [], []
    for env_id, ra in IDS:
        try:
            row = measure(env_id)
            out[env_id] = row
            ras.append(ra)
            nus.append(row["nu_mean"])
        except Exception as e:  # noqa: BLE001
            out[env_id] = {"error": f"{type(e).__name__}: {e}"}
        print(env_id, out[env_id], flush=True)
    if len(nus) >= 2:
        beta = float(np.polyfit(np.log(ras), np.log(nus), 1)[0])
        out["beta_fit"] = round(beta, 4)
        out["beta_expected"] = "0.25-0.33 (classical ~2/7=0.286)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
