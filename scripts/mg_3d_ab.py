"""A/B the multigrid pressure preconditioner on stagnation-bound 3D tiers.

Round-1 finding: at pressure tol 5e-7 (cylinder/airfoil 3D) fp32 Jacobi-PCG
exits by stall patience.  Measures env throughput, pressure iterations and
residuals with pressure_multigrid on/off.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/mg_3d_ab.py [env_id ...]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import _heartbeat  # noqa: E402

_heartbeat.start()

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)
WARM_STEPS = 6
MEASURE_STEPS = 10


def run(env_id: str, variant: str, extra_kw=None):
    """variant: 'jacobi' | 'mg' | 'aggN' (aggregation coarse, tile N)."""
    env = fluidgym_tpu.make(env_id, **KW, **(extra_kw or {}))
    orig = env._get_simulation
    if variant == "mg":
        env._get_simulation = lambda: dataclasses.replace(
            orig(), pressure_multigrid=True)
    elif variant.startswith("agg"):
        tile = int(variant[3:])
        env._get_simulation = lambda: dataclasses.replace(
            orig(), pressure_coarse_tile=tile,
            pressure_coarse_precondition=True)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    carry = env._pure_carry()
    action = jnp.zeros_like(env._zero_action)
    for _ in range(WARM_STEPS):
        carry, _, r, info = fn(carry, action)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters, res, conv = [], [], []
    for _ in range(MEASURE_STEPS):
        carry, _, r, info = fn(carry, action)
        iters.append(int(np.asarray(info["pressure_iterations"]).reshape(-1)[0]))
        res.append(float(np.asarray(info["pressure_residual"]).reshape(-1)[0]))
        conv.append(bool(np.asarray(info["pressure_converged"]).all()))
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / MEASURE_STEPS
    return {
        "steps_per_sec": round(1.0 / dt, 3),
        "pressure_iters_per_step": round(float(np.mean(iters)), 1),
        "worst_residual": float(np.max(res)),
        "all_converged": all(conv),
        "reward_last": float(np.asarray(r).reshape(-1)[0]),
    }


if __name__ == "__main__":
    # args: env ids, optionally suffixed with kwargs, e.g.
    #   CylinderJet2D-easy-v0,resolution=56
    ids = sys.argv[1:] or ["CylinderJet3D-easy-v0", "RBC3D-easy-v0",
                           "CylinderJet2D-easy-v0,resolution=56"]
    for spec in ids:
        # ";"-separated so list-valued kwargs (variants=['a','b']) survive;
        # "," kept for backward compatibility with scalar-only specs
        sep = ";" if ";" in spec else ","
        env_id, *kw_items = spec.split(sep)
        extra = {}
        for item in kw_items:
            k, _, v = item.partition("=")
            try:
                extra[k] = eval(v)  # noqa: S307 -- operator-supplied CLI
            except Exception:
                extra[k] = v
        out = {"env": spec}
        for key in (extra.pop("variants", None)
                    or ["jacobi", "agg8", "agg16"]):
            try:
                out[key] = run(env_id, key, extra)
            except Exception as e:
                out[key] = f"ERROR: {str(e)[:200]}"
        print(json.dumps(out), flush=True)
