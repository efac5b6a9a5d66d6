"""Airfoil pressure-solve A/B on the real TPU (VERDICT r3 items #4/#5).

Variants, each batch-8 from the bundled developed Airfoil2D dataset:

  base        status quo (auto solver dispatch, no refinement)
  refine      pressure_refine_restarts=2 @ inner tol 3e-2 (linsolve.refined:
              residual-rescaled restarts + double-float accumulation)
  refine3     3 restarts @ inner 1e-2 (deeper, for the convergence question)
  xla         merged kernel disabled (pure XLA blockwise CG baseline)

Reports s/step, drag/lift parity, and the pressure convergence fraction +
worst residual -- the round-2 complaint was solves "ending by stagnation,
not convergence" at the declared tol 1e-7.

Run: python -u scripts/airfoil_perf_ab.py [--env-id Airfoil2D-easy-v0]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import replace as dreplace
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.ops import cg_pallas_mb

BATCH = 8


def measure(env_id: str, steps: int, *, refine=0, inner=3e-2,
            merged=None, agg=0) -> dict:
    if merged is not None:
        cg_pallas_mb.set_fused_cg_mb(merged)
    env = fluidgym_tpu.make(env_id, load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False,
                            episode_length=10**9)
    env.reset(seed=0)
    if refine:
        env._cfg = dreplace(env._cfg, pressure_refine_restarts=refine,
                            pressure_refine_inner_tol=inner)
    if agg:
        # aggregation 2-level pressure preconditioner (piso.py:
        # pressure_coarse_tile); E built host-side once, baked as constants
        from fluidgym_tpu.solver import piso

        env._cfg = dreplace(env._cfg, pressure_coarse_tile=agg,
                            pressure_coarse_precondition=True)
        env._jit_cache.clear()
        piso.ensure_agg_coarse_cache(env._state, env._geoms, env._topo,
                                     env._cfg)
    carry = env._pure_carry()
    fn = jax.jit(jax.vmap(env._pure_step))
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    a0 = jnp.zeros((BATCH,) + tuple(env.action_space.shape), jnp.float32)

    c, _, _, info = fn(bcarry, a0)   # warm-up + compile
    jax.block_until_ready(jax.tree.leaves(c)[0])
    conv, resid, drag, lift, iters = [], [], [], [], []
    t0 = time.perf_counter()
    for _ in range(steps):
        c, _, _, info = fn(c, a0)
        conv.append(np.asarray(info["pressure_converged"]))
        resid.append(np.asarray(info.get("pressure_residual", np.nan)))
        drag.append(np.asarray(info["drag"]))
        lift.append(np.asarray(info["lift"]))
        iters.append(np.asarray(info.get("pressure_iterations", 0)))
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / steps
    if merged is not None:
        cg_pallas_mb.set_fused_cg_mb('auto')
    return {
        "s_per_step": round(dt, 4),
        "env_steps_per_sec": round(BATCH / dt, 3),
        "converged_frac": round(float(np.mean(conv)), 4),
        "pressure_iters_per_step": round(float(np.mean(iters)), 1),
        "worst_residual": float(np.max(resid)),
        "mean_drag": round(float(np.mean(drag)), 5),
        "mean_lift": round(float(np.mean(lift)), 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="Airfoil2D-easy-v0")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--variants", nargs="*",
                    default=["base", "refine", "refine3", "xla"])
    args = ap.parse_args()

    recipes = {
        "base":    dict(),
        "refine":  dict(refine=2, inner=3e-2),
        "refine3": dict(refine=3, inner=1e-2),
        "xla":     dict(merged=False),
        "refine_xla": dict(refine=2, inner=3e-2, merged=False),
        "agg8":    dict(agg=8),
        "agg16":   dict(agg=16),
        "agg8_refine": dict(agg=8, refine=2, inner=3e-2),
    }
    out = {}
    for name in args.variants:
        t0 = time.time()
        out[name] = measure(args.env_id, args.steps, **recipes[name])
        print(f"{name}: {json.dumps(out[name])} "
              f"[total {time.time()-t0:.0f}s]", flush=True)
    print(json.dumps({"env_id": args.env_id, "batch": BATCH, **out}))


if __name__ == "__main__":
    main()
