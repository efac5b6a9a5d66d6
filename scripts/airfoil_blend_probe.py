"""Root-cause probe for the Airfoil2D-medium episode contamination.

Evidence so far (round 4): the drag<=0 bursts in the bundled Re3000
episodes GROW with burn-in (train 16% -> test 43% at +20% burn-in), come
in multi-step runs in the second half of episodes, and attempt-0 repair
re-records reproduce them exactly -- a growing advective instability, not
an underdeveloped snapshot.  The cylinder family hit the same failure at
Re >= 500 and ships a Re-gated upwind blend (gamma=0.3,
cylinder_env_base.py; VALIDATION.md "Resolution (2026-08-18)"); the
airfoil family is central-only at Re up to 5000.

This probe marches the SAME bundled developed snapshot under
advection_upwind_blend in {0.0, 0.3} and compares drag traces: if the
blend removes the negative-drag bursts, the fix is the cylinder's
Re-gated blend (plus dataset regeneration), not more burn-in.

Run (CPU ok): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -u scripts/airfoil_blend_probe.py [steps] [mode_idx...]
"""
from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run(blend: float, steps: int, snap: str):
    import jax
    import jax.numpy as jnp

    import fluidgym_tpu

    env = fluidgym_tpu.make(
        "Airfoil2D-medium-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False,
        episode_length=10**9)
    env._load_domain_on_reset = False
    env._enable_actions = False
    env.reset(seed=0)
    mode, idx = snap.split("_")
    from fluidgym_tpu.types import EnvMode

    env.mode = EnvMode(mode)
    env.load_initial_domain(env.mode, int(idx))
    env.seed(0)
    env._cfg = replace(env._cfg, advection_upwind_blend=blend)
    env._sync_jit_cache()

    carry = env._pure_carry()
    fn = jax.jit(env._pure_step)
    a0 = jnp.zeros_like(env._zero_action)
    drags, lifts, conv = [], [], []
    t0 = time.perf_counter()
    for t in range(steps):
        carry, _, _, info = fn(carry, a0)
        drags.append(float(np.asarray(info["drag"])))
        lifts.append(float(np.asarray(info["lift"])))
        conv.append(float(np.asarray(info["pressure_converged"])))
        if (t + 1) % 10 == 0:
            log(f"  blend={blend} t={t + 1}/{steps} drag={drags[-1]:+.3f} "
                f"({(t + 1) / (time.perf_counter() - t0):.3f} steps/s)")
    d = np.asarray(drags)
    out = {
        "blend": blend,
        "snapshot": snap,
        "steps": steps,
        "neg_frac": float((d <= 0).mean()),
        "drag_mean": float(d.mean()),
        "drag_min": float(d.min()),
        "drag_max": float(d.max()),
        "lift_absmax": float(np.abs(lifts).max()),
        "converged_frac": float(np.mean(conv)),
        "drag_trace": [round(x, 4) for x in drags],
    }
    log(json.dumps({k: v for k, v in out.items() if k != "drag_trace"}))
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    snaps = sys.argv[2:] or ["train_00"]
    results = []
    for snap in snaps:
        for blend in (0.0, 0.3):
            results.append(run(blend, steps, snap))
    print(json.dumps({"probe": "airfoil_blend", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
