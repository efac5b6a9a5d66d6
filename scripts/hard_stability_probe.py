"""Long-horizon stability probe for the hard-tier cylinder (Re 500, res 32).

The impulsive-start burn-in must stay finite through the reference's dataset
horizon (400 burn-in steps + 80 episode steps = t approx 120 at
step_length 0.25; reference cylinder_env_base.py:138).  Round-2 observation:
the default solver settings (pressure warm starts + deflation) develop a
growing shedding oscillation that blows up around t approx 55 at Re 500.
This script A/Bs candidate mitigations from the same impulsive start.

Usage: python scripts/hard_stability_probe.py [--res N] [--steps N] [variant ...]
(--res overrides the grid resolution: the instability reproduces faster on
coarser grids, letting remedy variants be screened cheaply on CPU.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO / 'scripts'))

import _heartbeat  # noqa: E402

_heartbeat.start()

import numpy as np

VARIANTS = {
    # name -> SimConfig field overrides; warm/deflation pinned explicitly so
    # variants mean the same thing regardless of the env's (Reynolds-gated)
    # defaults
    "default": {},
    "warm": {"pressure_warm_start": True, "pressure_deflation": True},
    "cold": {"pressure_warm_start": False, "pressure_deflation": False},
    # pure coarse (deflation) starts each solve: no cross-substep inheritance
    "deflation_only": {"pressure_warm_start": False,
                       "pressure_deflation": True},
    "tol6": {"pressure_warm_start": True, "pressure_deflation": True,
             "pressure_tol": 1e-6},
    "cfl4": {"adaptive_cfl": 0.4},
    "cold_cfl4": {"pressure_warm_start": False, "pressure_deflation": False,
                  "adaptive_cfl": 0.4},
    "cfl4_warm": {"pressure_warm_start": True, "pressure_deflation": True,
                  "adaptive_cfl": 0.4},
    # diagnostic only (drops the non-orthogonal coupling entirely; not a
    # shippable configuration on this grid)
    "no_nonortho": {"non_orthogonal": False},
    # inner deferred non-ortho passes: control the lag error the pressure
    # tolerance cannot see (cold cross-substep starts to isolate the effect)
    "nonortho2": {"pressure_warm_start": False, "pressure_deflation": False,
                  "pressure_non_ortho_steps": 2},
    "nonortho3": {"pressure_warm_start": False, "pressure_deflation": False,
                  "pressure_non_ortho_steps": 3},
    "nonortho2_warm": {"pressure_warm_start": True,
                       "pressure_deflation": True,
                       "pressure_non_ortho_steps": 2},
    # multigrid-preconditioned CG: reaches tolerances Jacobi-CG stalls on
    # (the conv=False stalls appear right before the hard-tier blow-up)
    "mg_cold": {"pressure_warm_start": False, "pressure_deflation": False,
                "pressure_multigrid": True},
    "tol6_nonortho2": {"pressure_warm_start": False,
                       "pressure_deflation": False,
                       "pressure_tol": 1e-6,
                       "pressure_non_ortho_steps": 2},
    # FULL non-orthogonal pressure solve (flux-form cross terms inside the
    # BiCGStab matvec; no deferred-iterate lag): strictly stronger than the
    # reference's NON_ORTHO_*_MATRIX mode, whose corner-form assembly
    # measures indefinite on the O-grid (see solver/piso.py docstring)
    "full": {"pressure_warm_start": False, "pressure_deflation": False,
             "pressure_non_ortho_full": True},
    "full_warm": {"pressure_warm_start": True, "pressure_deflation": False,
                  "pressure_non_ortho_full": True},
    # upwind-blended velocity advection (the fix that works: the Re-500
    # blow-up is the central scheme's cell-Peclet oscillation, not the
    # pressure treatment); warm+deflation kept as in the default config
    "upwind02": {"pressure_warm_start": True, "pressure_deflation": True,
                 "advection_upwind_blend": 0.2},
    "upwind03": {"pressure_warm_start": True, "pressure_deflation": True,
                 "advection_upwind_blend": 0.3},
    "upwind05": {"pressure_warm_start": True, "pressure_deflation": True,
                 "advection_upwind_blend": 0.5},
    # explicit central scheme (gamma=0): since the Re-gated env default now
    # ships blend 0.3 on the hard tier, bounding the blend's numerical-
    # diffusion bias (VERDICT r4 weak #3) needs a central arm that runs in
    # its pre-blow-up window at matched resolution
    "central": {"pressure_warm_start": True, "pressure_deflation": True,
                "advection_upwind_blend": 0.0},
}

N_STEPS = 520  # t = 130 at step_length 0.25: past burn-in + episode horizon


def run_variant(name: str, overrides: dict, res: int | None = None,
                n_steps: int = N_STEPS,
                env_id: str = "CylinderJet2D-hard-v0") -> dict:
    import fluidgym_tpu
    from fluidgym_tpu.envs.cylinder.cylinder_env_base import CylinderEnvBase

    orig = CylinderEnvBase._get_simulation

    def patched(self):
        return dataclasses.replace(orig(self), **overrides)

    kw = {} if res is None else {"resolution": res}
    CylinderEnvBase._get_simulation = patched
    try:
        env = fluidgym_tpu.make(
            env_id, load_initial_domain=False,
            load_domain_statistics=False, randomize_initial_state=False,
            episode_length=10 ** 9, **kw)
        env.reset(seed=0)
        act = np.zeros(env.action_space.shape, np.float32)
        drag_series = []
        t0 = time.perf_counter()
        for t in range(1, n_steps + 1):
            try:
                _, _, _, _, info = env.step(act)
            except FloatingPointError as e:
                # the env's solver-health guard (LinsolveError analogue)
                print(f"  [{name}] t={t * env.step_length:.1f} "
                      f"solver-health abort: {e}", flush=True)
                return {"variant": name, "stable": False,
                        "blowup_t": t * env.step_length,
                        "abort": "solver_health",
                        "steps_per_sec": t / (time.perf_counter() - t0)}
            drag = float(np.asarray(info["drag"]).mean())
            drag_series.append(drag)
            finite = np.isfinite(drag)
            if t % 40 == 0 or not finite:
                print(f"  [{name}] t={t * env.step_length:.1f} drag={drag:.4f}"
                      f" conv={bool(np.asarray(info['pressure_converged']).all())}"
                      f" ({t / (time.perf_counter() - t0):.2f} steps/s)",
                      flush=True)
            if not finite or abs(drag) > 100.0:
                return {"variant": name, "stable": False,
                        "blowup_t": t * env.step_length,
                        "steps_per_sec": t / (time.perf_counter() - t0)}
        tail = np.asarray(drag_series[-160:])
        return {"variant": name, "stable": True,
                "final_t": n_steps * env.step_length,
                "cd_mean_tail": float(tail.mean()),
                "cd_rms_tail": float(tail.std()),
                "steps_per_sec": n_steps / (time.perf_counter() - t0)}
    finally:
        CylinderEnvBase._get_simulation = orig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--steps", type=int, default=N_STEPS)
    ap.add_argument("--env-id", default="CylinderJet2D-hard-v0")
    args = ap.parse_args()
    names = args.variants or list(VARIANTS)
    results = []
    for name in names:
        print(f"=== variant {name}: {VARIANTS[name]}"
              f" res={args.res or 'default'} ===", flush=True)
        results.append(run_variant(name, VARIANTS[name], res=args.res,
                                   n_steps=args.steps, env_id=args.env_id))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
