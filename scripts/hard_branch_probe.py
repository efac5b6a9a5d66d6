"""Branching stability probe for the hard-tier cylinder (Re 500, res 32).

Phase 1 (``--base``): replay the default-config uncontrolled trajectory from
the impulsive start to just before the observed t~55 blow-up and pickle the
EnvState snapshot.  Phase 2 (``--branch NAME``): restore the snapshot under a
variant solver config and integrate on, watching the drag series — a variant
that saturates the shedding oscillation instead of blowing up is a fix
candidate.

Background: the reference cold-starts every pressure solve (its
``pressure_reuse_result`` only reuses within one substep's non-orthogonal
corrector loop, PISOtorch_simulation.py:1383 ``pstep == 0`` → x=None), while
our cylinder envs carry the previous pressure across substeps
(pressure_warm_start + deflation).  The low-frequency error such warm starts
inherit is invisible to the residual criterion and accumulates; at Re 500 the
physical damping is too weak to absorb it.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pickle
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

SNAP = Path("/tmp/hard_base_snapshot.pkl")
BASE_STEPS = 170  # t = 42.5: growing oscillation, still well before blow-up

VARIANTS = {
    # every field pinned explicitly so variants mean the same thing
    # regardless of the env's (Reynolds-gated) defaults
    "control": {"pressure_warm_start": True, "pressure_deflation": True},
    "cold": {"pressure_warm_start": False, "pressure_deflation": False},
    "deflation_only": {"pressure_warm_start": False,
                       "pressure_deflation": True},
    "tol6": {"pressure_warm_start": True, "pressure_deflation": True,
             "pressure_tol": 1e-6},
    # upwind-blended velocity advection (stencil.build_advection_ops):
    # bounded stabilization for the Re-500 cell-Peclet oscillation
    "upwind1": {"pressure_warm_start": True, "pressure_deflation": True,
                "advection_upwind_blend": 1.0},
    "upwind05": {"pressure_warm_start": True, "pressure_deflation": True,
                 "advection_upwind_blend": 0.5},
    "upwind02": {"pressure_warm_start": True, "pressure_deflation": True,
                 "advection_upwind_blend": 0.2},
    # full non-orthogonal pressure solve (no deferred lag) on top of upwind
    "upwind05_full": {"pressure_warm_start": False,
                      "pressure_deflation": False,
                      "advection_upwind_blend": 0.5,
                      "pressure_non_ortho_full": True},
}


def make_env(overrides: dict):
    import fluidgym_tpu
    from fluidgym_tpu.envs.cylinder.cylinder_env_base import CylinderEnvBase

    orig = CylinderEnvBase._get_simulation

    def patched(self):
        return dataclasses.replace(orig(self), **overrides)

    # the env re-derives its SimConfig from _get_simulation() on EVERY
    # reset/set_state/load (fluid_env.py:500,632,749), so the patch must stay
    # installed for the process lifetime -- one variant per process
    CylinderEnvBase._get_simulation = patched
    return fluidgym_tpu.make(
        "CylinderJet2D-hard-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False,
        episode_length=10 ** 9)


def roll(env, n_steps: int, label: str, log_every: int = 10):
    act = np.zeros(env.action_space.shape, np.float32)
    drags = []
    t0 = time.perf_counter()
    for t in range(1, n_steps + 1):
        try:
            _, _, _, _, info = env.step(act)
        except FloatingPointError as e:
            print(f"  [{label}] +{t} solver-health abort: {e}", flush=True)
            return drags, False
        drag = float(np.asarray(info["drag"]).mean())
        drags.append(drag)
        if t % log_every == 0 or not np.isfinite(drag):
            print(f"  [{label}] +{t} drag={drag:.4f} "
                  f"({t / (time.perf_counter() - t0):.2f} steps/s)", flush=True)
        if not np.isfinite(drag) or abs(drag) > 100.0:
            return drags, False
    return drags, True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", action="store_true")
    ap.add_argument("--branch", choices=sorted(VARIANTS))
    ap.add_argument("--steps", type=int, default=350)
    args = ap.parse_args()

    import jax

    if args.base:
        env = make_env({})
        env.reset(seed=0)
        drags, ok = roll(env, BASE_STEPS, "base")
        assert ok, "base trajectory blew up before the snapshot point"
        snap = jax.device_get(env.get_state())
        with open(SNAP, "wb") as f:
            pickle.dump({"state": snap, "drags": drags}, f)
        print(json.dumps({"base": "saved", "steps": BASE_STEPS,
                          "last_drag": drags[-1]}))
        return

    overrides = VARIANTS[args.branch]
    print(f"=== branch {args.branch}: {overrides} ===", flush=True)
    env = make_env(overrides)
    env.reset(seed=0)  # builds sim machinery; state replaced below
    with open(SNAP, "rb") as f:
        snap = pickle.load(f)
    env.set_state(snap["state"])
    drags, ok = roll(env, args.steps, args.branch)
    tail = np.asarray(drags[-120:]) if ok else None
    print(json.dumps({
        "branch": args.branch, "stable": ok,
        "steps_run": len(drags),
        "blowup_t": None if ok else (BASE_STEPS + len(drags)) * 0.25,
        "cd_mean_tail": None if tail is None else float(tail.mean()),
        "cd_rms_tail": None if tail is None else float(tail.std()),
    }))


if __name__ == "__main__":
    main()
