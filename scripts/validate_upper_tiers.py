"""Physics validation of the upper-difficulty tiers (VERDICT r3 item #3).

Runs each requested tier FROM ITS BUNDLED DATASET SNAPSHOT (so validation
covers exactly the states users train from) and reports tier-appropriate
physics:

* TCF medium/hard (Re_tau 330/550): wall-unit statistics (realized Re_tau,
  peak u'+, centerline U+) vs literature DNS anchors -- interpolated from
  Moser-Kim-Mansour (1999) Re_tau 180/395/590 and Hoyas-Jimenez (2006)
  Re_tau 550 since the Torroja .prof files are not bundled air-gapped.
* Airfoil2D-hard (Re 5000) / Airfoil3D / CylinderJet3D medium/hard:
  stability over an episode horizon -- finite fields, pressure convergence
  fraction, and drag/lift ranges.

Usage:  python -u scripts/validate_upper_tiers.py TCFSmall3D-bottom-medium-v0
        python -u scripts/validate_upper_tiers.py Airfoil2D-hard-v0 --steps 100
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import _heartbeat  # noqa: E402

_heartbeat.start()

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu

# interpolated literature anchors (shared with validate_tcf_snapshots.py);
# tolerance is the coarse-LES band established by the round-2 resolution study
from _tcf_anchors import DNS_ANCHORS  # noqa: E402


def tcf_tier(env_id: str, burnin: int, n_stat: int) -> dict:
    from fluidgym_tpu.envs.tcf.statistics import TCFAnalysis
    from fluidgym_tpu.types import EnvMode

    # Construct the env and the jitted program EXACTLY as the dataset
    # generator does (scripts/generate_datasets.py: same make() kwargs,
    # jax.jit(jax.vmap(env._pure_step)) over 2 lanes) so the step hits the
    # persistent compile cache -- the unbatched _pure_step is a different
    # HLO whose fresh compile stalled >30 min on the axon path (session
    # notes, 2026-08-19).  Lanes start from the bundled TRAIN snapshots,
    # i.e. the states users train from.
    env = fluidgym_tpu.make(env_id, load_initial_domain=False,
                            load_domain_statistics=False, use_marl=False)
    env._load_domain_on_reset = False
    env._enable_actions = False
    env.reset(seed=0)
    carries = []
    for idx in (0, 1):
        try:
            env.load_initial_domain(EnvMode.TRAIN, idx)
        except FileNotFoundError:
            # reset explicitly: without this the lane would silently reuse
            # whatever state the PREVIOUS load left in the env, degenerating
            # the ensemble to duplicated trajectories
            env.reset(seed=idx)
            print(f"  (no bundled TRAIN_{idx:02d} snapshot; lane starts "
                  f"from the built-in initial state)", flush=True)
        carries.append(env._pure_carry())
    nlanes = len(carries)
    bcarry = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *carries)
    bact = jnp.broadcast_to(env._zero_action,
                            (nlanes,) + env._zero_action.shape)
    fn = jax.jit(jax.vmap(env._pure_step))
    t0 = time.time()
    for i in range(burnin):
        bcarry, *_ = fn(bcarry, bact)
        if (i + 1) % 100 == 0:
            jax.block_until_ready(jax.tree.leaves(bcarry)[0])
            print(f"  burn-in {i + 1}/{burnin} "
                  f"({(i + 1) / (time.time() - t0):.2f} steps/s)", flush=True)

    state = bcarry[0] if isinstance(bcarry, tuple) else bcarry
    geoms = env._geoms
    yc = np.asarray(jax.device_get(geoms[0].centers[1])).mean(axis=(0, 2))
    nu = float(np.asarray(state.viscosity).ravel()[0])
    # budgets are off in TCFAnalysis, so velocity gradients would be
    # discarded by record() -- skip computing them entirely
    vs = TCFAnalysis(yc, nu, lengths=(env._D, env._L))
    for i in range(n_stat):
        bcarry, *_ = fn(bcarry, bact)
        if i % 4 == 0:
            st = bcarry[0] if isinstance(bcarry, tuple) else bcarry
            vel = jax.device_get(st.blocks[0].velocity)
            pres = jax.device_get(st.blocks[0].pressure)
            for lane in range(nlanes):
                vs.record(vel[lane], pres[lane],
                          time=float(i) * env._step_length)
    jax.block_until_ready(jax.tree.leaves(bcarry)[0])

    prof = vs.stats.profiles()
    nominal = int(env._re_wall) if hasattr(env, "_re_wall") else 0
    out = {
        "env_id": env_id,
        "Re_tau_realized": round(vs.stats.Re_wall, 1),
        "u'+_max": round(float(prof["u'+"].max()), 3),
        "U+_centerline": round(float(prof["U+"][len(yc) // 2]), 2),
    }
    anchors = DNS_ANCHORS.get(nominal)
    if anchors is None and nominal:
        out["note"] = f"no anchor for nominal Re_tau {nominal}"
    if anchors:
        out["Re_tau_nominal"] = nominal
        out["dns_gap_pct"] = {
            "Re_tau": round(
                100.0 * (out["Re_tau_realized"] - nominal) / nominal, 1),
            **{k: round(100.0 * (out[k] - v) / v, 1)
               for k, v in anchors.items()},
        }
    return out


def stability_tier(env_id: str, steps: int) -> dict:
    env = fluidgym_tpu.make(env_id, episode_length=10**9,
                            load_domain_statistics=False)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    carry = env._pure_carry()
    a0 = jnp.zeros(tuple(env.action_space.shape), jnp.float32)
    metrics = {m: [] for m in env.metrics}
    conv = []
    t0 = time.time()
    for i in range(steps):
        carry, obs, _r, info = fn(carry, a0)
        for m in metrics:
            metrics[m].append(float(np.asarray(info[m]).mean()))
        if "pressure_converged" in info:
            conv.append(float(np.asarray(info["pressure_converged"]).all()))
        if (i + 1) % 20 == 0:
            jax.block_until_ready(jax.tree.leaves(carry)[0])
            print(f"  {env_id}: {i + 1}/{steps} "
                  f"({(i + 1) / (time.time() - t0):.2f} steps/s)", flush=True)
    st = carry[0] if isinstance(carry, tuple) else carry
    finite = all(bool(np.isfinite(np.asarray(b.velocity)).all())
                 for b in st.blocks)
    out = {"env_id": env_id, "steps": steps, "fields_finite": finite,
           "s_per_step": round((time.time() - t0) / steps, 3)}
    if conv:
        out["pressure_converged_frac"] = round(float(np.mean(conv)), 4)
    for m, vals in metrics.items():
        v = np.asarray(vals)
        out[m] = {"mean": round(float(v.mean()), 4),
                  "min": round(float(v.min()), 4),
                  "max": round(float(v.max()), 4),
                  "finite": bool(np.isfinite(v).all())}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_ids", nargs="+")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--burnin", type=int, default=200)
    ap.add_argument("--n-stat", type=int, default=600)
    args = ap.parse_args()
    for env_id in args.env_ids:
        if "TCF" in env_id:
            out = tcf_tier(env_id, args.burnin, args.n_stat)
        else:
            out = stability_tier(env_id, args.steps)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
