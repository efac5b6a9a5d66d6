"""TCF fidelity resolution study: Re_tau / u'+ / U+ vs grid resolution.

VERDICT round-1 weak #9: at 64^3 the LES sat at Re_tau 165-174 vs DNS 180 and
u'+ 2.92 vs 2.7.  This study runs the uncontrolled TCFSmall channel at
resolution_x_z in {64, 96} (y = res+1) and reports the wall-unit statistics
against the Torroja Re180 DNS profiles, using the full VelocityStats
recorder (mean/rms/shear + area-weighted L1 errors).

Run (TPU, long -- ~1-2 h per resolution):
  PYTHONPATH=/root/repo python -u scripts/tcf_resolution_study.py [res ...]
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
from fluidgym_tpu.envs.tcf.statistics import TCFAnalysis
from fluidgym_tpu.solver import sgs

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9,
          use_marl=False)
BURNIN = 400      # env steps; step_length default covers ~many ETT
N_STAT = 800
STRIDE = 4        # record every STRIDE-th step


def study(res: int) -> dict:
    env = fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0",
                            resolution_x_z=res, resolution_y=res + 1, **KW)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    carry = env._pure_carry()
    action = jnp.zeros_like(env._zero_action)

    t0 = time.time()
    for i in range(BURNIN):
        carry, *_ = fn(carry, action)
        if (i + 1) % 100 == 0:
            jax.block_until_ready(jax.tree.leaves(carry)[0])
            print(f"  res {res}: burn-in {i+1}/{BURNIN} "
                  f"({(i+1)/(time.time()-t0):.2f} steps/s)", flush=True)

    state = carry[0] if isinstance(carry, tuple) else carry
    geoms = env._geoms
    yc = np.asarray(jax.device_get(geoms[0].centers[1])).mean(axis=(0, 2))
    nu = float(np.asarray(state.viscosity))
    # spectra planes near y+ ~ 5 / 15 / 100 (nominal u_tau from env config)
    planes = sorted({env._get_y_obs_idx(yw) for yw in (5.0, 15.0, 100.0)})
    vs = TCFAnalysis(yc, nu, lengths=(env._D, env._L), psd_planes=planes,
                     budgets=True, temporal_corr=True)
    grad_fn = jax.jit(
        lambda st: sgs.velocity_gradients(st, env._geoms, env._topo)[0])

    for i in range(N_STAT):
        carry, *_ = fn(carry, action)
        if i % STRIDE == 0:
            st = carry[0] if isinstance(carry, tuple) else carry
            vs.record(st.blocks[0].velocity, st.blocks[0].pressure,
                      grad_fn(st), time=float(i) * env._step_length)
    jax.block_until_ready(jax.tree.leaves(carry)[0])

    prof = vs.stats.profiles()
    out = {
        "resolution": res,
        "Re_tau": round(vs.stats.Re_wall, 1),
        "u_tau": round(vs.stats.u_wall, 5),
        "u'+_max": round(float(prof["u'+"].max()), 3),
        "U+_centerline": round(float(prof["U+"][len(yc) // 2]), 2),
    }
    # DNS anchors (Torroja/KMM Re_tau=180; no .prof files bundled air-gapped)
    dns = {"Re_tau": 180.0, "u'+_max": 2.70, "U+_centerline": 18.3}
    out["dns_gap_pct"] = {
        k: round(100.0 * (out[k] - v) / v, 1) for k, v in dns.items()}
    stats_path = REPO / f"tcf_stats_res{res}"
    vs.save(stats_path)
    for plot in ("spectra", "budgets", "temporal_correlation"):
        try:
            getattr(vs, f"plot_{plot}")(REPO / f"tcf_{plot}_res{res}")
        except Exception as e:  # plots are best-effort on long TPU runs
            print(f"  plot {plot} failed: {e}", flush=True)
    out["stats_file"] = str(stats_path)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    resolutions = [int(a) for a in sys.argv[1:]] or [64, 96]
    for r in resolutions:
        study(r)
