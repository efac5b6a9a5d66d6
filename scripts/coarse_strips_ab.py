"""A/B the in-kernel strip-coarse preconditioner on the TPU flagship.

Three arms at res 56, batch 64, developed flow (bench regime, merged
resident kernel active in all arms):
  - baseline: Jacobi-only resident CG
  - strips:   SimConfig.pressure_coarse_strips=True
  - loose:    pressure_tol=1e-2 (pressure nearly free) -- upper bound on
              what ANY pressure-solver speedup can deliver (share probe)

Run (TPU): PYTHONPATH=/root/repo python -u scripts/coarse_strips_ab.py
"""

from __future__ import annotations

import dataclasses
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
from fluidgym_tpu.core.domain_io import load_domain

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)
BATCH = 64
N_MEASURE = 6
RES = 56


def measure(**cfg_overrides) -> dict:
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=RES, **KW)
    env.reset(seed=0)
    if cfg_overrides:
        env._cfg = dataclasses.replace(env._cfg, **cfg_overrides)
    topo, _g, state = load_domain(
        REPO / "bench_assets" / f"cyl2d_res{RES}_developed", dtype=env._dtype)
    assert topo == env._topo
    env._state = state
    carry = env._pure_carry()
    fn = jax.jit(jax.vmap(env._pure_step))
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    rng = np.random.default_rng(0)
    c = bcarry
    for _ in range(3):
        a = jnp.asarray(rng.uniform(-1, 1, (BATCH, 1)), jnp.float32)
        c, *_ = fn(c, a)
    a0 = jnp.zeros((BATCH, 1), jnp.float32)
    c, *_ = fn(c, a0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    t0 = time.perf_counter()
    cds = []
    for _ in range(N_MEASURE):
        c, _obs, _r, info = fn(c, a0)
        cds.append(info["drag"])
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / N_MEASURE
    row = {
        "env_steps_per_sec": round(BATCH / dt, 2),
        "cd_mean": round(float(np.mean([np.asarray(x).mean()
                                        for x in cds])), 5),
        "pressure_iters_last": round(float(jnp.mean(
            info["pressure_iterations"])), 1),
        "all_converged": bool(jnp.all(info["pressure_converged"])),
    }
    del env
    return row


def main() -> None:
    out = {}
    for name, overrides in [
        ("baseline", {}),
        ("strips", {"pressure_coarse_strips": True}),
        ("loose_tol", {"pressure_tol": 1e-2}),
    ]:
        try:
            out[name] = measure(**overrides)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, out[name], flush=True)
    a = out.get("baseline", {})
    b = out.get("strips", {})
    c = out.get("loose_tol", {})
    if "env_steps_per_sec" in a:
        if "env_steps_per_sec" in b:
            out["strips_speedup"] = round(
                b["env_steps_per_sec"] / a["env_steps_per_sec"], 3)
        if "env_steps_per_sec" in c:
            # fraction of step time spent in pressure solves (upper bound)
            out["pressure_share_est"] = round(
                1 - a["env_steps_per_sec"] / c["env_steps_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
