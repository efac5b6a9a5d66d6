"""A/B extrapolated pressure warm starts (SimConfig.pressure_extrapolate)
on the TPU flagship: res 56 and res 24, batch 64, developed flow.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/extrap_ab.py
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


def measure(res: int, extrap: bool) -> dict:
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=res, **KW)
    env.reset(seed=0)
    env._cfg = dataclasses.replace(env._cfg, pressure_extrapolate=extrap)
    topo, _g, state = load_domain(
        REPO / "bench_assets" / f"cyl2d_res{res}_developed", dtype=env._dtype)
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
    cds, its = [], []
    for _ in range(N_MEASURE):
        c, _obs, _r, info = fn(c, a0)
        cds.append(info["drag"])
        its.append(info["pressure_iterations"])
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / N_MEASURE
    row = {
        "env_steps_per_sec": round(BATCH / dt, 2),
        "cd_mean": round(float(np.mean([np.asarray(x).mean()
                                        for x in cds])), 5),
        "pressure_iters_mean": round(float(np.mean(
            [np.asarray(x).mean() for x in its])), 1),
        "all_converged": bool(jnp.all(info["pressure_converged"])),
    }
    del env
    return row


def main() -> None:
    out = {}
    for res in (56, 24):
        for extrap in (False, True):
            key = f"res{res}_{'extrap' if extrap else 'plain'}"
            try:
                out[key] = measure(res, extrap)
            except Exception as e:  # noqa: BLE001
                out[key] = {"error": f"{type(e).__name__}: {e}"}
            print(key, out[key], flush=True)
        a, b = out.get(f"res{res}_plain", {}), out.get(f"res{res}_extrap", {})
        if "env_steps_per_sec" in a and "env_steps_per_sec" in b:
            out[f"res{res}_speedup"] = round(
                b["env_steps_per_sec"] / a["env_steps_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
