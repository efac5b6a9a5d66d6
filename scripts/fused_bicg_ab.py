"""A/B the merged-frame fused BiCGStab (ops/cg_pallas_mb.fused_bicgstab_mb)
on the TPU.

The merged resident CG already serves the pressure solves (8.3x at res 56);
the ADVECTION BiCGStab solve is the remaining Krylov loop on the
HBM-streaming XLA path.  This measures the flagship cylinder env with the
merged BiCGStab routed in vs the XLA loop (merged CG stays ON in both arms
— the A/B isolates the advection-solve change), batch 64, developed-flow
assets, plus physics parity (mean cd).

Run (TPU): PYTHONPATH=/root/repo python -u scripts/fused_bicg_ab.py
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
from fluidgym_tpu.core.domain_io import load_domain
from fluidgym_tpu.ops import cg_pallas_mb

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)
BATCH = 64
N_MEASURE = 6


def measure(res: int, fused_bicg: bool) -> dict:
    cg_pallas_mb.set_fused_bicg_mb("auto" if fused_bicg else False)
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=res, **KW)
    env.reset(seed=0)
    env._jit_cache.clear()
    topo, _g, state = load_domain(
        REPO / "bench_assets" / f"cyl2d_res{res}_developed", dtype=env._dtype)
    assert topo == env._topo
    env._state = state
    carry = env._pure_carry()
    fn = jax.jit(jax.vmap(env._pure_step))
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    n_act = int(np.prod(env.action_space.shape)) or 1
    rng = np.random.default_rng(0)
    c = bcarry
    for _ in range(3):  # decorrelate lanes + compile
        a = jnp.asarray(rng.uniform(-1, 1, (BATCH, n_act)), jnp.float32)
        c, *_ = fn(c, a)
    a0 = jnp.zeros((BATCH, n_act), jnp.float32)
    c, *rest = fn(c, a0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    t0 = time.perf_counter()
    cds = []
    for _ in range(N_MEASURE):
        c, _obs, _r, info = fn(c, a0)
        cds.append(info["drag"])
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / N_MEASURE
    cd = float(np.mean([np.asarray(x).mean() for x in cds]))
    row = {
        "env_steps_per_sec": round(BATCH / dt, 2),
        "cd_mean": round(cd, 5),
    }
    conv = info.get("advection_converged", info.get("pressure_converged"))
    if conv is not None:
        row["all_converged"] = bool(jnp.all(conv))
    del env
    cg_pallas_mb.set_fused_bicg_mb(False)
    return row


def main() -> None:
    out = {}
    for res in (24, 56):
        for fused in (False, True):
            key = f"res{res}_{'bicg_fused' if fused else 'bicg_xla'}"
            try:
                out[key] = measure(res, fused)
            except Exception as e:  # noqa: BLE001 - record and continue
                out[key] = {"error": f"{type(e).__name__}: {e}"}
            print(key, out[key], flush=True)
    for res in (24, 56):
        a = out.get(f"res{res}_bicg_xla", {})
        b = out.get(f"res{res}_bicg_fused", {})
        if "env_steps_per_sec" in a and "env_steps_per_sec" in b:
            out[f"res{res}_speedup"] = round(
                b["env_steps_per_sec"] / a["env_steps_per_sec"], 3)
            out[f"res{res}_cd_rel_diff"] = round(
                abs(b["cd_mean"] - a["cd_mean"]) / max(abs(a["cd_mean"]),
                                                       1e-9), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
