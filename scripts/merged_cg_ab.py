"""A/B the merged-frame fused CG (ops/cg_pallas_mb.py) on the TPU.

Measures the flagship cylinder env at res24 (8-lane resident chunks) and
res56 (2-lane big-chunk regime) with the merged kernel ON vs OFF, batch 64,
from the developed bench asset -- the exact regime of bench.py.  Also checks
physics parity (mean cd over the measured window) between the two paths.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/merged_cg_ab.py
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
from fluidgym_tpu.ops import cg_pallas, cg_pallas_mb

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)
BATCH = 64
N_MEASURE = 6


def measure(res: int, fused: bool, env_id: str = "CylinderJet2D-easy-v0",
            asset: str | None = "cyl2d_res{res}_developed") -> dict:
    cg_pallas_mb.set_fused_cg_mb(True if fused else False)
    kw = dict(KW)
    if res is not None:
        kw["resolution"] = res
    if asset is None:
        # no developed bench asset: start from the bundled initial domain
        kw["load_initial_domain"] = True
    env = fluidgym_tpu.make(env_id, **kw)
    env.reset(seed=0)
    env._jit_cache.clear()
    if asset is not None:
        topo, _g, state = load_domain(
            REPO / "bench_assets" / asset.format(res=res), dtype=env._dtype)
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
        cds.append(info.get("drag", info.get("lift", _r)))
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / N_MEASURE
    cd = float(np.mean([np.asarray(x).mean() for x in cds]))
    iters = info.get("pressure_iterations")
    row = {
        "env_steps_per_sec": round(BATCH / dt, 2),
        "cd_mean": round(cd, 5),
    }
    if iters is not None:
        row["pressure_iters_last"] = float(jnp.mean(iters))
    conv = info.get("pressure_converged")
    if conv is not None:
        row["all_converged"] = bool(jnp.all(conv))
    del env
    return row


def main() -> None:
    out = {}
    cases = [("res24", dict(res=24)), ("res56", dict(res=56)),
             ("airfoil", dict(res=None, env_id="Airfoil2D-easy-v0",
                              asset=None))]
    for name, case_kw in cases:
        for fused in (False, True):
            key = f"{name}_{'fused' if fused else 'xla'}"
            try:
                out[key] = measure(fused=fused, **case_kw)
            except Exception as e:  # noqa: BLE001 - record and continue
                out[key] = {"error": f"{type(e).__name__}: {e}"}
            print(key, out[key], flush=True)
    for name in ("res24", "res56", "airfoil"):
        a = out.get(f"{name}_xla", {})
        b = out.get(f"{name}_fused", {})
        if "env_steps_per_sec" in a and "env_steps_per_sec" in b:
            out[f"{name}_speedup"] = round(
                b["env_steps_per_sec"] / a["env_steps_per_sec"], 3)
            out[f"{name}_cd_rel_diff"] = round(
                abs(b["cd_mean"] - a["cd_mean"]) / max(abs(a["cd_mean"]),
                                                       1e-9), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
