"""Generate the developed-flow snapshots bench.py measures from.

The benchmark must time the numerator (TPU batch) and denominator (CPU
single-env) at the SAME developed-flow state -- measuring the CPU at the
cheap near-reset transient inflates the ratio dishonestly (round-1 verdict).
This script develops the 2D cylinder to t~=25 (past shedding onset) at the
flagship (res 24) and 256^2-equivalent (res 56, ~70k cells vs 256^2=65k)
resolutions and stores one snapshot each under bench_assets/.

Run on the TPU: PYTHONPATH=/root/repo python scripts/make_bench_assets.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ASSETS = REPO / "bench_assets"


def develop(resolution: int, t_target: float = 25.0) -> None:
    import jax
    import jax.numpy as jnp

    import fluidgym_tpu
    from fluidgym_tpu.core.domain_io import save_domain

    out = ASSETS / f"cyl2d_res{resolution}_developed"
    if out.with_suffix(".npz").exists():
        print(f"{out} exists; skipping", flush=True)
        return

    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=resolution,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=10**9,
        step_length=0.05, dt=0.01,
    )
    env.reset(seed=0)
    step = jax.jit(env._pure_step)
    carry = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    n_calls = int(round(t_target / 0.05))
    t0 = time.perf_counter()
    for i in range(n_calls):
        carry, *_ = step(carry, action)
        if (i + 1) % 100 == 0:
            jax.block_until_ready(carry[0].blocks[0].velocity)
            print(f"res{resolution}: t={(i + 1) * 0.05:.1f}/{t_target} "
                  f"({(i + 1) / (time.perf_counter() - t0):.1f} calls/s)",
                  flush=True)
    jax.block_until_ready(carry[0].blocks[0].velocity)
    env._set_pure_carry(jax.device_get(carry))
    save_domain(env._topo, env._geoms, env._state, out)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    import jax

    ASSETS.mkdir(exist_ok=True)
    for res in (24, 56):
        develop(res)
