"""Benchmark: batched RBC2D env physics steps/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flagship measurement for round 1: full-fidelity RBC2D-easy environment
physics (96x61 wall-refined grid, dt=0.05, step_length=1.0 => 20 adaptive
PISO steps with 2 pressure corrections each, pressure tol 1e-5), batch 64 via
vmap on one TPU chip.

``vs_baseline``: the BASELINE.md north-star is ">=50x CPU-reference env
steps/sec".  The CUDA/torch reference cannot run here, so the denominator is
this framework's own single-env CPU throughput (same physics, same JAX code on
the host CPU backend) times 50: vs_baseline >= 1.0 means the 50x-over-CPU
target is met.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _build(batch: int | None, device):
    import jax
    import jax.numpy as jnp

    from fluidgym_tpu.solver.piso import single_step

    import __graft_entry__ as ge

    # full-size RBC2D-easy physics: n_heaters=12, resolution=8 -> 96 x 61
    topo, geoms, state, cfg, _ = ge._tiny_rbc(n_heaters=12, resolution=8)
    from dataclasses import replace as dreplace

    cfg = dreplace(cfg, substeps=-1, adaptive_cfl=0.8)  # ADAPTIVE like the env
    hooks = ge._buoyancy_hooks()
    n_sim_steps = 20  # step_length / dt

    geoms = jax.device_put(geoms, device)

    def env_step(s):
        def body(ss, _):
            return single_step(ss, geoms, topo, cfg, hooks), None

        out, _ = jax.lax.scan(body, s, None, length=n_sim_steps)
        return out

    if batch is None:
        fn = jax.jit(env_step, device=device)
        st = jax.device_put(state, device)
    else:
        fn = jax.jit(jax.vmap(env_step), device=device)
        st = jax.device_put(
            jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state),
            device,
        )
    return fn, st


def _measure(fn, state, n_iters: int) -> float:
    import jax

    state = fn(state)  # compile + warmup
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    import jax

    batch = 64
    accel = jax.devices()[0]
    fn, st = _build(batch, accel)
    dt_accel = _measure(fn, st, n_iters=3)
    steps_per_sec = batch / dt_accel

    try:
        cpu = jax.devices("cpu")[0]
        fn_cpu, st_cpu = _build(None, cpu)
        dt_cpu = _measure(fn_cpu, st_cpu, n_iters=1)
        cpu_steps_per_sec = 1.0 / dt_cpu
        vs_baseline = steps_per_sec / (50.0 * cpu_steps_per_sec)
    except Exception:
        vs_baseline = float("nan")

    print(json.dumps({
        "metric": "rbc2d_env_steps_per_sec_batch64",
        "value": round(float(steps_per_sec), 3),
        "unit": "env_steps/s",
        "vs_baseline": round(float(vs_baseline), 3),
    }))


if __name__ == "__main__":
    main()
