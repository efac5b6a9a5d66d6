"""Batched-64 cylinder throughput at developed flow for a tolerance/warm-start
sweep (identical development protocol per setting)."""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


import fluidgym_tpu

ENV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=10**9,
)


def develop(warm, tol):
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", step_length=0.05, **ENV_KW)
    orig = env._get_simulation
    over = dict(pressure_warm_start=(warm is not False),
                pressure_deflation=(warm == "warmdefl"))
    if tol is not None:
        over["pressure_tol"] = tol
    env._get_simulation = lambda: dataclasses.replace(orig(), **over)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    for _ in range(600):  # t = 30: shedding developed
        state, *_ = fn(state, action)
    jax.block_until_ready(state)
    return env, state


def measure(warm, tol):
    env, state = develop(warm, tol)
    env2 = fluidgym_tpu.make("CylinderJet2D-easy-v0", **ENV_KW)
    orig2 = env2._get_simulation
    over = dict(pressure_warm_start=(warm is not False),
                pressure_deflation=(warm == "warmdefl"))
    if tol is not None:
        over["pressure_tol"] = tol
    env2._get_simulation = lambda: dataclasses.replace(orig2(), **over)
    env2.reset(seed=0)
    bstate = jax.tree.map(lambda a: jnp.broadcast_to(a, (64,) + a.shape), state)
    bact = jnp.zeros((64, 1), jnp.float32)
    bfn = jax.jit(jax.vmap(env2._pure_step))
    bstate, *_ = bfn(bstate, bact)
    jax.block_until_ready(bstate)
    t0 = time.time()
    for _ in range(8):
        bstate, *rest = bfn(bstate, bact)
    jax.block_until_ready(bstate)
    dt_b = (time.time() - t0) / 8
    d = np.asarray(rest[-1]["drag"])
    print(f"warm={warm} tol={tol}: batch64 {dt_b*1e3:.0f}ms = "
          f"{64/dt_b:.1f} env-steps/s  drag={d.mean():.4f} "
          f"finite={np.isfinite(d).all()}", flush=True)


if __name__ == "__main__":
    for warm, tol in [("warmdefl", 5e-6)]:
        measure(warm, tol)
