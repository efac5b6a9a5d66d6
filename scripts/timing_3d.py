"""Per-step timing of the heavy envs at current defaults (TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


import fluidgym_tpu

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)


def time_env(env_id, n_warm, n_meas, metric, **kw):
    t0 = time.time()
    env = fluidgym_tpu.make(env_id, **KW, **kw)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    try:
        state = (env._state, env._last_control)
    except AttributeError:
        state = env._state
    action = jnp.zeros_like(env._zero_action)
    state, *_ = fn(state, action)
    jax.block_until_ready(state)
    print(f"{env_id}: reset+compile {time.time()-t0:.0f}s", flush=True)
    for i in range(n_warm):
        state, *rest = fn(state, action)
    jax.block_until_ready(state)
    t0 = time.time()
    for i in range(n_meas):
        state, *rest = fn(state, action)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / n_meas
    m = float(np.asarray(rest[-1][metric]).reshape(-1)[0])
    print(f"{env_id}: {dt*1e3:.0f} ms/env-step  {metric}={m:.4f} "
          f"finite={np.isfinite(m)}", flush=True)


if __name__ == "__main__":
    time_env("CylinderJet3D-easy-v0", 20, 10, "drag")
    time_env("Airfoil2D-easy-v0", 30, 10, "drag")
    time_env("TCFLarge3D-bottom-easy-v0", 10, 10, "wall_stress_bottom",
             use_marl=False)
