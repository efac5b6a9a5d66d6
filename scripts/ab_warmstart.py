"""A/B pressure warm-start on the cylinder: stability through the impulsive
transient + single-env and batched throughput at developed flow."""

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


def make_env(warm, step_length):
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", step_length=step_length,
                            **ENV_KW)
    orig = env._get_simulation
    env._get_simulation = lambda: dataclasses.replace(
        orig(), pressure_warm_start=warm)
    return env


def run(warm):
    env = make_env(warm, 0.05)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    drags = []
    t0 = time.time()
    for i in range(400):
        state, obs, rew, info = fn(state, action)
        if i % 50 == 49:
            d = float(np.asarray(info["drag"]))
            drags.append(d)
            print(f"warm={warm} step={i+1} t={(i+1)*0.05:.1f} drag={d:.4f}",
                  flush=True)
            if not np.isfinite(d):
                print(f"warm={warm}: DIVERGED", flush=True)
                return None
    jax.block_until_ready(state)
    wall = time.time() - t0
    print(f"warm={warm}: 400 steps in {wall:.1f}s "
          f"({wall/400*1e3:.1f} ms/step incl compile)", flush=True)

    # timed single-env at developed flow, step_length 0.25
    env2 = make_env(warm, 0.25)
    env2.reset(seed=0)
    fn2 = jax.jit(env2._pure_step)
    st2 = (state[0], state[1])
    st2, *_ = fn2(st2, action)
    jax.block_until_ready(st2)
    t0 = time.time()
    for _ in range(10):
        st2, *rest = fn2(st2, action)
    jax.block_until_ready(st2)
    dt_single = (time.time() - t0) / 10
    info = rest[-1]
    print(f"warm={warm}: single env 0.25-step {dt_single*1e3:.0f}ms "
          f"drag={float(np.asarray(info['drag'])):.4f}", flush=True)

    # batched 64 at developed flow
    bstate = jax.tree.map(lambda a: jnp.broadcast_to(a, (64,) + a.shape), st2)
    bact = jnp.zeros((64, 1), jnp.float32)
    bfn = jax.jit(jax.vmap(env2._pure_step))
    bstate, *_ = bfn(bstate, bact)
    jax.block_until_ready(bstate)
    t0 = time.time()
    for _ in range(5):
        bstate, *brest = bfn(bstate, bact)
    jax.block_until_ready(bstate)
    dt_b = (time.time() - t0) / 5
    binfo = brest[-1]
    d = np.asarray(binfo["drag"])
    print(f"warm={warm}: batch64 0.25-step {dt_b*1e3:.0f}ms = "
          f"{64/dt_b:.1f} env-steps/s  drag finite={np.isfinite(d).all()}",
          flush=True)
    return state


if __name__ == "__main__":
    run(False)
    run(True)
