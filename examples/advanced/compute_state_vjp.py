"""VJP of the final state w.r.t. the initial state through a rollout
(mirrors reference examples/advanced/compute_state_vjp.py)."""

import jax
import jax.numpy as jnp

import fluidgym_tpu
from fluidgym_tpu.solver.piso import SimConfig, piso_fixed_steps

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False,
                        randomize_initial_state=False)
env.reset(seed=0)
cfg = SimConfig(dt=env.dt, substeps=1, pressure_tol=1e-5)
state0 = env._state


def rollout(velocity0):
    from dataclasses import replace

    s = state0.replace_block(0, replace(state0.blocks[0], velocity=velocity0))
    s = piso_fixed_steps(s, env._geoms, env._topo, cfg,
                         jnp.asarray(env.dt), 5, env._hooks)
    return s.blocks[0].velocity


v0 = state0.blocks[0].velocity
out, vjp_fn = jax.vjp(rollout, v0)
(cotangent,) = vjp_fn(jnp.ones_like(out))
print("VJP shape:", cotangent.shape, "norm:", float(jnp.linalg.norm(cotangent)))
