"""Jacobian of observations w.r.t. the flow state.

Mirrors reference examples/advanced/compute_obs_jacobian.py -- in JAX the
whole env step is a pure function, so the Jacobian is one jax.jacrev call on
the velocity -> observation map (no per-row autograd loop, no detach()).
"""

import jax
import jax.numpy as jnp

import fluidgym_tpu

env = fluidgym_tpu.make(
    "RBC2D-easy-v0", differentiable=True,
    load_initial_domain=False, load_domain_statistics=False,
    randomize_initial_state=False,
)
env.reset(seed=42)
action = env.sample_action()

state0 = env._state
step = env._pure_step


def obs_of_velocity(velocity):
    from dataclasses import replace

    s = state0.replace_block(0, replace(state0.blocks[0], velocity=velocity))
    _, obs, _, _ = step(s, action)
    return obs["temperature"]


v0 = state0.blocks[0].velocity
jac = jax.jacrev(obs_of_velocity)(v0)  # (n_probes, 2, H, W)
print("Observation shape    :", obs_of_velocity(v0).shape)
print("Velocity field shape :", v0.shape)
print("Jacobian shape       :", jac.shape)

# For a single scalar readout, prefer a VJP (one backward pass):
#   out, vjp = jax.vjp(obs_of_velocity, v0); (g,) = vjp(cotangent)
