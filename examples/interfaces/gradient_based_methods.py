"""Differentiable-physics control (mirrors reference
examples/interfaces/gradient_based_methods.py): gradients of the reward with
respect to the action, straight through the PISO solver.

The solver is differentiable by default. Adaptive substepping is also
reverse-mode differentiable (a masked bounded lax.scan); fixed substeps are
used here for a fully deterministic step count.
"""

import jax
import jax.numpy as jnp

import fluidgym_tpu
from fluidgym_tpu.solver.piso import SimConfig, piso_fixed_steps

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False,
                        randomize_initial_state=False)
env.reset(seed=0)
# fixed-substep config for reverse-mode AD
cfg = SimConfig(dt=env.dt, substeps=2, corrector_steps=2, pressure_tol=1e-5)
state0 = env._state


def objective(action):
    state = env._pure_apply_action(state0, action)
    state = piso_fixed_steps(state, env._geoms, env._topo, cfg,
                             jnp.asarray(env.dt / 2), 4, env._hooks,
                             use_remat=True)
    return env._pure_nusselt(state)[0]  # minimize convective heat transport


action = jnp.zeros((env._n_heaters, 1))
value, grad = jax.value_and_grad(objective)(action)
print("Nu:", float(value))
print("dNu/daction:", jax.device_get(grad).ravel())

# one gradient-descent step on the control
action = action - 0.5 * grad
print("Nu after update:", float(objective(action)))
