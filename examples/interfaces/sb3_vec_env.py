"""SB3 VecEnv usage (mirrors reference examples/interfaces/sb3_vec_env.py):
the agents of one MARL env act as SB3 vector envs."""

import numpy as np

import fluidgym_tpu
from fluidgym_tpu.integration.sb3 import VecFluidEnv
from fluidgym_tpu.wrappers import FlattenObservation

venv = VecFluidEnv(FlattenObservation(
    fluidgym_tpu.make("RBC2D-easy-v0", use_marl=True,
                      load_initial_domain=False, load_domain_statistics=False)))
obs = venv.reset(seed=0)
actions = np.stack([venv.action_space.sample() for _ in range(venv.num_envs)])
obs, rewards, dones, infos = venv.step(actions)
print("rewards:", np.round(rewards, 4))
