"""PettingZoo adapter usage (mirrors reference examples/interfaces/pettingzoo_env.py)."""

import fluidgym_tpu
from fluidgym_tpu.integration.pettingzoo import PettingZooFluidEnv
from fluidgym_tpu.wrappers import FlattenObservation

env = PettingZooFluidEnv(FlattenObservation(
    fluidgym_tpu.make("RBC2D-easy-v0", use_marl=True,
                      load_initial_domain=False, load_domain_statistics=False)))
obs, infos = env.reset(seed=0)
actions = {a: env.action_space(a).sample() for a in env.agents}
obs, rewards, terms, truncs, infos = env.step(actions)
print({a: round(r, 4) for a, r in rewards.items()})
