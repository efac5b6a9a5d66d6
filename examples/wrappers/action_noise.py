"""Gaussian action noise (mirrors reference examples/wrappers/action_noise.py)."""

import fluidgym_tpu
from fluidgym_tpu.wrappers import ActionNoise

env = fluidgym_tpu.make("CylinderJet2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
env = ActionNoise(env, sigma=0.1, seed=42)

obs, info = env.reset(seed=42)
action = env.sample_action()
obs, reward, terminated, truncated, info = env.step(action)  # noisy action
