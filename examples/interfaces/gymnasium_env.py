"""Gymnasium adapter usage (mirrors reference examples/interfaces/gymnasium_env.py)."""

import fluidgym_tpu
from fluidgym_tpu.integration import GymFluidEnv

env = GymFluidEnv(fluidgym_tpu.make("CylinderJet2D-easy-v0",
                                    load_initial_domain=False,
                                    load_domain_statistics=False),
                  render_mode="rgb_array")
obs, info = env.reset(seed=0)
for _ in range(5):
    obs, reward, terminated, truncated, info = env.step(env.action_space.sample())
    print(f"cd={info['drag']:.4f} cl={info['lift']:.4f} reward={reward:.4f}")
