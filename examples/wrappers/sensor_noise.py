"""Gaussian observation noise (mirrors reference examples/wrappers/sensor_noise.py)."""

import fluidgym_tpu
from fluidgym_tpu.wrappers import SensorNoise

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
env = SensorNoise(env, sigma=0.05, seed=42)

obs, info = env.reset(seed=42)
obs, reward, terminated, truncated, info = env.step(env.sample_action())
