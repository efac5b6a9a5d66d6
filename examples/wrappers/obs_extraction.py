"""Select a subset of observation keys (mirrors reference obs_extraction.py)."""

import fluidgym_tpu
from fluidgym_tpu.wrappers import ObsExtraction

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
env = ObsExtraction(env, keys=["temperature"])

obs, info = env.reset(seed=42)
print("obs keys:", sorted(obs))
