"""Dict -> flat Box observations (mirrors reference flatten_observation.py)."""

import fluidgym_tpu
from fluidgym_tpu.wrappers import FlattenObservation

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
env = FlattenObservation(env)

obs, info = env.reset(seed=42)
print("flattened obs shape:", obs.shape)          # 1D Box
print("original keys in info:", sorted(info))     # originals preserved
