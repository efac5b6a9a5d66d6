"""TorchRL adapter (mirrors reference examples/interfaces/torchrl_env.py).

Requires torchrl + tensordict to be installed.
"""

import fluidgym_tpu
from fluidgym_tpu.integration.torchrl import TorchRLFluidEnv

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
trl_env = TorchRLFluidEnv(env)

td = trl_env.reset(seed=42)
td["action"] = trl_env.action_spec.rand()
td = trl_env.step(td)
print(td)
