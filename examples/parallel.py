"""Batched on-device envs (mirrors reference examples/parallel.py): the
vmap/mesh replacement for the reference's process-per-GPU ParallelFluidEnv."""

import numpy as np

from fluidgym_tpu.parallel import BatchedFluidEnv

benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=8,
                       load_initial_domain=False, load_domain_statistics=False)
obs, _ = benv.reset(seed=0)
actions = np.zeros((8,) + tuple(benv.action_space.shape), np.float32)
obs, rewards, term, trunc, info = benv.step(actions)
print("batched rewards:", np.round(np.asarray(rewards), 4))
