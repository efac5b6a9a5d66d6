"""On-device environment batching and device-mesh sharding."""

from fluidgym_tpu.parallel.batched_env import BatchedFluidEnv
from fluidgym_tpu.parallel.multihost import (initialize_distributed,
                                             make_pod_mesh)
from fluidgym_tpu.parallel.spatial import (domain_state_shardings, make_mesh,
                                           shard_domain_state)

__all__ = ["BatchedFluidEnv", "initialize_distributed", "make_pod_mesh",
           "make_mesh", "domain_state_shardings", "shard_domain_state"]
