"""On-device environment batching and device-mesh sharding."""

from fluidgym_tpu.parallel.batched_env import BatchedFluidEnv

__all__ = ["BatchedFluidEnv"]
