"""Gaussian action-noise wrapper (reference wrappers/action_noise.py:9-67)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidgym_tpu.types import FluidEnvLike
from fluidgym_tpu.wrappers.fluid_wrapper import FluidWrapper

__all__ = ["ActionNoise"]


class ActionNoise(FluidWrapper):
    """Add seeded Gaussian noise (stddev sigma) to every action."""

    def __init__(self, env: FluidEnvLike, sigma: float, seed: int) -> None:
        super().__init__(env)
        self.__sigma = float(sigma)
        self.__key = jax.random.PRNGKey(int(seed))

    def step(self, action):
        self.__key, sub = jax.random.split(self.__key)
        action = jnp.asarray(action)
        noisy = action + jax.random.normal(sub, action.shape, action.dtype) * self.__sigma
        return self._env.step(noisy)
