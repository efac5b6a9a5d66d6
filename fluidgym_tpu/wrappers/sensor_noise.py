"""Gaussian sensor-noise wrapper (reference wrappers/sensor_noise.py:9-100)."""

from __future__ import annotations

import jax

from fluidgym_tpu.types import FluidEnvLike
from fluidgym_tpu.wrappers.fluid_wrapper import FluidWrapper

__all__ = ["SensorNoise"]


class SensorNoise(FluidWrapper):
    """Add seeded Gaussian noise (stddev sigma) to every observation entry."""

    def __init__(self, env: FluidEnvLike, sigma: float, seed: int) -> None:
        super().__init__(env)
        self.__sigma = float(sigma)
        self.__key = jax.random.PRNGKey(int(seed))

    def __add_noise(self, obs):
        out = {}
        for k, v in obs.items():
            self.__key, sub = jax.random.split(self.__key)
            out[k] = v + jax.random.normal(sub, v.shape, v.dtype) * self.__sigma
        return out

    def reset(self, seed: int | None = None, randomize: bool | None = None):
        obs, info = self._env.reset(seed=seed, randomize=randomize)
        return self.__add_noise(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self._env.step(action)
        return self.__add_noise(obs), reward, terminated, truncated, info
