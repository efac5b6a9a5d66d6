"""Dict->Box observation flattening wrapper
(reference wrappers/flatten_obs.py:11-102)."""

from __future__ import annotations

import jax.numpy as jnp
from gymnasium import spaces

from fluidgym_tpu.types import FluidEnvLike
from fluidgym_tpu.wrappers.fluid_wrapper import FluidWrapper
from fluidgym_tpu.wrappers.util import flatten_dict_space

DEFAULT_KEYS = ["temperature", "velocity"]

__all__ = ["FlattenObservation"]


class FlattenObservation(FluidWrapper):
    """Concatenate observation keys into one flat Box observation; the
    original dict entries are preserved in info as ``original_<key>``.

    ``keys=None`` keeps the reference behavior (temperature/velocity,
    reference flatten_obs.py:13) but falls back to ALL space keys when none
    of the defaults are present -- otherwise wrapping a cylinder/airfoil env
    (velocity + pressure only) would silently drop the pressure sensors.
    Pass ``keys`` explicitly to control the selection/order.
    """

    def __init__(self, env: FluidEnvLike,
                 keys: list[str] | None = None) -> None:
        super().__init__(env)
        if not isinstance(self._env.observation_space, spaces.Dict):
            raise ValueError(
                "FlattenObservation wrapper only supports Dict observation spaces."
            )
        space_keys = self._env.observation_space.spaces
        if keys is not None:
            missing = [k for k in keys if k not in space_keys]
            if missing:
                raise ValueError(
                    f"keys {missing} not in the observation space "
                    f"({sorted(space_keys)})"
                )
            self.__keys = list(keys)
        else:
            self.__keys = [k for k in DEFAULT_KEYS if k in space_keys]
            if not self.__keys:
                self.__keys = sorted(space_keys)
        self.__observation_space = flatten_dict_space(
            self._env.observation_space, keys=self.__keys
        )
        self.__start_axis = 1 if env.use_marl else 0

    @property
    def observation_space(self) -> spaces.Box:
        return self.__observation_space

    def __flatten(self, obs):
        a = self.__start_axis
        return jnp.concatenate(
            [obs[k].reshape(obs[k].shape[:a] + (-1,)) for k in self.__keys], axis=a
        )

    def reset(self, seed: int | None = None, randomize: bool | None = None):
        obs, info = self._env.reset(seed=seed, randomize=randomize)
        for k, v in obs.items():
            info["original_" + k] = v
        return self.__flatten(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self._env.step(action)
        for k, v in obs.items():
            info["original_" + k] = v
        return self.__flatten(obs), reward, terminated, truncated, info
