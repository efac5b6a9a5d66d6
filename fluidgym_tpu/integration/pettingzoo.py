"""PettingZoo ParallelEnv adapter.

Mirrors the reference ``PettingZooFluidEnv``
(``/root/reference/src/fluidgym/integration/pettingzoo.py:14-203``):
agent-indexed dicts over a MARL fluid env; requires flattened Box
observations (use wrappers.FlattenObservation).  Implements the ParallelEnv
duck-type; inherits the real base class when pettingzoo is installed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.types import FluidEnvLike

try:
    from pettingzoo import ParallelEnv as _ParallelEnv
except Exception:  # pragma: no cover
    _ParallelEnv = object

__all__ = ["PettingZooFluidEnv"]


class PettingZooFluidEnv(_ParallelEnv):
    """PettingZoo parallel API over a MARL fluid environment."""

    metadata = {"render_modes": ["rgb_array"], "name": "fluidgym_tpu"}

    def __init__(self, env: FluidEnvLike, render_mode: str | None = None):
        if not env.use_marl or env.n_agents <= 1:
            raise ValueError(
                "PettingZooFluidEnv requires a MARL environment with "
                "multiple agents."
            )
        if not isinstance(env.observation_space, spaces.Box):
            raise ValueError(
                "PettingZooFluidEnv requires flattened Box observations; "
                "wrap the env in wrappers.FlattenObservation."
            )
        self.__env = env
        self.render_mode = render_mode
        self.possible_agents = [f"agent_{i}" for i in range(env.n_agents)]
        self.agents = list(self.possible_agents)

    def observation_space(self, agent: str) -> spaces.Space:
        return self.__env.observation_space

    def action_space(self, agent: str) -> spaces.Space:
        return self.__env.action_space

    @staticmethod
    def __to_np(x):
        return np.asarray(jax.device_get(x))

    def __split(self, stacked) -> dict[str, np.ndarray]:
        arr = self.__to_np(stacked)
        return {a: arr[i] for i, a in enumerate(self.possible_agents)}

    def reset(self, seed: int | None = None, options: dict | None = None):
        obs, info = self.__env.reset(seed=seed)
        self.agents = list(self.possible_agents)
        infos = {a: {} for a in self.possible_agents}
        return self.__split(obs), infos

    def step(self, actions: dict[str, np.ndarray]):
        stacked = jnp.stack(
            [jnp.asarray(actions[a]) for a in self.possible_agents], axis=0
        )
        obs, rewards, term, trunc, info = self.__env.step(stacked)
        obs_d = self.__split(obs)
        rew = self.__to_np(rewards)
        rewards_d = {a: float(rew[i]) for i, a in enumerate(self.possible_agents)}
        terms = {a: bool(term) for a in self.possible_agents}
        truncs = {a: bool(trunc) for a in self.possible_agents}
        info_np = {k: self.__to_np(v) for k, v in info.items()}
        infos = {a: dict(info_np) for a in self.possible_agents}
        if term or trunc:
            self.agents = []
        return obs_d, rewards_d, terms, truncs, infos

    def render(self):
        frame = self.__env.render()
        return frame if self.render_mode == "rgb_array" else None

    def close(self) -> None:
        pass

    @property
    def unwrapped(self):
        return self.__env.unwrapped if hasattr(self.__env, "unwrapped") else self.__env
