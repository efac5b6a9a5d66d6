"""Gymnasium adapter (reference integration/gymnasium.py:14-215).

SARL-only ``gymnasium.Env`` facade; device arrays cross to numpy only at this
boundary.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, cast

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import Env, spaces

from fluidgym_tpu.envs.fluid_env import FluidEnv
from fluidgym_tpu.types import FluidEnvLike

__all__ = ["GymFluidEnv"]


class GymFluidEnv(Env):
    """Gymnasium-compatible wrapper around a FluidGym-TPU environment."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 24}
    action_space: spaces.Box
    observation_space: spaces.Space

    def __init__(self, env: FluidEnvLike, render_mode: str | None = None):
        super().__init__()
        if env.use_marl:
            raise ValueError(
                "GymFluidEnv does not support multi-agent environments. "
                "Please use a single-agent environment."
            )
        if render_mode is not None and render_mode != "rgb_array":
            raise ValueError(
                f"Unsupported render mode: {render_mode}. Only 'rgb_array' is "
                "supported."
            )
        self.render_mode = render_mode
        self.__env = env
        self.action_space = env.action_space
        self.observation_space = env.observation_space

    @staticmethod
    def __to_np(data):
        if isinstance(data, dict):
            return {k: np.asarray(jax.device_get(v)) for k, v in data.items()}
        return np.asarray(jax.device_get(data))

    def step(self, action: np.ndarray):
        obs, reward, terminated, truncated, info = self.__env.step(
            jnp.asarray(action)
        )
        info_np = {k: np.asarray(jax.device_get(v)) for k, v in info.items()}
        return (
            self.__to_np(obs),
            # rewards can be shape-(1,) arrays; float() on ndim>0 arrays is a
            # hard error on NumPy >= 2.3
            float(np.asarray(jax.device_get(reward)).reshape(-1)[0]),
            bool(terminated),
            bool(truncated),
            info_np,
        )

    def reset(self, *, seed: int | None = None,
              options: dict[str, Any] | None = None,
              randomize: bool | None = None):
        obs, info = self.__env.reset(seed=seed, randomize=randomize)
        info_np = {k: np.asarray(jax.device_get(v)) for k, v in info.items()}
        return self.__to_np(obs), info_np

    def render(self, save: bool = False, render_3d: bool = False,
               filename: str | None = None,
               output_path: Path | None = None):
        frame = self.__env.render(save=save, render_3d=render_3d,
                                  filename=filename, output_path=output_path)
        return frame if self.render_mode == "rgb_array" else None

    def save_gif(self, filename: str = "fluidgym.gif",
                 output_path: Path | None = None) -> None:
        self.__env.save_gif(filename=filename, output_path=output_path)

    def close(self):
        pass

    @property
    def unwrapped(self) -> FluidEnv:  # type: ignore[override]
        if hasattr(self.__env, "unwrapped"):
            return self.__env.unwrapped  # type: ignore[return-value]
        return cast(FluidEnv, self.__env)

    def train(self) -> None:
        self.__env.train()

    def val(self) -> None:
        self.__env.val()

    def test(self) -> None:
        self.__env.test()

    def seed(self, seed: int) -> None:
        self.__env.seed(seed)

    @property
    def num_actions(self) -> int:
        return int(np.prod(self.action_space.shape))
