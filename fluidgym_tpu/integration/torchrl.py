"""TorchRL EnvBase adapter.

Mirrors the reference ``TorchRLFluidEnv``
(``/root/reference/src/fluidgym/integration/torchrl.py:87-278``): spec
construction from the gymnasium spaces, tensordict-based ``_step``/``_reset``,
optional ``from_pixels`` rendering.  Device arrays cross to torch tensors at
this boundary.  Gated on torchrl/tensordict being installed.
"""

from __future__ import annotations

import jax
import numpy as np

from fluidgym_tpu.types import FluidEnvLike

__all__ = ["TorchRLFluidEnv"]

try:
    import torch
    from tensordict import TensorDict
    from torchrl.data import Bounded, Composite, Unbounded
    from torchrl.envs import EnvBase as _EnvBase

    _HAS_TORCHRL = True
except Exception:  # pragma: no cover - torchrl not installed
    _HAS_TORCHRL = False
    _EnvBase = object


class TorchRLFluidEnv(_EnvBase):
    """TorchRL-compatible wrapper around a FluidGym-TPU environment."""

    def __init__(self, env: FluidEnvLike, from_pixels: bool = False,
                 device: str = "cpu"):
        if not _HAS_TORCHRL:
            raise ImportError(
                "torchrl/tensordict are required for TorchRLFluidEnv; install "
                "them or use the Gymnasium/SB3 adapters."
            )
        super().__init__(device=device)
        self.__env = env
        self.__from_pixels = from_pixels
        self._make_specs()

    @staticmethod
    def __to_torch(x, device):
        return torch.as_tensor(np.asarray(jax.device_get(x)), device=device)

    def _probe_frame_shape(self) -> tuple[int, ...]:
        """Shape of the frames ``render()`` actually produces (resetting the
        env first if needed -- rendering requires a live state)."""
        env = self.__env
        try:
            frame = env.render()
        except Exception:
            env.reset(seed=0)
            frame = env.render()
        return tuple(np.asarray(frame).shape)

    def _make_specs(self) -> None:
        from gymnasium import spaces

        env = self.__env
        obs_space = env.observation_space
        specs = {}
        if isinstance(obs_space, spaces.Dict):
            for k, s in obs_space.spaces.items():
                specs[k] = Unbounded(shape=s.shape, device=self.device)
        else:
            specs["observation"] = Unbounded(shape=obs_space.shape,
                                             device=self.device)
        if self.__from_pixels:
            # build the pixel spec from a REAL rendered frame (the reference
            # constructs specs from the env, torchrl.py:128-202): render
            # shapes vary per env family/resolution and a hardcoded spec
            # would not match the frames _obs_to_td returns
            specs["pixels"] = Unbounded(shape=tuple(self._probe_frame_shape()),
                                        device=self.device)
        self.observation_spec = Composite(**specs)
        a = env.action_space
        self.action_spec = Bounded(low=float(a.low.min()),
                                   high=float(a.high.max()),
                                   shape=a.shape, device=self.device)
        self.reward_spec = Unbounded(shape=(1,), device=self.device)

    def _obs_to_td(self, obs) -> dict:
        if isinstance(obs, dict):
            out = {k: self.__to_torch(v, self.device) for k, v in obs.items()}
        else:
            out = {"observation": self.__to_torch(obs, self.device)}
        if self.__from_pixels:
            out["pixels"] = torch.as_tensor(self.__env.render(),
                                            device=self.device)
        return out

    def _reset(self, tensordict=None, **kwargs) -> "TensorDict":
        seed = kwargs.get("seed")
        obs, _ = self.__env.reset(seed=seed)
        return TensorDict(self._obs_to_td(obs), batch_size=[])

    def _step(self, tensordict) -> "TensorDict":
        import jax.numpy as jnp

        action = jnp.asarray(tensordict["action"].detach().cpu().numpy())
        obs, reward, term, trunc, info = self.__env.step(action)
        out = self._obs_to_td(obs)
        out["reward"] = self.__to_torch(reward, self.device).reshape(1)
        out["done"] = torch.tensor([bool(term or trunc)], device=self.device)
        out["terminated"] = torch.tensor([bool(term)], device=self.device)
        out["truncated"] = torch.tensor([bool(trunc)], device=self.device)
        return TensorDict(out, batch_size=[])

    def _set_seed(self, seed: int | None) -> None:
        if seed is not None:
            self.__env.seed(int(seed))
