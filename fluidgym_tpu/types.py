"""Shared types: env mode enum and the structural env protocol.

Mirrors the reference's ``types.py`` (``/root/reference/src/fluidgym/types.py:15-247``):
``EnvMode`` and the runtime-checkable ``FluidEnvLike`` protocol describing the
full environment surface.  Arrays are ``jax.Array`` instead of torch tensors.
"""

from __future__ import annotations

import enum
from typing import Any, Protocol, TypeVar, runtime_checkable

import jax


class EnvMode(enum.Enum):
    """Dataset split / evaluation mode of an environment."""

    TRAIN = "train"
    VAL = "val"
    TEST = "test"


@runtime_checkable
class FluidEnvLike(Protocol):
    """Structural protocol satisfied by all FluidGym-TPU environments and wrappers."""

    # --- spaces -----------------------------------------------------------
    @property
    def action_space(self) -> Any: ...

    @property
    def observation_space(self) -> Any: ...

    # --- core loop --------------------------------------------------------
    def reset(
        self, seed: int | None = None, randomize: bool | None = None
    ) -> tuple[Any, dict]: ...

    def step(self, action: Any) -> tuple[Any, Any, bool, bool, dict]: ...

    def seed(self, seed: int) -> None: ...

    def sample_action(self) -> jax.Array: ...

    def render(self, *args: Any, **kwargs: Any) -> Any: ...

    # --- modes ------------------------------------------------------------
    def train(self) -> None: ...

    def val(self) -> None: ...

    def test(self) -> None: ...

    # --- introspection ----------------------------------------------------
    @property
    def use_marl(self) -> bool: ...

    @property
    def n_agents(self) -> int: ...

    @property
    def unwrapped(self) -> "FluidEnvLike": ...


EnvT = TypeVar("EnvT", bound=FluidEnvLike)
