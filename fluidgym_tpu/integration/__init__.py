"""RL-framework integration adapters (Gymnasium, PettingZoo, SB3, TorchRL)."""

from fluidgym_tpu.integration.gymnasium import GymFluidEnv

__all__ = ["GymFluidEnv"]
