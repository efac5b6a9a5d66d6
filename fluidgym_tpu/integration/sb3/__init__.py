"""StableBaselines3 integration (VecEnv + evaluation tooling)."""

from fluidgym_tpu.integration.sb3.vec_env import VecFluidEnv

__all__ = ["VecFluidEnv"]

try:  # EvalCallback needs stable_baselines3 itself
    from fluidgym_tpu.integration.sb3.eval_callback import EvalCallback  # noqa: F401

    __all__.append("EvalCallback")
except Exception:  # pragma: no cover - sb3 not installed
    pass
