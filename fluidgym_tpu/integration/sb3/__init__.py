"""StableBaselines3 integration (VecEnv + evaluation tooling)."""

from fluidgym_tpu.integration.sb3.util import evaluate_model, plot_eval_sequence, test_model
from fluidgym_tpu.integration.sb3.vec_env import VecFluidEnv

__all__ = ["VecFluidEnv", "evaluate_model", "plot_eval_sequence", "test_model"]

try:  # EvalCallback needs stable_baselines3 itself
    from fluidgym_tpu.integration.sb3.eval_callback import EvalCallback  # noqa: F401

    __all__.append("EvalCallback")
except Exception:  # pragma: no cover - sb3 not installed
    pass
