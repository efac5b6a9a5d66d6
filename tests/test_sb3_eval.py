"""Evaluation-utility tests (sb3-independent paths; EvalCallback itself is
gated on stable-baselines3)."""

import numpy as np

import fluidgym_tpu
from fluidgym_tpu.integration.gymnasium import GymFluidEnv
from fluidgym_tpu.integration.sb3 import evaluate_model, plot_eval_sequence

ENV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=2,
)


class _ZeroModel:
    def __init__(self, space):
        self._space = space

    def predict(self, obs, deterministic=True):
        return np.zeros(self._space.shape, np.float32), None


def test_evaluate_model_sarl(tmp_path):
    env = GymFluidEnv(fluidgym_tpu.make("RBC2D-easy-v0", **ENV_KW))
    env.unwrapped.seed(0)
    model = _ZeroModel(env.action_space)
    df, metrics = evaluate_model(env, model, randomize=False)
    assert len(df) == 2
    assert "mean_reward" in metrics
    assert np.isfinite(metrics["mean_reward"])
    for m in env.unwrapped.metrics:
        assert f"mean_{m}" in metrics
    plot_eval_sequence(env, None, df, tmp_path / "seq.pdf")
    assert (tmp_path / "seq.pdf").exists()


def test_diff_tools_roundtrip():
    import jax.numpy as jnp

    from fluidgym_tpu.envs.util.diff_tools import (
        get_flat_state,
        get_state_arrays,
        replace_state_arrays,
    )

    env = fluidgym_tpu.make("RBC2D-easy-v0", **ENV_KW)
    env.reset(seed=0)
    arrays = get_state_arrays(env._state)
    assert len(arrays) == 2  # velocity + scalar
    flat = get_flat_state(env)
    assert flat.shape == (sum(a.size for a in arrays),)
    new = replace_state_arrays(env._state, [a + 1.0 for a in arrays])
    assert jnp.allclose(new.blocks[0].velocity, arrays[0] + 1.0)
