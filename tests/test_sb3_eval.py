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


def test_rolling_meter_and_csv_sink(tmp_path):
    from fluidgym_tpu.integration.sb3.eval_callback import _CsvSink, _RollingMeter

    meter = _RollingMeter(["reward", "nusselt"])
    meter.push(np.array([1.0, 3.0]), [{"nusselt": 4.0}, {"nusselt": 6.0}])
    meter.push(np.array([2.0]), [{}])  # metric absent -> skipped, not zeroed
    out = meter.drain()
    assert out["mean_reward"] == 2.0  # (mean(1,3) + 2) / 2
    assert out["mean_nusselt"] == 2.5  # (5 + 0) / 2 steps
    assert meter.drain()["mean_reward"] == 0.0  # drained state resets

    sink = _CsvSink(tmp_path / "log.csv")
    sink.append({"step": 1, "training/mean_reward": 0.5})
    sink.append({"step": 2, "evaluation/mean_reward": 0.7})
    import csv

    with (tmp_path / "log.csv").open() as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    assert rows[0]["training/mean_reward"] == "0.5"
    assert rows[0]["evaluation/mean_reward"] == ""  # widened header backfills
    assert rows[1]["evaluation/mean_reward"] == "0.7"


def test_csv_sink_preserves_prior_run(tmp_path):
    """A resumed run in the same directory must keep the previous log's
    rows and leave a backup, never truncate (round-3 review finding)."""
    import csv

    from fluidgym_tpu.integration.sb3.eval_callback import _CsvSink

    path = tmp_path / "training_log.csv"
    first = _CsvSink(path)
    first.append({"step": 1, "training/mean_reward": 0.1})
    first.append({"step": 2, "training/mean_reward": 0.2})

    second = _CsvSink(path)  # simulates a new training run
    second.append({"step": 1, "training/mean_reward": 0.9})

    with path.open() as fh:
        rows = list(csv.DictReader(fh))
    assert [r["step"] for r in rows] == ["1", "2", "1"]
    assert rows[0]["training/mean_reward"] == "0.1"  # old rows retained
    backup = tmp_path / "training_log_backup.csv"
    assert backup.exists()
    with backup.open() as fh:
        assert len(list(csv.DictReader(fh))) == 2


def test_eval_callback_step_cadence(tmp_path, monkeypatch):
    """Drive _on_step through log + eval boundaries without sb3."""
    import fluidgym_tpu.integration.sb3.eval_callback as ec

    monkeypatch.setattr(ec, "_HAS_SB3", True)
    monkeypatch.chdir(tmp_path)

    env = GymFluidEnv(fluidgym_tpu.make("RBC2D-easy-v0", **ENV_KW))
    env.unwrapped.seed(0)

    cb = ec.EvalCallback(env, env, eval_freq=4, n_eval_episodes=1,
                         verbose=0, save_eval_sequence=False,
                         log_path=tmp_path / "log.csv")
    cb.model = _ZeroModel(env.action_space)
    evals = []
    monkeypatch.setattr(cb, "_run_evaluation", lambda steps: evals.append(steps))
    monkeypatch.setattr(cb, "_save_model", lambda: None)

    cb._on_training_start()
    for t in range(1, 9):
        cb.num_timesteps = t
        cb.locals = {"rewards": np.array([float(t)]),
                     "infos": [{"nusselt": 1.0}]}
        assert cb._on_step()
    assert evals == [4, 8]
    import csv

    with (tmp_path / "log.csv").open() as fh:
        rows = list(csv.DictReader(fh))
    # log_freq = max(4 // 10, 1) = 1 -> one training row per step
    assert len(rows) == 8
    assert float(rows[3]["training/mean_reward"]) == 4.0
    cb._on_training_end()


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
