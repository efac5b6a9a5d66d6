"""Evaluation callback for Stable-Baselines3 training.

Mirrors ``/root/reference/src/fluidgym/integration/sb3/eval_callback.py``:
periodic evaluation episodes with CSV logging, optional wandb logging,
latest-model checkpointing, and controlled-vs-uncontrolled sequence plots.
Gated on stable-baselines3 being installed.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from fluidgym_tpu.integration.sb3.util import evaluate_model, plot_eval_sequence
from fluidgym_tpu.integration.sb3.vec_env import VecFluidEnv

try:
    from stable_baselines3.common.callbacks import BaseCallback as _BaseCallback

    _HAS_SB3 = True
except Exception:  # pragma: no cover - sb3 not installed
    _HAS_SB3 = False
    _BaseCallback = object

__all__ = ["EvalCallback"]


class EvalCallback(_BaseCallback):
    """Periodic evaluation + logging callback (eval_callback.py:20-281).

    Evaluation episodes run with the eval env switched to VAL mode (its
    initial-domain split); the mode is restored afterwards."""

    def __init__(
        self,
        env,
        eval_env,
        eval_freq: int,
        n_eval_episodes: int,
        use_wandb: bool = False,
        checkpoint_latest: bool = True,
        verbose: int = 1,
        save_eval_sequence: bool = True,
    ):
        if not _HAS_SB3:
            raise ImportError(
                "stable-baselines3 is required for EvalCallback.")
        super().__init__(verbose)
        self.env = env
        self.eval_env = eval_env
        self.eval_freq = eval_freq
        self.log_freq = max(eval_freq // 10, 1)
        self.n_eval_episodes = n_eval_episodes
        self.use_wandb = use_wandb
        self.checkpoint_latest = checkpoint_latest
        self.save_evaluation = save_eval_sequence

        if isinstance(env, VecFluidEnv) and env.unwrapped.use_marl:
            self.num_actions = env.num_envs
            self.metrics = ["global_reward"] + list(env.unwrapped.metrics)
        else:
            self.num_actions = int(self.env.action_space.shape[0])
            self.metrics = list(env.unwrapped.metrics)

        self.last_eval_timesteps = 0
        self.last_log_timesteps = 0
        self.logged_reward: float | np.ndarray = 0
        self.logged_length = 0
        self.logged_metrics: dict[str, float] = defaultdict(float)
        self.logged_data: list[dict[str, float]] = []
        self.uncontrolled_sequence_df = None

    @property
    def _num_env_steps(self) -> int:
        if isinstance(self.env, VecFluidEnv) and self.env.unwrapped.use_marl:
            return self.num_timesteps // self.env.num_envs
        return self.num_timesteps

    def _log(self, data: dict, step: int, tag: str) -> None:
        data = {f"{tag}/{k}": float(v) for k, v in data.items()}
        self.logged_data.append({"step": step, **data})
        if self.verbose:
            print(f"Step {step}: "
                  + ", ".join(f"{k}={v:.4f}" for k, v in data.items()))
        if self.use_wandb:
            import wandb

            wandb.log(data, step=step)

    def _on_step(self) -> bool:
        self.logged_reward = self.logged_reward + self.locals["rewards"]
        self.logged_length += 1
        infos = self.locals["infos"]
        for m in self.metrics:
            vals = [np.asarray(info[m]).mean() for info in infos if m in info]
            if vals:
                self.logged_metrics[m] += float(np.mean(vals))

        if self._num_env_steps - self.last_log_timesteps >= self.log_freq:
            self.last_log_timesteps = self._num_env_steps
            self._log(
                {"mean_reward": float(np.mean(self.logged_reward))
                 / self.logged_length,
                 **{f"mean_{m}": self.logged_metrics[m] / self.logged_length
                    for m in self.metrics}},
                step=self._num_env_steps, tag="training")
            self.logged_reward = 0
            self.logged_metrics = defaultdict(float)
            self.logged_length = 0

        if self._num_env_steps - self.last_eval_timesteps >= self.eval_freq:
            self.last_eval_timesteps = self._num_env_steps
            self._eval_step()
        return True

    def _on_training_start(self) -> None:
        self.uncontrolled_sequence_df = (
            self.env.unwrapped.get_uncontrolled_episode_metrics())
        if self.uncontrolled_sequence_df is not None:
            import pandas as pd

            ep_len = self.eval_env.unwrapped.episode_length
            df = self.uncontrolled_sequence_df
            if len(df) > ep_len:
                df = df.iloc[:ep_len]
            elif len(df) < ep_len:
                pad = pd.DataFrame(
                    np.full((ep_len - len(df), len(df.columns)), np.nan),
                    columns=df.columns)
                df = pd.concat([df, pad], ignore_index=True)
            self.uncontrolled_sequence_df = df

    def _save_model(self) -> None:
        self.model.save("ckpt_latest")

    def _on_training_end(self) -> None:
        import pandas as pd

        self._write_training_log(pd)
        if self.checkpoint_latest:
            self._save_model()

    def _write_training_log(self, pd) -> None:
        """Write prior-run rows (snapshotted and backed up once) + the
        current run's rows.  Merging against the on-disk file instead would
        duplicate rows already written by earlier _eval_step calls."""
        if not hasattr(self, "_prior_log_df"):
            if Path("training_log.csv").exists():
                self._prior_log_df = pd.read_csv("training_log.csv")
                self._prior_log_df.to_csv("training_log_backup.csv",
                                          index=False)
            else:
                self._prior_log_df = None
        logged_df = pd.DataFrame(self.logged_data)
        if self._prior_log_df is not None:
            logged_df = pd.concat([self._prior_log_df, logged_df],
                                  ignore_index=True)
        logged_df.to_csv("training_log.csv", index=False)

    def _eval_step(self) -> None:
        import pandas as pd

        if hasattr(self.eval_env, "val"):
            self.eval_env.val()
        try:
            mean_eval_reward = self._evaluate_model(
                self.eval_env, randomize=False, log=True,
                save=self.save_evaluation)
            if self.n_eval_episodes > 1:
                rewards = [mean_eval_reward]
                for _ in range(self.n_eval_episodes - 1):
                    rewards.append(self._evaluate_model(
                        self.eval_env, randomize=True, log=False, save=False))
                mean_eval_reward = float(np.mean(rewards))
        finally:
            if hasattr(self.eval_env, "train"):
                self.eval_env.train()

        self._write_training_log(pd)
        if self.checkpoint_latest:
            self._save_model()

    def _evaluate_model(self, env, randomize: bool, log: bool = False,
                        save: bool = False) -> float:
        sequence_df, mean_eval_metrics = evaluate_model(
            env=env, model=self.model, randomize=randomize,
            save_name=f"eval_sequence_{self._num_env_steps}" if save else None)
        if save:
            plot_eval_sequence(
                env=env,
                uncontrolled_sequence_df=self.uncontrolled_sequence_df,
                sequence_df=sequence_df,
                output_file=Path(".") / f"eval_sequence_{self._num_env_steps}.pdf")
        if log:
            self._log(mean_eval_metrics, step=self._num_env_steps,
                      tag="evaluation")
        return mean_eval_metrics["mean_reward"]
