"""Batched environments: vmap over a stacked env-state pytree, optionally
sharded over a TPU device mesh.

TPU-native replacement of the reference's ``ParallelFluidEnv``
(``/root/reference/src/fluidgym/envs/parallel_env.py:30-444``), which runs one
env per GPU in a spawned process and ships CPU tensors through
``multiprocessing.Pipe``.  Here the batch is a leading array axis: ``n_envs``
domain states are stacked into one pytree, the env's pure step is ``vmap``-ed
and jitted once, and (optionally) the batch axis is sharded over a
``jax.sharding.Mesh`` so rollout collection scales across chips with zero host
round-trips.  Unlike the reference (parallel_env.py:54-57), the batched env
stays end-to-end differentiable.

API mirrors ParallelFluidEnv: ``reset(seeds)/step(actions)/seed/train/val/
test/load_initial_domain/close``; observations are stacked along axis 0 for
SARL and concatenated along the agent axis for MARL (parallel_env.py:177-200).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.registry import make
from fluidgym_tpu.types import EnvMode

Array = jax.Array

__all__ = ["BatchedFluidEnv"]


class BatchedFluidEnv:
    """``n_envs`` copies of one env config, stepped as a single jitted vmap.

    Parameters
    ----------
    env_id : registered environment id.
    n_envs : number of batched environments.
    mesh : optional ``jax.sharding.Mesh`` with a ``dp`` axis; the batch axis
        of the stacked state is sharded over it.
    auto_reset : reset finished envs in place (gymnasium vector / reference
        VecEnv semantics): when an env terminates (diverged solve) or
        truncates (episode length), a fresh initial state is spliced into its
        batch slot, its step returns the first observation of the new episode,
        and the final observation is reported in
        ``info["final_observation"]``.
    lockstep_chunk : sub-batch size, ``"auto"`` (default), or None.  A
        lockstep batch pays the max-over-lanes Krylov iteration count of
        EVERY adaptive substep, so per-env throughput collapses for very
        large batches (measured on the res-24 cylinder TPU: 516 env-steps/s
        at batch 128 collapsing to 255 at 512).  With ``lockstep_chunk=c``
        the batch steps as ``n_envs / c`` independent lockstep groups inside
        one jitted ``lax.scan`` — each group only waits for its own worst
        lane (chunk 128 holds 519 env-steps/s at batch 512).  ``"auto"``
        picks the largest divisor of ``n_envs`` that is <= 128 when
        ``n_envs > 128``, else no chunking.  Must divide ``n_envs``;
        per-env physics is unchanged (per-lane convergence masking).
    divergence_reward : reward substituted on a diverged (terminated) lane's
        final step, replacing the solver's NaN.  Must be clearly WORSE than
        any legitimate return: a neutral value (0) makes crashing the solver
        a jackpot under terminal masking — typical rewards are ~-1, so a
        zero-reward terminal beats living at gamma=0.99 by ~+100 advantage,
        and a PPO policy measurably learned to diverge all lanes within one
        iteration when round 4 first shipped 0 here.  The reference
        sidesteps the question by RAISING on divergence in its single env
        (fluid_env._check_solver_health); a batch must keep healthy lanes
        running, so the penalty is the batched stand-in (documented
        deviation).  Default -100 ~= one bad reward / (1 - gamma).
    env_kwargs : forwarded to ``make``.
    """

    _AUTO_CHUNK = 128

    def __init__(
        self,
        env_id: str,
        n_envs: int,
        mesh: "jax.sharding.Mesh | None" = None,
        auto_reset: bool = True,
        lockstep_chunk: "int | str | None" = "auto",
        divergence_reward: float = -100.0,
        **env_kwargs: Any,
    ):
        self.divergence_reward = float(divergence_reward)
        self.env_id = env_id
        self.n_envs = int(n_envs)
        self.mesh = mesh
        self.auto_reset = bool(auto_reset)
        if lockstep_chunk == "auto":
            lockstep_chunk = None
            if mesh is None and self.n_envs > self._AUTO_CHUNK:
                c = self._AUTO_CHUNK
                while c > 1 and self.n_envs % c:
                    c -= 1
                lockstep_chunk = c if c > 1 else None
        self.lockstep_chunk = None if lockstep_chunk is None \
            else int(lockstep_chunk)
        if self.lockstep_chunk is not None:
            if self.lockstep_chunk <= 0 or self.n_envs % self.lockstep_chunk:
                raise ValueError(
                    f"lockstep_chunk={lockstep_chunk} must be a positive "
                    f"divisor of n_envs={n_envs}")
            if mesh is not None:
                raise ValueError(
                    "lockstep_chunk and mesh sharding are mutually exclusive "
                    "(shard the batch axis instead: each shard is already an "
                    "independent lockstep group)")
        # prototype env supplies spaces, config, geometry, and the pure step
        self.env = make(env_id, **env_kwargs)
        self._bstate = None
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P("dp"))
        self._jit_step = None
        self._jit_marl_step = None

    # ------------------------------------------------------------------
    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def use_marl(self) -> bool:
        return self.env.use_marl

    @property
    def n_agents(self) -> int:
        return self.env.n_agents

    def train(self) -> None:
        self.env.train()

    def val(self) -> None:
        self.env.val()

    def test(self) -> None:
        self.env.test()

    def seed(self, seed: int) -> None:
        self._seed = int(seed)
        self.env.seed(seed)

    def close(self) -> None:
        self._bstate = None

    # ------------------------------------------------------------------
    def _batched_step_fn(self, pure_step):
        """jit(vmap(pure_step)), optionally scanned over lockstep chunks."""
        vstep = jax.vmap(pure_step)
        c = self.lockstep_chunk
        if c is None or c >= self.n_envs:
            return jax.jit(vstep)
        n_chunks = self.n_envs // c

        def chunked(bstate, actions):
            split = lambda x: x.reshape((n_chunks, c) + x.shape[1:])
            merge = lambda x: x.reshape((n_chunks * c,) + x.shape[2:])
            xs = (jax.tree.map(split, bstate), jax.tree.map(split, actions))
            _, out = jax.lax.scan(
                lambda _, sa: (None, vstep(*sa)), None, xs)
            return jax.tree.map(merge, out)

        return jax.jit(chunked)

    # ------------------------------------------------------------------
    def _shard(self, tree):
        if self._sharding is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self._sharding.mesh, P())
        return jax.tree.map(
            lambda a: jax.device_put(
                a, self._sharding if jnp.ndim(a) else replicated
            ),
            tree,
        )

    def reset(self, seed: int | Sequence[int] | None = None,
              randomize: bool | None = None):
        """Reset every env (host loop builds per-env initial states; all
        later stepping is one device program)."""
        if isinstance(seed, (int, np.integer)) or seed is None:
            # None -> the seed set via seed(), falling back to 0 (reference
            # ParallelFluidEnv: 'If None, the current seed is used',
            # parallel_env.py:210-212)
            base = getattr(self, "_seed", 0) if seed is None else int(seed)
            seeds = [base + i for i in range(self.n_envs)]
        else:
            seeds = [int(s) for s in seed]
            if len(seeds) != self.n_envs:
                raise ValueError("need one seed per env")

        states = []
        obs_list = []
        for s in seeds:
            obs, _ = self.env.reset(seed=s, randomize=randomize)
            states.append(self.env._pure_carry())
            obs_list.append(obs)
        self._bstate = self._shard(
            jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)
        )
        self._step_counts = np.zeros(self.n_envs, np.int64)
        return self._aggregate_obs(obs_list), {}

    def _aggregate_obs(self, obs_list):
        """Stack (SARL) / concat over agents (MARL) -- parallel_env.py:177-200."""
        if self.use_marl:
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *obs_list)
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *obs_list)

    def step(self, actions: Array):
        """Step all envs with stacked actions ``(n_envs, *action_shape)``
        (SARL) or ``(n_envs * n_agents, *action_shape)`` (MARL)."""
        if self._bstate is None:
            raise RuntimeError("BatchedFluidEnv must be reset before stepping.")
        actions = jnp.asarray(actions, self.env._dtype)

        if self.use_marl:
            actions = actions.reshape(
                (self.n_envs, self.n_agents) + tuple(self.env.action_space.shape)
            )
            if self._jit_marl_step is None:
                self._jit_marl_step = self._batched_step_fn(
                    self.env._pure_step_marl)
            self._bstate, obs, rewards, info = self._jit_marl_step(
                self._bstate, actions
            )
            obs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), obs)
            rewards = rewards.reshape(-1)
        else:
            if self._jit_step is None:
                self._jit_step = self._batched_step_fn(self.env._pure_step)
            self._bstate, obs, rewards, info = self._jit_step(self._bstate, actions)
            if rewards.ndim == 2 and rewards.shape[1] == 1:
                rewards = rewards[:, 0]

        self._step_counts += 1
        truncated = self._step_counts >= self.env.episode_length
        terminated = self._per_env_terminated(info)
        # Late-divergence guard: a blowing-up lane can emit non-finite
        # rewards/observations one step BEFORE its pressure residual flags
        # (the solver converges on already-corrupt fields), which slips NaN
        # past the sanitization below and into training buffers (observed:
        # a PPO run's params went NaN mid-round-4).  Any lane whose reward
        # or observation is non-finite terminates NOW.
        na = self.n_agents if self.use_marl else 1
        rew_rows = np.asarray(
            jax.device_get(rewards)).reshape(self.n_envs, -1)
        bad = ~np.isfinite(rew_rows).all(axis=1)
        for leaf in jax.tree.leaves(obs):
            rows = np.asarray(jax.device_get(leaf)).reshape(
                self.n_envs, na, -1)
            bad |= ~np.isfinite(rows).all(axis=(1, 2))
        terminated = terminated | bad
        if bool(terminated.any()):
            # A diverged lane's reward/obs are NaN fields: a NaN reward
            # poisons advantage normalization and a NaN final_observation
            # poisons TD targets even when masked (0*NaN = NaN) -- the
            # MA-SAC iteration-7 NaN root cause.  Every terminated lane's
            # reward becomes a strong PENALTY, not a neutral 0 (see
            # ``divergence_reward``: a zero terminal is a jackpot next to
            # ~-1 living rewards, and PPO learned to crash the solver when
            # 0 was shipped here).
            lane = jnp.repeat(jnp.asarray(terminated),
                              rewards.shape[0] // self.n_envs)
            rewards = jnp.where(
                lane, jnp.asarray(self.divergence_reward, rewards.dtype),
                rewards)
            obs = jax.tree.map(
                lambda x: jnp.where(jnp.isfinite(x), x, 0.0), obs)
        done = terminated | truncated
        if self.auto_reset and bool(done.any()):
            obs, info = self._auto_reset_done(obs, info, done)
        return obs, rewards, terminated, truncated, info

    def _per_env_terminated(self, info) -> np.ndarray:
        """Diverged envs terminate (the host single-env path raises instead,
        fluid_env._check_solver_health; a batch must not kill its healthy
        lanes, so divergence is surfaced per slot here)."""
        res = info.get("pressure_residual")
        if res is None:
            return np.zeros(self.n_envs, bool)
        res = np.asarray(jax.device_get(res)).reshape(self.n_envs, -1)
        return ~np.isfinite(res).all(axis=1)

    def _auto_reset_done(self, obs, info, done: np.ndarray):
        """Splice fresh initial states into finished slots; return the new
        episodes' first observations in their rows and the finished episodes'
        last observations under ``info["final_observation"]`` (gymnasium
        vector convention)."""
        idx = np.nonzero(done)[0]
        info = dict(info)
        info["final_observation"] = jax.tree.map(
            lambda x: x[self._obs_rows(idx)], obs)

        carries, obs_rows = [], []
        for _ in idx:
            o, _ = self.env.reset()
            carries.append(self.env._pure_carry())
            obs_rows.append(o)
        new_states = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *carries)
        self._bstate = jax.tree.map(
            lambda b, n2: b.at[jnp.asarray(idx)].set(n2),
            self._bstate, new_states)
        rows = self._obs_rows(idx)
        if self.use_marl:
            new_obs = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *obs_rows)
        else:
            new_obs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *obs_rows)
        obs = jax.tree.map(
            lambda full, n2: full.at[jnp.asarray(rows)].set(n2), obs, new_obs)
        self._step_counts[idx] = 0
        return obs, info

    def _obs_rows(self, env_idx: np.ndarray) -> np.ndarray:
        """Observation rows for envs: 1:1 (SARL) or n_agents-per-env (MARL,
        where obs are concatenated along the agent axis)."""
        if not self.use_marl:
            return env_idx
        na = self.n_agents
        return (env_idx[:, None] * na + np.arange(na)[None, :]).reshape(-1)

    def load_initial_domain(self, mode: EnvMode, idx: int) -> None:
        """Load one initial domain into every batch slot
        (parallel_env.py:375-395)."""
        self.env.load_initial_domain(mode, idx)
        carry = self.env._pure_carry()
        self._bstate = self._shard(
            jax.tree.map(
                lambda a: jnp.broadcast_to(a, (self.n_envs,) + a.shape), carry
            )
        )
        self._step_counts = np.zeros(self.n_envs, np.int64)
