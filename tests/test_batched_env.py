"""Batched env + mesh sharding tests (TPU-native ParallelFluidEnv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.parallel import BatchedFluidEnv

DEV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=3,
    step_length=0.1,
    dt=0.05,
    n_heaters=4,
    resolution=4,
    local_obs_window=3,
)


def test_batched_sarl_step():
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=4, **DEV_KW)
    obs, info = benv.reset(seed=0)
    for k, v in obs.items():
        assert v.shape == (4,) + tuple(benv.observation_space[k].shape)
    actions = np.stack([np.asarray(benv.env.sample_action()) for _ in range(4)])
    obs, rewards, term, trunc, info = benv.step(actions)
    assert rewards.shape == (4,)
    assert np.isfinite(np.asarray(rewards)).all()
    for k, v in obs.items():
        assert v.shape == (4,) + tuple(benv.observation_space[k].shape)
    # different seeds -> different states -> (almost surely) different rewards
    assert len(np.unique(np.asarray(rewards).round(8))) > 1


def test_batched_sharded_over_mesh():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=8, mesh=mesh, **DEV_KW)
    obs, _ = benv.reset(seed=0)
    actions = np.zeros((8,) + tuple(benv.action_space.shape), np.float32)
    obs, rewards, *_ = benv.step(actions)
    assert rewards.shape == (8,)
    assert np.isfinite(np.asarray(rewards)).all()


def test_diverged_lane_rewards_and_obs_sanitized():
    """A diverged lane terminates AND its NaN reward/obs are zeroed: a NaN
    reward poisons advantage normalization and a NaN final_observation
    poisons TD targets even when masked (0*NaN = NaN) — the MA-SAC
    iteration-7 NaN root cause (round-3 verdict)."""
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=3, **DEV_KW)
    benv.reset(seed=0)
    benv._bstate = jax.tree.map(
        lambda x: x.at[1].set(jnp.nan)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        benv._bstate)
    actions = np.zeros((3,) + tuple(benv.action_space.shape), np.float32)
    obs, rew, term, trunc, info = benv.step(actions)
    assert bool(term[1]) and not bool(term[0]) and not bool(term[2])
    assert np.isfinite(np.asarray(rew)).all()
    # the diverged lane's reward is a strong PENALTY, never a neutral 0:
    # a zero terminal out-scores ~-1 living rewards under terminal masking
    # and teaches policies to crash the solver (observed with PPO)
    assert float(rew[1]) == benv.divergence_reward < -10.0
    for v in obs.values():
        assert np.isfinite(np.asarray(v)).all()
    for v in info["final_observation"].values():
        assert np.isfinite(np.asarray(v)).all()
    # the diverged lane was auto-reset in place: the next step is healthy
    obs, rew, term, trunc, info = benv.step(actions)
    assert not np.asarray(term).any()
    assert np.isfinite(np.asarray(rew)).all()


def test_late_divergence_guard_terminates_on_bad_obs(monkeypatch):
    """A blowing-up lane can emit non-finite rewards/obs one step BEFORE
    its pressure residual flags; the step must terminate it from the
    reward/obs finiteness itself (round-4 PPO params-NaN root cause)."""
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=3, **DEV_KW)
    benv.reset(seed=0)
    benv._bstate = jax.tree.map(
        lambda x: x.at[1].set(jnp.nan)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        benv._bstate)
    # blind the residual-based detector: only the finiteness guard remains
    monkeypatch.setattr(
        benv, "_per_env_terminated",
        lambda info: np.zeros(benv.n_envs, bool))
    actions = np.zeros((3,) + tuple(benv.action_space.shape), np.float32)
    obs, rew, term, trunc, info = benv.step(actions)
    assert bool(term[1]) and not bool(term[0]) and not bool(term[2])
    assert float(rew[1]) == benv.divergence_reward
    for v in obs.values():
        assert np.isfinite(np.asarray(v)).all()


def test_batched_marl_step():
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=2, use_marl=True, **DEV_KW)
    obs, _ = benv.reset(seed=0)
    n_total = 2 * benv.n_agents
    for k, v in obs.items():
        assert v.shape[0] == n_total
    actions = np.zeros((n_total,) + tuple(benv.action_space.shape), np.float32)
    obs, rewards, *_ = benv.step(actions)
    assert rewards.shape == (n_total,)


def test_batched_cylinder_tuple_carry():
    """Envs with auxiliary carried state (cylinder: last_control) batch via
    the _pure_carry protocol."""
    import numpy as np

    from fluidgym_tpu.parallel import BatchedFluidEnv

    benv = BatchedFluidEnv(
        "CylinderJet2D-easy-v0", n_envs=3, resolution=16,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=2,
        step_length=0.02, dt=0.01,
    )
    obs, _ = benv.reset(seed=0)
    assert obs["velocity"].shape == (3, 151, 2)
    actions = np.zeros((3, 1), np.float32)
    obs, rewards, term, trunc, info = benv.step(actions)
    rewards = np.asarray(rewards)
    assert rewards.shape == (3,)
    assert np.isfinite(rewards).all()
    # identical seeds across slots would differ; distinct seeds gave
    # identical initial states here (no randomization), so rewards match
    assert np.allclose(rewards, rewards[0])


def test_seed_method_affects_unseeded_reset():
    """reset(seed=None) must use the seed set via seed() (reference
    ParallelFluidEnv contract, parallel_env.py:210-212)."""
    def make_benv():
        from fluidgym_tpu.parallel import BatchedFluidEnv
        return BatchedFluidEnv(
            "RBC2D-easy-v0", n_envs=2, n_heaters=4, resolution=4,
            local_obs_window=3, load_initial_domain=False,
            load_domain_statistics=False, episode_length=3,
            step_length=0.1, dt=0.05)

    b1 = make_benv(); b1.seed(42)
    o1, _ = b1.reset()
    b2 = make_benv(); b2.seed(7)
    o2, _ = b2.reset()
    diff = max(float(np.abs(np.asarray(o1[k]) - np.asarray(o2[k])).max())
               for k in o1)
    assert diff > 0.0, "different seed() must change unseeded reset"


def test_batched_auto_reset():
    """Finished slots are reset in place; unfinished slots keep stepping
    (gymnasium vector / reference VecEnv auto-reset semantics)."""
    kw = dict(DEV_KW, episode_length=2)
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=3, **kw)
    obs0, _ = benv.reset(seed=0)
    nact = benv.action_space.shape[0]
    actions = jnp.zeros((3, nact), jnp.float32)

    obs, rew, term, trunc, info = benv.step(actions)
    assert not trunc.any() and not term.any()
    assert "final_observation" not in info

    obs, rew, term, trunc, info = benv.step(actions)
    assert trunc.all()
    assert "final_observation" in info
    fin = info["final_observation"]
    assert np.asarray(fin).shape == np.asarray(obs).shape
    # final_observation must be the OLD episodes' true last obs (what the
    # un-reset trajectory would have produced), not the new episodes'
    # first obs -- SAC/PPO boundary bootstrapping depends on this
    ref = BatchedFluidEnv("RBC2D-easy-v0", n_envs=3, auto_reset=False, **kw)
    ref.reset(seed=0)
    robs, *_ = ref.step(actions)
    robs, *_ = ref.step(actions)
    for k in robs:
        np.testing.assert_allclose(np.asarray(fin[k]), np.asarray(robs[k]),
                                   rtol=0, atol=0)
    # counts were reset: the next step must not truncate
    obs, rew, term, trunc, info = benv.step(actions)
    assert not trunc.any()


def test_batched_auto_reset_off():
    kw = dict(DEV_KW, episode_length=1)
    benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=2, auto_reset=False, **kw)
    benv.reset(seed=0)
    nact = benv.action_space.shape[0]
    obs, rew, term, trunc, info = benv.step(jnp.zeros((2, nact), jnp.float32))
    assert trunc.all()
    assert "final_observation" not in info


def test_lockstep_chunk_matches_unchunked():
    """Chunked stepping is a pure scheduling change: rewards and states match
    the single lockstep batch bit-for-bit (same per-lane masked solves)."""
    kw = dict(DEV_KW, episode_length=10**9)
    full = BatchedFluidEnv("RBC2D-easy-v0", n_envs=4, **kw)
    chunked = BatchedFluidEnv("RBC2D-easy-v0", n_envs=4, lockstep_chunk=2,
                              **kw)
    obs_f, _ = full.reset(seed=0)
    obs_c, _ = chunked.reset(seed=0)
    actions = np.stack([np.asarray(full.env.sample_action())
                        for _ in range(4)])
    for _ in range(2):
        obs_f, r_f, *_ = full.step(actions)
        obs_c, r_c, *_ = chunked.step(actions)
    np.testing.assert_array_equal(np.asarray(r_f), np.asarray(r_c))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), full._bstate, chunked._bstate)


def test_lockstep_chunk_validation():
    with pytest.raises(ValueError, match="divisor"):
        BatchedFluidEnv("RBC2D-easy-v0", n_envs=4, lockstep_chunk=3, **DEV_KW)
