"""Airfoil environment contract tests (small step counts; physics validation
runs offline on TPU)."""

import numpy as np
import pytest

import fluidgym_tpu

DEV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=2,
    step_length=0.05,
    dt=0.05,
)


def test_airfoil_registry():
    ids = fluidgym_tpu.registry.ids()
    for want in ("Airfoil2D-easy-v0", "Airfoil2D-hard-v0",
                 "Airfoil3D-easy-v0", "Airfoil3D-medium-v0"):
        assert want in ids


def test_airfoil_grid_valid():
    from fluidgym_tpu.envs.airfoil.grid import make_airfoil_domain

    dom, info = make_airfoil_domain(
        ndims=2, res_z=0, H=1.4, L=4.5, vel_in=0.3, attack_angle_deg=10.0,
        viscosity=1e-4, tail_grow_mul=1.01)
    topo, geoms, state = dom.build()
    assert len(topo.blocks) == 6
    for g in geoms:
        assert float(np.asarray(g.det).min()) > 0


def test_airfoil_2d_contract():
    env = fluidgym_tpu.make("Airfoil2D-easy-v0", **DEV_KW)
    obs, _ = env.reset(seed=0)
    n = env._sensor_locations.shape[-1]
    assert obs["velocity"].shape == (n, 2)
    assert obs["pressure"].shape == (n,)
    assert env.action_space.shape == (3,)
    a = np.array([1.0, -0.5, -0.5], np.float32)
    obs, r, te, tr, info = env.step(a)
    assert np.isfinite(float(np.asarray(r)))
    assert np.isfinite(float(np.asarray(info["drag"])))
    assert np.isfinite(float(np.asarray(info["lift"])))


def test_airfoil_attack_angle_validation():
    with pytest.raises(ValueError):
        fluidgym_tpu.make("Airfoil2D-easy-v0", attack_angle_deg=25.0, **DEV_KW)


def test_airfoil_3d_smoke(monkeypatch):
    """Minimal 3D airfoil graph in the DEFAULT suite (round-3 verdict: a
    3D-only regression must not pass CI silently).  res_z=2 SARL is the
    cheapest 3D compile (~5 min on one CPU core — the fixed 6-block C-grid
    has no xy resolution knob, matching the reference's table-driven NACA
    grid); the full MARL contract stays @slow below."""
    from fluidgym_tpu.envs.airfoil.airfoil_env_3d import AirfoilEnv3D

    monkeypatch.setattr(AirfoilEnv3D, "_res_z", 2)
    env = fluidgym_tpu.make("Airfoil3D-easy-v0", n_agents=1,
                            init_from_2d=False, **DEV_KW)
    obs, _ = env.reset(seed=0)
    for v in obs.values():
        assert np.isfinite(np.asarray(v)).all()
    obs, r, te, tr, info = env.step(env.sample_action())
    assert np.isfinite(float(np.asarray(r)))
    assert np.isfinite(float(np.asarray(info["drag"])))


@pytest.mark.slow  # ~21 min on one CPU core (3D airfoil compile + steps)
def test_airfoil_3d_marl_contract(monkeypatch):
    import jax.numpy as jnp

    from fluidgym_tpu.envs.airfoil.airfoil_env_3d import AirfoilEnv3D

    monkeypatch.setattr(AirfoilEnv3D, "_res_z", 8)
    # small render grid: the production (600, 150, 150) resample plan is far
    # too large for a unit test
    monkeypatch.setattr(AirfoilEnv3D, "render_shape",
                        property(lambda self: (120, 30, 30)))
    env = fluidgym_tpu.make(
        "Airfoil3D-easy-v0", n_agents=4, use_marl=True, local_obs_window=3,
        local_reward_weight=0.5, init_from_2d=False, **DEV_KW)
    assert env.n_agents == 4
    obs, _ = env.reset(seed=0)
    n = env._sensor_locations.shape[-1]
    assert obs["velocity"].shape == (4, 3, 1, 3, n)
    assert obs["pressure"].shape == (4, 3, 1, n)
    actions = jnp.asarray([[1.0, 0.0, -1.0]] * 4, jnp.float32)
    obs, rewards, te, tr, info = env.step(actions)
    rewards = np.asarray(rewards)
    assert rewards.shape == (4,)
    assert np.isfinite(rewards).all()
    assert np.isfinite(float(np.asarray(info["global_reward"])))


def test_airfoil_action_zero_mean():
    """The jet multiplier removes the action mean (airfoil_env_2d.py:169-177)."""
    import jax.numpy as jnp

    env = fluidgym_tpu.make("Airfoil2D-easy-v0", **DEV_KW)
    env.reset(seed=0)
    m = env._pure_action_multiplier(jnp.asarray([2.0, 2.0, 2.0]))
    assert np.allclose(np.asarray(m), 0.0)
    m = env._pure_action_multiplier(jnp.asarray([1.0, 0.0, -1.0]))
    masked = np.asarray(env._jet_masks)
    assert np.allclose(np.asarray(m)[masked[0] > 0], 1.0)
    assert np.allclose(np.asarray(m)[masked[2] > 0], -1.0)


@pytest.mark.slow  # ~9 min on one CPU core
def test_airfoil_local_2d_obs_matches_2d_env_shapes(monkeypatch):
    """local_2d_obs 3D MARL agents see observations shaped exactly like the
    2D env's (reference tests/envs/test_all_envs.py:102-126, Airfoil3D row)."""
    from fluidgym_tpu.envs.airfoil.airfoil_env_3d import AirfoilEnv3D

    monkeypatch.setattr(AirfoilEnv3D, "_res_z", 8)  # CPU-sized span
    kw = dict(DEV_KW)
    env2d = fluidgym_tpu.make("Airfoil2D-easy-v0", **kw)
    env3d = fluidgym_tpu.make("Airfoil3D-easy-v0", use_marl=True,
                              local_2d_obs=True, init_from_2d=False, **kw)

    for key, space2d in env2d.observation_space.spaces.items():
        assert env3d.observation_space[key].shape == space2d.shape, key

    obs2d, _ = env2d.reset(seed=42)
    obs3d, _ = env3d.reset(seed=42)
    for key in obs2d:
        assert obs3d[key].shape == (env3d.n_agents, *obs2d[key].shape), key

    a3 = np.zeros((env3d.n_agents,) + env3d.action_space.shape, np.float32)
    obs3d, rew, term, trunc, info = env3d.step(a3)
    for key in obs2d:
        assert obs3d[key].shape == (env3d.n_agents, *obs2d[key].shape), key
