"""Cylinder environment contract tests (small configs; physics validation
runs offline on TPU -- Strouhal/Cd checks live in the bench harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu

DEV_KW = dict(
    resolution=16,
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=3,
    step_length=0.02,
    dt=0.01,
)


@pytest.fixture(scope="module")
def jet_env():
    return fluidgym_tpu.make("CylinderJet2D-easy-v0", **DEV_KW)


def test_cylinder_registry():
    ids = fluidgym_tpu.registry.ids()
    for want in ("CylinderJet2D-easy-v0", "CylinderJet2D-hard-v0",
                 "CylinderRot2D-easy-v0", "CylinderRot2D-medium-v0"):
        assert want in ids


def test_jet_contract(jet_env):
    env = jet_env
    obs, info = env.reset(seed=0)
    assert set(obs) == {"velocity", "pressure"}
    assert obs["velocity"].shape == (151, 2)
    assert obs["pressure"].shape == (151,)
    a = env.sample_action()
    obs, reward, te, tr, info = env.step(a)
    assert np.isfinite(float(np.asarray(reward)))
    for k in ("drag", "lift"):
        assert k in info
        assert np.isfinite(float(np.asarray(info[k])))
    # impulsively-started flow: drag must be positive
    assert float(np.asarray(info["drag"])) > 0


def test_jet_action_changes_flow(jet_env):
    env = jet_env
    env.reset(seed=1)
    snap = env.get_state()
    _, r0, *_ = env.step(jnp.zeros((1,)))
    env.set_state(snap)
    _, r1, *_ = env.step(jnp.ones((1,)))
    assert not np.isclose(float(np.asarray(r0)), float(np.asarray(r1)))


def test_rot_env_steps():
    env = fluidgym_tpu.make("CylinderRot2D-easy-v0", **DEV_KW)
    obs, _ = env.reset(seed=0)
    obs, reward, te, tr, info = env.step(env.sample_action())
    assert np.isfinite(float(np.asarray(reward)))


def test_jet3d_marl_contract():
    env = fluidgym_tpu.make(
        "CylinderJet3D-easy-v0", resolution=8, n_jets=4, use_marl=True,
        local_obs_window=3, local_reward_weight=0.8,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=2,
        step_length=0.02, dt=0.01,
    )
    assert env.n_agents == 4
    obs, _ = env.reset(seed=0)
    # (n_jets, window, n_sensors_per_agent, ndims, 151)
    assert obs["velocity"].shape == (4, 3, 2, 3, 151)
    assert obs["pressure"].shape == (4, 3, 2, 151)
    actions = jnp.asarray([[1.0], [-1.0], [1.0], [-1.0]], jnp.float32)
    obs, rewards, te, tr, info = env.step(actions)
    rewards = np.asarray(rewards)
    assert rewards.shape == (4,)
    assert np.isfinite(rewards).all()
    assert np.isfinite(float(np.asarray(info["global_reward"])))
    # antisymmetric jets on a symmetric flow: per-jet rewards must differ
    assert not np.isclose(rewards[0], rewards[1])


def test_divergence_free_after_init(jet_env):
    """Post-reset velocity is (approximately) solenoidal: the projection at
    reset must leave divergence SMALL relative to the O(1) inflow velocity,
    not merely finite (the impulsive start around the cylinder wall puts O(1)
    divergence into the unprojected field)."""
    from fluidgym_tpu.solver import stencil as st

    env = jet_env
    env.reset(seed=2)
    divs = st.velocity_divergence(env._state, env._geoms, env._topo)
    for d in divs:
        d = np.asarray(d)
        assert np.isfinite(d).all()
        # unprojected impulsive start: div ~ U/h ~ O(10) at the wall for the
        # res-16 fixture; the projection must knock it down by >~100x
        assert np.sqrt((d**2).mean()) < 2e-2
        assert np.abs(d).max() < 0.2


def test_local_2d_obs_matches_2d_env_shapes():
    """local_2d_obs 3D MARL agents see observations shaped exactly like the
    2D env's observations (reference tests/envs/test_all_envs.py:102-126):
    enables direct 2D-policy transfer to the 3D env."""
    import fluidgym_tpu

    env2d = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=8,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=4,
        step_length=0.05, dt=0.01)
    env3d = fluidgym_tpu.make(
        "CylinderJet3D-easy-v0", resolution=8, n_jets=2, use_marl=True,
        local_2d_obs=True, load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False,
        episode_length=4, step_length=0.05, dt=0.01)

    # spaces: per-agent 3D space == the 2D env space, key for key
    for key, space2d in env2d.observation_space.spaces.items():
        assert env3d.observation_space[key].shape == space2d.shape, key

    obs2d, _ = env2d.reset(seed=0)
    obs3d, _ = env3d.reset(seed=0)
    for key in obs2d:
        per_agent = obs3d[key]
        assert per_agent.shape == (env3d.n_agents, *obs2d[key].shape), key

    a3 = np.zeros((env3d.n_agents, 1), np.float32)
    obs3d, rew, term, trunc, info = env3d.step(a3)
    assert rew.shape == (env3d.n_agents,)
    for key in obs2d:
        assert obs3d[key].shape == (env3d.n_agents, *obs2d[key].shape), key
        assert np.isfinite(np.asarray(obs3d[key])).all()



def test_hard_tier_upwind_blend_gating():
    """Re >= 500 tiers ship with upwind-blended advection (the central
    scheme blows up at hard-tier cell Peclet numbers; VALIDATION.md
    "Resolution (2026-08-18)"); validated easy/medium physics stays on
    the reference's central scheme."""
    easy = fluidgym_tpu.make("CylinderJet2D-easy-v0", **DEV_KW)
    hard = fluidgym_tpu.make("CylinderJet2D-hard-v0", **DEV_KW)
    assert easy._get_simulation().advection_upwind_blend == 0.0
    assert hard._get_simulation().advection_upwind_blend == 0.3
    # stepping the hard tier with the blend stays finite
    hard.reset(seed=0)
    for _ in range(3):
        _, _, _, _, info = hard.step(np.zeros(hard.action_space.shape,
                                              np.float32))
    assert np.isfinite(float(np.asarray(info["drag"]).mean()))
