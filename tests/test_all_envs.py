"""Contract sweep over EVERY registered environment id.

Mirrors the reference's parameterized all-envs test
(tests/envs/test_all_envs.py:51-99 in /root/reference): each id must
construct through the public ``make`` API and expose a coherent
observation/action space contract.  Per-family reset/step contracts (which
require compiling the PISO step) live in the per-family test modules; this
sweep keeps construction + space checks cheap enough to cover all 39 ids.
"""

import numpy as np
import pytest

import fluidgym_tpu

COMMON = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=2,
)


def _dev_kwargs(env_id: str) -> dict:
    """Per-family tiny-size overrides so the sweep stays fast on CPU."""
    if env_id.startswith("RBC"):
        return dict(COMMON, n_heaters=4, resolution=4, local_obs_window=3,
                    step_length=0.1, dt=0.05)
    if env_id.startswith("Cylinder"):
        kw = dict(COMMON, resolution=16, step_length=0.02, dt=0.01)
        if "3D" in env_id:
            kw["n_jets"] = 4
        return kw
    if env_id.startswith("TCF"):
        return dict(COMMON, resolution_y=9, resolution_x_z=8, actor_size=2,
                    step_length=0.6)
    if env_id.startswith("Airfoil"):
        return dict(COMMON, step_length=0.05, dt=0.05)
    raise AssertionError(f"unknown family for {env_id}")


ALL_IDS = fluidgym_tpu.registry.ids()


def test_registry_is_complete():
    # 12 RBC + 9 cylinder + 12 TCF + 6 airfoil (superset of the reference's
    # 35 tier ids, src/fluidgym/__init__.py:28-352)
    assert len(ALL_IDS) == 39


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_make_and_spaces(env_id):
    env = fluidgym_tpu.make(env_id, **_dev_kwargs(env_id))

    # observation space: Dict of Box spaces with concrete shapes
    obs_space = env.observation_space
    assert hasattr(obs_space, "spaces") and len(obs_space.spaces) > 0
    for key, sub in obs_space.spaces.items():
        assert isinstance(key, str)
        assert all(int(s) > 0 for s in sub.shape), (env_id, key, sub.shape)

    # action space: concrete shape; per-agent in MARL (matches reference
    # convention, rbc_env_2d.py:112-122)
    act_space = env.action_space
    assert all(int(s) > 0 for s in act_space.shape), (env_id, act_space.shape)
    joint_shape = tuple(act_space.shape)
    if env.use_marl:
        assert env.n_agents > 1
        joint_shape = (env.n_agents,) + joint_shape

    # declared metrics are non-empty strings
    assert len(env.metrics) > 0
    assert all(isinstance(m, str) and m for m in env.metrics)

    # sampled (joint) action conforms to the joint action shape
    env.seed(0)
    a = np.asarray(env.sample_action())
    assert a.shape == joint_shape, (env_id, a.shape, joint_shape)
    assert np.isfinite(a).all()


@pytest.mark.parametrize("env_id", [i for i in ALL_IDS if "2D" in i])
def test_2d_ids_reset_step(env_id):
    """Reset + one step for every 2D id (3D ids are stepped in the
    per-family modules; compiling all 12 3D PISO graphs here would dominate
    suite runtime)."""
    env = fluidgym_tpu.make(env_id, **_dev_kwargs(env_id))
    obs, info = env.reset(seed=1)
    space = env.observation_space
    assert set(obs.keys()) == set(space.spaces.keys())
    for k, v in obs.items():
        assert tuple(np.asarray(v).shape) == tuple(space[k].shape), (env_id, k)
        assert np.isfinite(np.asarray(v)).all(), (env_id, k)
    obs, reward, terminated, truncated, info = env.step(env.sample_action())
    assert np.isfinite(np.asarray(reward)).all(), env_id
    assert isinstance(terminated, bool) and isinstance(truncated, bool)
    for metric in env.metrics:
        assert metric in info, (env_id, metric)
