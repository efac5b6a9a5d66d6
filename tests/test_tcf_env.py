"""TCF environment contract tests (tiny channel; CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu

DEV_KW = dict(
    resolution_y=17,
    resolution_x_z=16,
    actor_size=4,
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=3,
    step_length=0.6,
)


def test_tcf_registry():
    ids = fluidgym_tpu.registry.ids()
    assert len([i for i in ids if i.startswith("TCF")]) == 12
    assert "TCFSmall3D-bottom-easy-v0" in ids
    assert "TCFLarge3D-both-hard-v0" in ids
    assert len(ids) == 39  # 12 RBC + 9 cylinder + 12 TCF + 6 airfoil


@pytest.fixture(scope="module")
def tcf_env():
    return fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0", use_marl=False, **DEV_KW)


def test_tcf_sarl_contract(tcf_env):
    env = tcf_env
    obs, info = env.reset(seed=0)
    assert obs["velocity"].shape == (2, 16, 16)
    assert obs["pressure"].shape == (16, 16)
    a = env.sample_action()
    obs, reward, te, tr, info = env.step(a)
    assert np.isfinite(float(np.asarray(reward)))
    for k in env.metrics:
        assert k in info and np.isfinite(float(np.asarray(info[k])))
    # bottom wall stress should be positive for streamwise channel flow
    assert float(np.asarray(info["wall_stress_bottom"])) > 0


def test_tcf_marl_contract():
    env = fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0", use_marl=True,
                            local_obs_window=3, **DEV_KW)
    obs, _ = env.reset(seed=0)
    assert env.n_agents == (16 // 4) ** 2
    assert obs["velocity"].shape == (env.n_agents, 3, 3, 2)
    assert obs["pressure"].shape == (env.n_agents, 3, 3)
    actions = env.sample_action()
    obs, rewards, te, tr, info = env.step(actions)
    assert rewards.shape == (env.n_agents,)
    assert "global_reward" in info


def test_tcf_both_env():
    env = fluidgym_tpu.make("TCFSmall3D-both-easy-v0", use_marl=True,
                            local_obs_window=1, **DEV_KW)
    obs, _ = env.reset(seed=1)
    assert env.n_agents == 2 * (16 // 4) ** 2
    assert obs["pressure"].shape[0] == env.n_agents
    actions = env.sample_action()
    obs, rewards, te, tr, info = env.step(actions)
    assert rewards.shape == (env.n_agents,)


def test_tcf_smagorinsky_runs():
    env = fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0", use_marl=False,
                            C_smag=0.1, use_van_driest=True, **DEV_KW)
    obs, _ = env.reset(seed=0)
    obs, reward, *_ = env.step(env.sample_action())
    assert np.isfinite(float(np.asarray(reward)))


def test_prep_fn_before_additional_initialization():
    """The base reset calls _get_prep_fn BEFORE _additional_initialization
    (fluid_env.py); on the disk-load path _channel_info is not yet built --
    it must be rebuilt lazily rather than crash (default-config regression)."""
    env = fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0", use_marl=False, **DEV_KW)
    assert not hasattr(env, "_channel_info")
    hooks = env._get_prep_fn()  # must not raise
    assert hooks and hasattr(env, "_channel_info")


def test_both_env_local_obs_honors_requested_slice():
    env = fluidgym_tpu.make("TCFSmall3D-both-easy-v0", use_marl=True,
                            **DEV_KW)
    env.reset(seed=0)
    both = env._pure_local_obs(env._state)
    bottom_only = env._pure_local_obs(env._state,
                                      y_idx=env._y_obs_bottom_idx)
    for k in both:
        assert both[k].shape[0] == 2 * bottom_only[k].shape[0]


def test_opposition_control_episode_archival(tmp_path, monkeypatch):
    """Opposition-control episode CSVs round-trip next to the initial-domain
    dataset (reference tcf_env.py:1017-1062), keyed by actuation kind."""
    import pandas as pd

    import fluidgym_tpu
    from fluidgym_tpu.types import EnvMode

    env = fluidgym_tpu.make(
        "TCFSmall3D-bottom-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, use_marl=False)
    rows = [{"t": 0, "wall_stress": 1.0}, {"t": 1, "wall_stress": 0.9}]
    env.save_opposition_control_episode(0, EnvMode.TRAIN, rows)
    df = env.load_opposition_control_episode(0, EnvMode.TRAIN)
    assert list(df.columns) == ["t", "wall_stress"]
    assert len(df) == 2
    path = env._opposition_episode_path(EnvMode.TRAIN, 0)
    assert path.name == "train_00_opposition_control_bottom_episode.csv"

    env.save_opposition_control_episode(1, EnvMode.VAL, pd.DataFrame(rows))
    assert env.load_opposition_control_episode(1, EnvMode.VAL).shape == (2, 2)

    import pytest

    with pytest.raises(FileNotFoundError):
        env.load_opposition_control_episode(7, EnvMode.TEST)
