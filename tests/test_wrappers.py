"""Wrapper tests (mirrors reference tests/wrappers/test_wrappers.py:20-135)."""

import numpy as np
import pytest

import fluidgym_tpu
from fluidgym_tpu.wrappers import (
    ActionNoise,
    FlattenObservation,
    FluidWrapper,
    ObsExtraction,
    SensorNoise,
)

DEV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=3,
    step_length=0.1,
    dt=0.05,
    n_heaters=4,
    resolution=4,
)


@pytest.fixture(scope="module")
def env():
    return fluidgym_tpu.make("RBC2D-easy-v0", **DEV_KW)


def test_flatten_observation(env):
    w = FlattenObservation(env)
    n_expected = sum(
        int(np.prod(env.observation_space[k].shape))
        for k in ("temperature", "velocity")
    )
    assert w.observation_space.shape == (n_expected,)
    obs, info = w.reset(seed=0)
    assert obs.shape == (n_expected,)
    assert "original_temperature" in info
    obs, r, te, tr, info = w.step(w.sample_action())
    assert obs.shape == (n_expected,)


def test_obs_extraction(env):
    w = ObsExtraction(env, keys=["temperature"])
    assert set(w.observation_space.spaces) == {"temperature"}
    obs, _ = w.reset(seed=0)
    assert set(obs) == {"temperature"}
    obs, *_ = w.step(w.sample_action())
    assert set(obs) == {"temperature"}
    with pytest.raises(ValueError):
        ObsExtraction(env, keys=["nope"])
    with pytest.raises(ValueError):
        ObsExtraction(env, keys=[])


def test_noise_wrappers_preserve_shapes(env):
    w = SensorNoise(ActionNoise(env, sigma=0.1, seed=1), sigma=0.05, seed=2)
    obs, _ = w.reset(seed=0)
    for k, v in obs.items():
        assert tuple(v.shape) == tuple(env.observation_space[k].shape)
    obs, r, te, tr, info = w.step(w.sample_action())
    for k, v in obs.items():
        assert tuple(v.shape) == tuple(env.observation_space[k].shape)


def test_unwrapped(env):
    w = SensorNoise(FlattenObservation(env), sigma=0.1, seed=0)
    assert w.unwrapped is env
    assert isinstance(w, FluidWrapper)
    assert w.n_agents == env.n_agents


def test_gymnasium_adapter(env):
    from fluidgym_tpu.integration import GymFluidEnv

    g = GymFluidEnv(env, render_mode="rgb_array")
    obs, info = g.reset(seed=0)
    assert isinstance(obs, dict)
    assert all(isinstance(v, np.ndarray) for v in obs.values())
    a = np.asarray(g.action_space.sample())
    obs, reward, te, tr, info = g.step(a)
    assert isinstance(reward, float)
    assert isinstance(te, bool) and isinstance(tr, bool)
    frame = g.render()
    assert frame is not None and frame.ndim == 3
