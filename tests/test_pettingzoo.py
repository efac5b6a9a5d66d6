"""PettingZoo adapter contract test (pettingzoo is installed in this env;
mirrors the reference integration surface, integration/pettingzoo.py:14-203)."""

import numpy as np
import pytest

pytest.importorskip("pettingzoo")

import fluidgym_tpu
from fluidgym_tpu.integration.pettingzoo import PettingZooFluidEnv
from fluidgym_tpu.wrappers import FlattenObservation

DEV_KW = dict(
    n_heaters=4, resolution=4, use_marl=True, local_obs_window=3,
    load_initial_domain=False, load_domain_statistics=False,
    randomize_initial_state=False, episode_length=3,
    step_length=0.1, dt=0.05,
)


@pytest.fixture(scope="module")
def penv():
    env = fluidgym_tpu.make("RBC2D-easy-v0", **DEV_KW)
    return PettingZooFluidEnv(FlattenObservation(env))


def test_requires_marl_and_flat_obs():
    sarl = fluidgym_tpu.make("RBC2D-easy-v0", **{**DEV_KW, "use_marl": False})
    with pytest.raises(ValueError):
        PettingZooFluidEnv(FlattenObservation(sarl))
    marl_dict = fluidgym_tpu.make("RBC2D-easy-v0", **DEV_KW)
    with pytest.raises(ValueError):
        PettingZooFluidEnv(marl_dict)  # un-flattened Dict obs


def test_parallel_api_contract(penv):
    n = len(penv.possible_agents)
    assert n > 1
    obs, infos = penv.reset(seed=0)
    assert set(obs) == set(penv.possible_agents)
    for a in penv.possible_agents:
        o = obs[a]
        assert tuple(o.shape) == tuple(penv.observation_space(a).shape)
        assert np.isfinite(o).all()

    actions = {a: penv.action_space(a).sample() for a in penv.possible_agents}
    obs, rewards, terms, truncs, infos = penv.step(actions)
    assert set(rewards) == set(penv.possible_agents)
    for a in penv.possible_agents:
        assert np.isfinite(rewards[a])
        assert isinstance(terms[a], bool) and isinstance(truncs[a], bool)


def test_truncation_clears_agents(penv):
    penv.reset(seed=1)
    for _ in range(3):  # episode_length = 3
        actions = {a: penv.action_space(a).sample()
                   for a in penv.possible_agents}
        obs, rewards, terms, truncs, infos = penv.step(actions)
    assert all(truncs.values())
    assert penv.agents == []
