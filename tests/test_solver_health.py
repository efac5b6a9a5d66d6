"""Solver-failure surfacing: the TPU-native replacement of the reference's
LinsolveError / single_step-returns-False protocol (PISOtorch_diff.py:262-371,
simulation.py:266-280).  Jitted programs cannot raise, so convergence metadata
comes back through the step ``info`` dict and the host path warns/raises."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu

ENV_KW = dict(
    n_heaters=4, resolution=4, episode_length=8, step_length=0.1, dt=0.05,
    load_initial_domain=False, load_domain_statistics=False,
    randomize_initial_state=False,
)


def _make_env(**cfg_overrides):
    env = fluidgym_tpu.make("RBC2D-easy-v0", **ENV_KW)
    if cfg_overrides:
        orig = env._get_simulation
        env._get_simulation = lambda: dataclasses.replace(orig(), **cfg_overrides)
    return env


def test_solver_info_in_step_info():
    env = _make_env()
    env.reset(seed=0)
    _, _, _, _, info = env.step(env.sample_action())
    assert bool(np.asarray(info["pressure_converged"]))
    assert bool(np.asarray(info["advection_converged"]))
    assert int(np.asarray(info["pressure_iterations"])) > 0
    res = float(np.asarray(info["pressure_residual"]))
    assert 0.0 < res <= 1e-5


def test_forced_nonconvergence_is_flagged(caplog):
    """tol=1e-12 / maxiter=5 cannot converge in fp32: the step must FLAG the
    failure (and warn once) instead of silently propagating a bad state."""
    env = _make_env(pressure_tol=1e-12, pressure_maxiter=5,
                    pressure_return_best_result=True)
    env.reset(seed=0)
    import logging

    with caplog.at_level(logging.WARNING):
        _, _, _, _, info = env.step(env.sample_action())
    assert not bool(np.asarray(info["pressure_converged"]))
    assert float(np.asarray(info["pressure_residual"])) > 1e-12
    assert any("did not converge" in r.message for r in caplog.records)
    # throttled: a second step does not warn again within the episode
    n_warn = len(caplog.records)
    with caplog.at_level(logging.WARNING):
        env.step(env.sample_action())
    assert len([r for r in caplog.records
                if "did not converge" in r.message]) == \
        len([r for r in caplog.records[:n_warn]
             if "did not converge" in r.message])


def test_nan_state_raises():
    """A diverged (NaN) state raises on the host path instead of silently
    returning NaN observations (reference LinsolveError)."""
    env = _make_env()
    env.reset(seed=0)
    blk = env._state.blocks[0]
    env._state = env._state.replace_block(
        0, dataclasses.replace(
            blk, velocity=blk.velocity * jnp.nan))
    with pytest.raises(FloatingPointError, match="diverged"):
        env.step(env.sample_action())


def test_differentiable_path_reports_info():
    """The custom_linear_solve path cannot surface iteration counts, but the
    post-hoc residual check still reports convergence (iterations=0 marks
    'untracked')."""
    env = fluidgym_tpu.make("RBC2D-easy-v0", differentiable=True, **ENV_KW)
    env.reset(seed=0)
    _, _, _, _, info = env.step(env.sample_action())
    assert bool(np.asarray(info["pressure_converged"]))
    assert int(np.asarray(info["pressure_iterations"])) == 0
