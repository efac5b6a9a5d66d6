"""Brute-force checks of the moving-window observation extraction.

Mirrors the reference's unit strategy (tests/env_utils/test_obs_extraction.py
:12-149 in /root/reference): each vectorized window extraction is pinned
against a plain-Python loop over random tensors — pure CPU, no simulation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fluidgym_tpu.envs.util.obs_extraction import (
    extract_moving_window_2d,
    extract_moving_window_2d_x_z,
    extract_moving_window_3d,
    gather_sensors_2d,
)


@pytest.mark.parametrize("n_agents,agent_width,win", [(6, 3, 3), (5, 2, 5), (4, 4, 1)])
def test_moving_window_2d_bruteforce(n_agents, agent_width, win):
    rng = np.random.default_rng(0)
    Y, X = 7, n_agents * agent_width
    field = rng.normal(size=(Y, X)).astype(np.float32)
    out = np.asarray(extract_moving_window_2d(
        jnp.asarray(field), n_agents, agent_width, win))
    assert out.shape == (n_agents, Y, win * agent_width)
    pad = win // 2
    for a in range(n_agents):
        cols = []
        for off in range(-pad, -pad + win):
            blk = (a + off) % n_agents
            cols.append(field[:, blk * agent_width:(blk + 1) * agent_width])
        expect = np.concatenate(cols, axis=1)
        np.testing.assert_allclose(out[a], expect, rtol=0, atol=0)


@pytest.mark.parametrize("nax,naz,w,Wx,Wz,px,pz", [
    (4, 3, 2, 3, 3, 0, 0),
    (3, 3, 2, 2, 2, 1, 1),
])
def test_moving_window_2d_x_z_bruteforce(nax, naz, w, Wx, Wz, px, pz):
    rng = np.random.default_rng(1)
    field = rng.normal(size=(naz * w, nax * w)).astype(np.float32)
    out = np.asarray(extract_moving_window_2d_x_z(
        jnp.asarray(field), nax, naz, w, Wx, Wz, pad_x=px, pad_z=pz))
    assert out.shape == (nax * naz, Wz, Wx)
    # brute-force agent means
    means = np.zeros((naz, nax), np.float32)
    for iz in range(naz):
        for ix in range(nax):
            means[iz, ix] = field[iz * w:(iz + 1) * w, ix * w:(ix + 1) * w].mean()
    rolled = np.roll(means, (pz, px), axis=(0, 1))
    k = 0
    for ix in range(nax):          # x-major agent order
        for iz in range(naz):
            expect = np.empty((Wz, Wx), np.float32)
            for dz in range(Wz):
                for dx in range(Wx):
                    expect[dz, dx] = rolled[(iz + dz) % naz, (ix + dx) % nax]
            np.testing.assert_allclose(out[k], expect, rtol=0, atol=1e-6)
            k += 1


@pytest.mark.parametrize("n_agents,agent_width,win", [(4, 2, 3), (3, 3, 1)])
def test_moving_window_3d_bruteforce(n_agents, agent_width, win):
    rng = np.random.default_rng(2)
    Z = X = n_agents * agent_width
    Y = 5
    field = rng.normal(size=(Z, Y, X)).astype(np.float32)
    out = np.asarray(extract_moving_window_3d(
        jnp.asarray(field), n_agents, agent_width, win))
    w = win * agent_width
    assert out.shape == (n_agents ** 2, w, Y, w)
    pad = (win // 2) * agent_width
    padded = np.pad(field, ((pad, pad), (0, 0), (pad, pad)), mode="wrap")
    k = 0
    for iz in range(n_agents):     # z-major agent order
        for ix in range(n_agents):
            z0, x0 = iz * agent_width, ix * agent_width
            np.testing.assert_allclose(
                out[k], padded[z0:z0 + w, :, x0:x0 + w], rtol=0, atol=0)
            k += 1


def test_gather_sensors_2d():
    rng = np.random.default_rng(3)
    field = rng.normal(size=(10, 12)).astype(np.float32)
    xy = jnp.asarray([[0, 11, 5], [0, 9, 3]])  # (2, n): x row, y row
    out = np.asarray(gather_sensors_2d(jnp.asarray(field), xy))
    # brute force: sensor i reads field[y_i, x_i]
    expect = np.array([field[0, 0], field[9, 11], field[3, 5]], np.float32)
    np.testing.assert_allclose(out, expect)
