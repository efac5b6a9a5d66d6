"""Turbulence statistics tests: VelocityStats, TKE budgets, two-point corr."""

import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.envs.tcf.statistics import VelocityStats
from fluidgym_tpu.utils.online_statistics import (
    budget_finalize,
    budget_init,
    budget_update,
    two_point_corr_from_data,
)


def _channel_y(ny):
    edges = np.tanh(np.linspace(-1.5, 1.5, ny + 1)) / np.tanh(1.5)
    return 0.5 * (edges[:-1] + edges[1:])


def test_velocity_stats_recovers_moments(tmp_path):
    ny = 32
    y = _channel_y(ny)
    vs = VelocityStats(y, viscosity=1e-3)
    rng = np.random.default_rng(0)
    U = 1 - y**2
    for _ in range(10):
        u = np.zeros((3, 8, ny, 16), np.float32)
        u[0] = U[None, :, None] + rng.normal(0, 0.05, (8, ny, 16))
        u[1] = rng.normal(0, 0.02, (8, ny, 16))
        u[2] = rng.normal(0, 0.02, (8, ny, 16))
        vs.record(jnp.asarray(u))
    p = vs.profiles()
    uw = vs.u_wall
    assert abs(p["U+"][ny // 2] * uw - 1.0) < 0.05       # centerline U
    assert abs(p["u'+"].mean() * uw - 0.05) < 0.01       # streamwise rms
    assert abs(p["v'+"].mean() * uw - 0.02) < 0.005
    # save/load round trip
    vs.save(tmp_path / "vs.npz")
    vs2 = VelocityStats.load(tmp_path / "vs.npz")
    np.testing.assert_allclose(vs2.profiles()["U+"], p["U+"])


def test_budgets_laminar_vanish():
    ny, nz, nx = 24, 6, 12
    y = np.linspace(-1, 1, ny)
    st = budget_init(ny)
    u = np.zeros((3, nz, ny, nx), np.float32)
    u[0] = y[None, :, None]
    g = np.zeros((3, 3, nz, ny, nx), np.float32)
    g[0, 1] = 1.0
    p = np.zeros((nz, ny, nx), np.float32)
    for _ in range(4):
        st = budget_update(st, jnp.asarray(u), jnp.asarray(p), jnp.asarray(g))
    out = budget_finalize(st, y, viscosity=1e-2, u_wall=0.1)
    for k in ("production", "turbulent_transport", "pressure_strain",
              "dissipation"):
        assert float(jnp.abs(out[k]).max()) < 1e-5, k


def test_budgets_dissipation_negative():
    ny, nz, nx = 24, 6, 12
    y = np.linspace(-1, 1, ny)
    st = budget_init(ny)
    rng = np.random.default_rng(1)
    p = np.zeros((nz, ny, nx), np.float32)
    for _ in range(8):
        u = rng.normal(0, 0.1, (3, nz, ny, nx)).astype(np.float32)
        g = rng.normal(0, 0.3, (3, 3, nz, ny, nx)).astype(np.float32)
        st = budget_update(st, jnp.asarray(u), jnp.asarray(p), jnp.asarray(g))
    out = budget_finalize(st, y, viscosity=1e-2, u_wall=0.1)
    assert float(out["dissipation"].max()) < 0.0


def test_two_point_correlation_bounds():
    rng = np.random.default_rng(2)
    base = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    state, c = two_point_corr_from_data(None, base, dims=(0, 1))
    assert c is None
    _, c_self = two_point_corr_from_data(state, base, dims=(0, 1))
    assert abs(float(c_self) - 1.0) < 1e-5
    other = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    _, c_other = two_point_corr_from_data(state, other, dims=(0, 1))
    assert abs(float(c_other)) < 0.5
