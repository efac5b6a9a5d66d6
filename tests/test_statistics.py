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


def test_velocity_stats_higher_moments_and_pressure(tmp_path):
    """Skewness/flatness of known distributions and p' recovery
    (PISOTCFProfile parity: Su'+/Fu'+/Sp'+/Fp'+/p' keys)."""
    ny = 16
    y = _channel_y(ny)
    vs = VelocityStats(y, viscosity=1e-3)
    rng = np.random.default_rng(1)
    for _ in range(200):
        u = np.zeros((3, 8, ny, 16), np.float32)
        u[0] = 1.0 + rng.normal(0, 0.1, (8, ny, 16))     # gaussian: S=0, F=3
        u[1] = rng.normal(0, 0.05, (8, ny, 16))
        u[2] = rng.exponential(0.05, (8, ny, 16))        # exp: S=2, F=9
        pfield = rng.normal(0, 0.03, (8, ny, 16)).astype(np.float32)
        vs.record(jnp.asarray(u), jnp.asarray(pfield))
    prof = vs.profiles()
    assert np.all(np.abs(prof["Su'+"]) < 0.3)
    assert np.allclose(prof["Fu'+"], 3.0, atol=0.5)
    assert np.allclose(prof["Sw'+"], 2.0, atol=0.5)
    assert np.allclose(prof["Fw'+"], 9.0, atol=2.5)
    assert abs(prof["p'"].mean() * vs.u_wall**2 - 0.03) < 0.01
    # half-channel accessor + save/load keep the higher moments
    vs.save(tmp_path / "vs.npz")
    from fluidgym_tpu.envs.tcf.statistics import SavedRunProfile

    run = SavedRunProfile.load(tmp_path / "vs.npz")
    half = run.profiles["Fu'+"]
    assert len(half) == (ny + 1) // 2
    assert np.allclose(half, prof["Fu'+"][: (ny + 1) // 2])
    assert len(run.profiles["y+"]) == (ny + 1) // 2


def test_velocity_stats_loads_pre_pressure_format(tmp_path):
    """Old three-channel save files still load (zero-padded channels)."""
    ny = 8
    y = _channel_y(ny)
    vs = VelocityStats(y, viscosity=1e-3)
    st = vs.state
    np.savez(tmp_path / "old.npz", pos_y=y, viscosity=1e-3,
             count=np.asarray(2.0), mean=np.ones((3, ny), np.float32),
             msq=np.ones((3, ny), np.float32) * 2.0,
             uv=np.zeros((ny,), np.float32),
             dudy_wall=np.ones((2,), np.float32))
    vs2 = VelocityStats.load(tmp_path / "old.npz")
    prof = vs2.profiles()
    assert np.allclose(prof["U+"] * vs2.u_wall, 1.0)
    assert np.all(np.isfinite(prof["Fu'+"]))


# -- spatial spectra + composed TCFAnalysis -----------------------------------

def test_spatial_spectra_locates_known_mode():
    from fluidgym_tpu.utils.online_statistics import (
        spatial_spectra_init, spatial_spectra_phi, spatial_spectra_update)

    nz, ny, nx = 16, 8, 32
    Lz, Lx = 2.0, 4.0
    kz, kx = 3, 5
    z = np.arange(nz) / nz
    x = np.arange(nx) / nx
    field = np.zeros((3, nz, ny, nx), np.float32)
    field[0] = (np.sin(2 * np.pi * kz * z)[:, None, None]
                * np.sin(2 * np.pi * kx * x)[None, None, :])
    st = spatial_spectra_init(3, 1, nz, nx)
    st = spatial_spectra_update(st, jnp.asarray(field), [2], symmetric=False)
    amp = np.asarray(st.amp)          # (3, 1, nz//2, nx//2)
    peak = np.unravel_index(np.argmax(amp[0, 0]), amp[0, 0].shape)
    assert peak == (kz - 1, kx - 1)   # k=1 is index 0 (mean mode dropped)
    assert amp[1].max() < 1e-5 and amp[2].max() < 1e-5
    lambdas, phi = spatial_spectra_phi(st, (Lz, Lx), viscosity=1.0, u_wall=1.0)
    # wavelength of mode k over length L is L/k (wall units with lstar=1)
    np.testing.assert_allclose(lambdas[0][kz - 1], Lz / kz)
    np.testing.assert_allclose(lambdas[1][kx - 1], Lx / kx)
    assert np.unravel_index(np.argmax(phi[0, 0]), phi[0, 0].shape) == peak


def test_spatial_spectra_symmetric_folds_mirror_plane():
    from fluidgym_tpu.utils.online_statistics import (
        spatial_spectra_init, spatial_spectra_update)

    nz, ny, nx = 8, 6, 8
    rng = np.random.default_rng(1)
    field = rng.normal(0, 1, (3, nz, ny, nx)).astype(np.float32)
    st0 = spatial_spectra_init(3, 1, nz, nx)
    sym = spatial_spectra_update(st0, jnp.asarray(field), [1], symmetric=True)
    lo = spatial_spectra_update(st0, jnp.asarray(field), [1], symmetric=False)
    hi = spatial_spectra_update(st0, jnp.asarray(field), [ny - 2],
                                symmetric=False)
    np.testing.assert_allclose(np.asarray(sym.amp),
                               (np.asarray(lo.amp) + np.asarray(hi.amp)) / 2,
                               rtol=1e-5)


def _tcf_analysis_fields(rng, nz=8, ny=16, nx=8):
    y = _channel_y(ny)
    u = np.zeros((3, nz, ny, nx), np.float32)
    u[0] = (1 - y**2)[None, :, None] + rng.normal(0, 0.05, (nz, ny, nx))
    u[1] = rng.normal(0, 0.02, (nz, ny, nx))
    u[2] = rng.normal(0, 0.02, (nz, ny, nx))
    p = rng.normal(0, 0.01, (nz, ny, nx)).astype(np.float32)
    g = rng.normal(0, 0.1, (3, 3, nz, ny, nx)).astype(np.float32)
    return y, u, p, g


def test_tcf_analysis_records_and_roundtrips(tmp_path):
    from fluidgym_tpu.envs.tcf.statistics import TCFAnalysis

    rng = np.random.default_rng(2)
    y, u, p, g = _tcf_analysis_fields(rng)
    ana = TCFAnalysis(y, viscosity=1e-3, lengths=(2.0, 4.0),
                      psd_planes=(1, 3), budgets=True, temporal_corr=True)
    for i in range(4):
        _, u, p, g = _tcf_analysis_fields(rng)
        ana.record(jnp.asarray(u), jnp.asarray(p), jnp.asarray(g),
                   time=0.1 * i)

    lambdas, phi = ana.spectra()
    assert phi.shape == (3, 2, u.shape[1] // 2, u.shape[3] // 2)
    assert np.isfinite(phi).all()
    budgets = ana.budgets()
    assert set(budgets) == {"production", "turbulent_transport",
                            "viscous_diffusion", "pressure_transport",
                            "pressure_strain", "dissipation"}
    assert all(np.isfinite(v).all() for v in budgets.values())
    ett, coeffs = ana.temporal_correlation()
    assert coeffs.shape == (4, 3, len(y))
    np.testing.assert_allclose(coeffs[0], 1.0, atol=1e-5)  # base vs itself
    assert np.abs(coeffs[1:]).max() <= 1.0 + 1e-5

    ana.save(tmp_path / "run")
    ana2 = TCFAnalysis.load(tmp_path / "run")
    _, phi2 = ana2.spectra()
    np.testing.assert_allclose(phi2, phi, rtol=1e-6)
    for k, v in ana2.budgets().items():
        np.testing.assert_allclose(v, budgets[k], rtol=1e-5, atol=1e-8)
    ett2, coeffs2 = ana2.temporal_correlation()
    np.testing.assert_allclose(coeffs2, coeffs, rtol=1e-6)


def test_tcf_analysis_decorrelated_snapshots():
    from fluidgym_tpu.envs.tcf.statistics import TCFAnalysis

    rng = np.random.default_rng(3)
    ny = 16
    y = _channel_y(ny)
    ana = TCFAnalysis(y, viscosity=1e-3, temporal_corr=True)
    big = np.float32(rng.normal(0, 1, (3, 32, ny, 32)))
    ana.record(jnp.asarray(big))
    ana.record(jnp.asarray(np.float32(rng.normal(0, 1, big.shape))))
    _, coeffs = ana.temporal_correlation()
    assert np.abs(coeffs[1]).mean() < 0.2   # independent fields decorrelate


def test_tcf_analysis_plots(tmp_path):
    from fluidgym_tpu.envs.tcf.statistics import TCFAnalysis

    rng = np.random.default_rng(4)
    y, u, p, g = _tcf_analysis_fields(rng)
    ana = TCFAnalysis(y, viscosity=1e-3, lengths=(2.0, 4.0),
                      psd_planes=(1,), budgets=True, temporal_corr=True)
    for i in range(3):
        _, u, p, g = _tcf_analysis_fields(rng)
        ana.record(jnp.asarray(u), jnp.asarray(p), jnp.asarray(g), time=i * 1.0)
    ana.plot_spectra(tmp_path / "spec")
    ana.plot_budgets(tmp_path / "budg")
    ana.plot_temporal_correlation(tmp_path / "tcorr")
    assert (tmp_path / "spec.svg").exists()
    assert (tmp_path / "budg.svg").exists()
    assert (tmp_path / "tcorr.pdf").exists()
