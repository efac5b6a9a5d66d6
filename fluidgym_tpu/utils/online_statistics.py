"""Online (streaming) turbulence statistics.

Functional JAX re-expression of the reference's torch-based online statistics
(``/root/reference/src/fluidgym/simulation/pict/data/online_statistics.py``):
parallel Welford mean/variance (:31), online covariance (:145), Welford-based
multivariate moments up to 4th order (:419), and streaming power spectral
density accumulation (:269).  Each statistic is a (init, update, finalize)
triple over an immutable state pytree, so accumulation runs inside jit/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "WelfordState", "welford_init", "welford_update", "welford_finalize",
    "CovarianceState", "covariance_init", "covariance_update",
    "covariance_finalize",
    "MomentsState", "moments_init", "moments_update", "moments_finalize",
    "PSDState", "psd_init", "psd_update", "psd_finalize",
    "TwoPointCorrState", "two_point_corr_init", "two_point_corr",
    "two_point_corr_from_data",
    "BudgetState", "budget_init", "budget_update", "budget_finalize",
    "SpatialSpectraState", "spatial_spectra_init", "spatial_spectra_update",
    "spatial_spectra_phi",
]


# -- Welford mean/variance (reference WelfordOnlineParallel_Torch:31) --------

class WelfordState(NamedTuple):
    count: Array
    mean: Array
    m2: Array


def welford_init(shape, dtype=jnp.float32) -> WelfordState:
    # count stays float32 regardless of the data dtype: in bfloat16 it
    # saturates at 256 (fp16: 2048) and the statistics silently freeze
    return WelfordState(jnp.zeros((), jnp.float32), jnp.zeros(shape, dtype),
                        jnp.zeros(shape, dtype))


def welford_update(state: WelfordState, x: Array) -> WelfordState:
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_finalize(state: WelfordState):
    var = state.m2 / jnp.maximum(state.count - 1, 1)
    return state.mean, var


# -- online covariance (reference CovarianceOnlineParallel_Torch:145) --------

class CovarianceState(NamedTuple):
    count: Array
    mean_a: Array
    mean_b: Array
    c2: Array


def covariance_init(shape, dtype=jnp.float32) -> CovarianceState:
    z = jnp.zeros(shape, dtype)
    return CovarianceState(jnp.zeros((), jnp.float32), z, z, z)


def covariance_update(state: CovarianceState, a: Array, b: Array) -> CovarianceState:
    count = state.count + 1
    da = a - state.mean_a
    mean_a = state.mean_a + da / count
    mean_b = state.mean_b + (b - state.mean_b) / count
    c2 = state.c2 + da * (b - mean_b)
    return CovarianceState(count, mean_a, mean_b, c2)


def covariance_finalize(state: CovarianceState) -> Array:
    return state.c2 / jnp.maximum(state.count - 1, 1)


# -- multivariate central moments up to order 4 (reference :419) -------------

class MomentsState(NamedTuple):
    count: Array
    mean: Array
    m2: Array
    m3: Array
    m4: Array


def moments_init(shape, dtype=jnp.float32) -> MomentsState:
    z = jnp.zeros(shape, dtype)
    return MomentsState(jnp.zeros((), jnp.float32), z, z, z, z)


def moments_update(state: MomentsState, x: Array) -> MomentsState:
    """One-pass update of central moments (Pebay 2008)."""
    n1 = state.count
    n = n1 + 1
    delta = x - state.mean
    delta_n = delta / n
    delta_n2 = delta_n * delta_n
    term1 = delta * delta_n * n1
    mean = state.mean + delta_n
    m4 = (state.m4 + term1 * delta_n2 * (n * n - 3 * n + 3)
          + 6 * delta_n2 * state.m2 - 4 * delta_n * state.m3)
    m3 = state.m3 + term1 * delta_n * (n - 2) - 3 * delta_n * state.m2
    m2 = state.m2 + term1
    return MomentsState(n, mean, m2, m3, m4)


def moments_finalize(state: MomentsState):
    """Returns (mean, variance, skewness, flatness); zero-variance input
    yields skew=flat=0 rather than NaN (1e-30 guards underflow in fp32:
    sd**3 = 1e-45 -> 0)."""
    n = jnp.maximum(state.count, 1)
    var = state.m2 / n
    ok = var > 0
    safe_var = jnp.where(ok, var, 1.0)
    sd3 = safe_var * jnp.sqrt(safe_var)
    skew = jnp.where(ok, (state.m3 / n) / sd3, 0.0)
    flat = jnp.where(ok, (state.m4 / n) / safe_var**2, 0.0)
    return state.mean, var, skew, flat


# -- streaming power spectral density (reference PSDOnline_Torch:269) --------

class PSDState(NamedTuple):
    count: Array
    psd_sum: Array


def psd_init(n_freq: int, shape_rest=(), dtype=jnp.float32) -> PSDState:
    return PSDState(jnp.zeros((), jnp.float32),
                    jnp.zeros((n_freq, *shape_rest), dtype))


def psd_update(state: PSDState, signal: Array, axis: int = 0) -> PSDState:
    """Accumulate |rfft|^2 of a windowed signal along ``axis``."""
    x = jnp.moveaxis(signal, axis, 0)
    window = jnp.hanning(x.shape[0]).reshape((-1,) + (1,) * (x.ndim - 1))
    spec = jnp.abs(jnp.fft.rfft(x * window, axis=0)) ** 2
    return PSDState(state.count + 1, state.psd_sum + spec)


def psd_finalize(state: PSDState) -> Array:
    return state.psd_sum / jnp.maximum(state.count, 1)


# -- temporal two-point correlation -------------------------------------------
# (reference TemporalTwoPointCorrelation_Online_torch, online_statistics.py:1272)

class TwoPointCorrState(NamedTuple):
    """Correlation of current fluctuations against a base snapshot."""

    base: Array      # base fluctuation field
    base_rms: Array  # rms of the base over the reduction dims


def two_point_corr_init(fluctuations: Array, dims) -> TwoPointCorrState:
    rms = jnp.sqrt(jnp.mean(jnp.square(fluctuations), axis=dims))
    return TwoPointCorrState(base=fluctuations, base_rms=rms)


def two_point_corr(state: TwoPointCorrState, fluctuations: Array, dims) -> Array:
    """Correlation coefficient of ``fluctuations`` with the base snapshot."""
    ms = jnp.mean(state.base * fluctuations, axis=dims)
    rms = jnp.sqrt(jnp.mean(jnp.square(fluctuations), axis=dims))
    return ms / (state.base_rms * rms + 1e-30)


def two_point_corr_from_data(state: TwoPointCorrState | None, data: Array,
                             dims):
    """Convenience: subtract the mean over ``dims`` first; returns
    ``(state, coefficient | None)`` -- first call initializes the base."""
    fluct = data - jnp.mean(data, axis=dims, keepdims=True)
    if state is None:
        return two_point_corr_init(fluct, dims), None
    return state, two_point_corr(state, fluct, dims)


# -- turbulent kinetic energy budgets -----------------------------------------
# Compact functional re-expression of the reference
# TurbulentEnergyBudgetsOnlineParallel_Torch (online_statistics.py:790-1271):
# accumulates the plane-averaged raw moments required for the per-component
# TKE budget of a channel flow (averaging over the homogeneous x/z planes)
# and derives production / turbulent transport / viscous diffusion /
# pressure transport / pressure strain / dissipation profiles.

class BudgetState(NamedTuple):
    count: Array
    u: Array        # (3, ny) mean velocity
    uu: Array       # (4, ny) <u^2>, <v^2>, <w^2>, <u v>
    uuv: Array      # (3, ny) <u_i^2 v>
    uiv: Array      # (3, ny) <u_i v>
    p: Array        # (ny,)  mean pressure
    pv: Array       # (ny,)  <p v>
    pdu: Array      # (3, ny) <p du_i/dx_i>
    du: Array       # (3, ny) mean du_i/dx_i
    gg: Array       # (3, ny) <|grad u_i|^2>
    g: Array        # (3, 3, ny) mean du_i/dx_k


def budget_init(ny: int, dtype=jnp.float32) -> BudgetState:
    z = lambda *s: jnp.zeros(s, dtype)
    return BudgetState(z(), z(3, ny), z(4, ny), z(3, ny), z(3, ny), z(ny),
                       z(ny), z(3, ny), z(3, ny), z(3, ny), z(3, 3, ny))


def budget_update(state: BudgetState, velocity: Array, pressure: Array,
                  gradients: Array) -> BudgetState:
    """One snapshot.  ``velocity`` (3, nz, ny, nx); ``pressure`` (nz, ny, nx);
    ``gradients`` (3, 3, nz, ny, nx) = du_i/dx_j (e.g. from
    ``fluidgym_tpu.solver.sgs.velocity_gradients``)."""
    pm = lambda x: x.mean(axis=(-3, -1))  # plane average over z, x
    n = state.count + 1.0
    upd = lambda old, new: old + (new - old) / n

    u, v = velocity[0], velocity[1]
    uu = jnp.stack([pm(velocity[0] ** 2), pm(velocity[1] ** 2),
                    pm(velocity[2] ** 2), pm(u * v)])
    uuv = jnp.stack([pm(velocity[i] ** 2 * v) for i in range(3)])
    uiv = jnp.stack([pm(velocity[i] * v) for i in range(3)])
    pdu = jnp.stack([pm(pressure * gradients[i, i]) for i in range(3)])
    gg = jnp.stack([pm(jnp.sum(gradients[i] ** 2, axis=0)) for i in range(3)])
    g = gradients.mean(axis=(-3, -1))

    return BudgetState(
        count=n,
        u=upd(state.u, pm(velocity)),
        uu=upd(state.uu, uu),
        uuv=upd(state.uuv, uuv),
        uiv=upd(state.uiv, uiv),
        p=upd(state.p, pm(pressure)),
        pv=upd(state.pv, pm(pressure * v)),
        pdu=upd(state.pdu, pdu),
        du=upd(state.du, jnp.stack([g[i, i] for i in range(3)])),
        gg=upd(state.gg, gg),
        g=upd(state.g, g),
    )


def budget_finalize(state: BudgetState, pos_y, viscosity: float,
                    u_wall: float = 1.0):
    """Per-component TKE budget profiles (in wall units when ``u_wall`` is
    supplied): production, turbulent transport, viscous diffusion, pressure
    transport (v-component), pressure strain, dissipation.  All terms are for
    the half-budget of <u_i'^2>/2."""
    import numpy as np

    y = np.asarray(pos_y)
    d_dy = lambda f: jnp.asarray(np.gradient(np.asarray(f), y, axis=-1))

    mean_u, v_idx = state.u, 1
    var = jnp.stack([state.uu[i] - mean_u[i] ** 2 for i in range(3)])
    uv = state.uu[3] - mean_u[0] * mean_u[1]
    # <u_i'^2 v'> from raw moments
    tflux = jnp.stack([
        state.uuv[i] - 2 * mean_u[i] * state.uiv[i]
        - mean_u[v_idx] * state.uu[i]
        + 2 * mean_u[i] ** 2 * mean_u[v_idx]
        for i in range(3)
    ])
    pv_f = state.pv - state.p * mean_u[v_idx]
    pstrain = jnp.stack([state.pdu[i] - state.p * state.du[i]
                         for i in range(3)])
    # dissipation of each component: nu <|grad u_i'|^2>
    eps = jnp.stack([
        viscosity * (state.gg[i] - jnp.sum(state.g[i] ** 2, axis=0))
        for i in range(3)
    ])
    dUdy = d_dy(mean_u[0])
    production = jnp.stack([
        -uv * dUdy,                      # u'u' budget
        jnp.zeros_like(dUdy),            # v'v'
        jnp.zeros_like(dUdy),            # w'w'
    ])
    scale = u_wall**4 / max(viscosity, 1e-30)  # wall-unit budget scaling
    out = {
        "production": production / scale,
        "turbulent_transport": -0.5 * d_dy(tflux) / scale,
        "viscous_diffusion": 0.5 * viscosity * d_dy(d_dy(var)) / scale,
        "pressure_transport": jnp.stack([
            jnp.zeros_like(dUdy), -d_dy(pv_f), jnp.zeros_like(dUdy)]) / scale,
        "pressure_strain": pstrain / scale,
        "dissipation": -eps / scale,
    }
    return out


# -- streaming 2D spatial (x-z) velocity spectra at selected y planes ---------
# Re-expression of the reference PSDOnline_Torch as used by the TCF tooling
# (online_statistics.py:269-420 with total_dims=5, fft_dims=(z, x),
# planes_dim=y, planes_symmetric=True; TCF_tools.py:445-456, 1375-1456):
# running mean of |fft2| of the instantaneous fields over the two homogeneous
# directions, restricted to the positive-frequency quadrant, accumulated at a
# small set of wall-normal planes (and, channel symmetry, their mirrors).

class SpatialSpectraState(NamedTuple):
    count: Array
    amp: Array   # (C, n_planes, nkz, nkx) running mean |fft2(field)|


def spatial_spectra_init(n_channels: int, n_planes: int, nz: int, nx: int,
                         dtype=jnp.float32) -> SpatialSpectraState:
    return SpatialSpectraState(
        jnp.zeros((), jnp.float32),
        jnp.zeros((n_channels, n_planes, nz // 2, nx // 2), dtype))


def spatial_spectra_update(state: SpatialSpectraState, fields: Array,
                           planes, symmetric: bool = True
                           ) -> SpatialSpectraState:
    """Accumulate one snapshot.  ``fields``: (C, nz, ny, nx); ``planes``: int
    sequence/array of y indices.  With ``symmetric`` the mirrored planes
    (ny-1-p) are folded in too (reference planes_symmetric)."""
    planes = jnp.asarray(planes, jnp.int32)
    nz, ny, nx = fields.shape[1:]

    def one_side(idx):
        sl = jnp.take(fields, idx, axis=2)              # (C, nz, n_planes, nx)
        spec = jnp.abs(jnp.fft.fftn(sl, axes=(1, 3)))
        # positive-frequency modes k = 1..N//2 (the k=0 mean mode is dropped
        # rather than mislabeled k=1 as in the reference slice, :319-321)
        spec = spec[:, 1 : nz // 2 + 1, :, 1 : nx // 2 + 1]
        return jnp.moveaxis(spec, 2, 1)                 # (C, n_planes, kz, kx)

    amp_b = one_side(planes)
    n_b = 1.0
    if symmetric:
        amp_b = amp_b + one_side(ny - 1 - planes)
        amp_b, n_b = amp_b / 2.0, 1.0  # mirrored pair averaged into one sample
    n = state.count + n_b
    return SpatialSpectraState(n, state.amp + (amp_b - state.amp) * (n_b / n))


def spatial_spectra_phi(state: SpatialSpectraState, lengths, viscosity: float,
                        u_wall: float):
    """(lambdas, phi): premultiplied spectra vs wall-unit wavelengths.

    ``lengths`` = physical (Lz, Lx) of the homogeneous directions.  Mode k of
    a periodic direction of length L has wavelength L/k; lambdas are returned
    in wall units (/(nu/u_tau)), phi is k_z k_x * |fft| (premultiplied, as the
    reference's get_phi grid product, online_statistics.py:393-419).
    """
    import numpy as np

    lstar = viscosity / max(u_wall, 1e-30)
    nkz, nkx = state.amp.shape[-2:]
    ks = [np.arange(1, nk + 1, dtype=np.float64) for nk in (nkz, nkx)]
    lambdas = [L / k / lstar for L, k in zip(lengths, ks)]
    grid = ks[0][:, None] * ks[1][None, :]
    phi = np.asarray(state.amp) * grid
    return lambdas, phi
