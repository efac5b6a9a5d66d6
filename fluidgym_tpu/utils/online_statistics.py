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
]


# -- Welford mean/variance (reference WelfordOnlineParallel_Torch:31) --------

class WelfordState(NamedTuple):
    count: Array
    mean: Array
    m2: Array


def welford_init(shape, dtype=jnp.float32) -> WelfordState:
    return WelfordState(jnp.zeros((), dtype), jnp.zeros(shape, dtype),
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
    return CovarianceState(jnp.zeros((), dtype), z, z, z)


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
    return MomentsState(jnp.zeros((), dtype), z, z, z, z)


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
    """Returns (mean, variance, skewness, flatness)."""
    n = jnp.maximum(state.count, 1)
    var = state.m2 / n
    sd = jnp.sqrt(jnp.maximum(var, 1e-30))
    skew = (state.m3 / n) / sd**3
    flat = (state.m4 / n) / var**2
    return state.mean, var, skew, flat


# -- streaming power spectral density (reference PSDOnline_Torch:269) --------

class PSDState(NamedTuple):
    count: Array
    psd_sum: Array


def psd_init(n_freq: int, shape_rest=(), dtype=jnp.float32) -> PSDState:
    return PSDState(jnp.zeros((), dtype),
                    jnp.zeros((n_freq, *shape_rest), dtype))


def psd_update(state: PSDState, signal: Array, axis: int = 0) -> PSDState:
    """Accumulate |rfft|^2 of a windowed signal along ``axis``."""
    x = jnp.moveaxis(signal, axis, 0)
    window = jnp.hanning(x.shape[0]).reshape((-1,) + (1,) * (x.ndim - 1))
    spec = jnp.abs(jnp.fft.rfft(x * window, axis=0)) ** 2
    return PSDState(state.count + 1, state.psd_sum + spec)


def psd_finalize(state: PSDState) -> Array:
    return state.psd_sum / jnp.maximum(state.count, 1)
