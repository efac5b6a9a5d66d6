"""Krylov solver unit tests against dense numpy solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.solver import linsolve


def _random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_cg_matches_dense():
    n = 64
    A = _random_spd(n)
    b = np.random.default_rng(1).normal(size=(n,))
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A, jnp.float32)
    x, info = linsolve.cg(lambda v: Aj @ v, jnp.asarray(b, jnp.float32), tol=1e-7,
                          maxiter=500)
    assert bool(info.converged)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-3)


def test_cg_zero_rhs():
    x, info = linsolve.cg(lambda v: 2 * v, jnp.zeros((16,)), tol=1e-6)
    assert np.allclose(np.asarray(x), 0)
    assert bool(info.converged)
    assert int(info.iterations) == 0


def test_bicgstab_nonsymmetric():
    n = 48
    rng = np.random.default_rng(2)
    A = np.eye(n) * n + rng.normal(size=(n, n))
    b = rng.normal(size=(n,))
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A, jnp.float32)
    x, info = linsolve.bicgstab(lambda v: Aj @ v, jnp.asarray(b, jnp.float32),
                                tol=1e-7, maxiter=500)
    assert bool(info.converged)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-3)


def test_cg_rmse_criterion():
    """Convergence uses RMSE(r) <= tol (NORM2_NORMALIZED), not ||r||."""
    n = 1024
    A = jnp.eye(n) * 2.0
    b = jnp.ones((n,))
    x, info = linsolve.cg(lambda v: A @ v, b, tol=1e-5, maxiter=100)
    r = b - A @ x
    assert float(jnp.sqrt(jnp.mean(r * r))) <= 1e-5


def test_cg_jit_and_grad():
    """CG result is differentiable through custom_linear_solve at call sites;
    here just check it jits."""
    n = 32
    A = _random_spd(n, 3)
    Aj = jnp.asarray(A, jnp.float32)

    @jax.jit
    def solve(b):
        return linsolve.cg(lambda v: Aj @ v, b, tol=1e-6, maxiter=200)[0]

    b = jnp.ones((n,), jnp.float32)
    x = solve(b)
    assert np.allclose(np.asarray(Aj @ x), np.asarray(b), atol=1e-3)
