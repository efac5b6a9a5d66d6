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


def test_vmapped_cg_matches_single_solves():
    """Per-lane freeze masking: a vmapped batch of solves returns, for every
    lane, the iterate a standalone solve of that lane would return -- even
    when the lanes need very different iteration counts (the batched
    while_loop runs until the slowest lane converges)."""
    n = 64
    rng = np.random.default_rng(3)
    mats, rhss = [], []
    for cond_boost in (1.0, 50.0, 2000.0):  # very different conditioning
        A = _random_spd(n, seed=int(cond_boost))
        A[0, 0] *= cond_boost
        mats.append(A)
        rhss.append(rng.normal(size=(n,)))
    Ab = jnp.asarray(np.stack(mats), jnp.float32)
    bb = jnp.asarray(np.stack(rhss), jnp.float32)

    def solve(A, b):
        return linsolve.cg(lambda v: A @ v, b, tol=1e-6, maxiter=400)

    xs_b, info_b = jax.vmap(solve)(Ab, bb)
    for i in range(3):
        x_s, info_s = solve(Ab[i], bb[i])
        assert bool(info_b.converged[i]) == bool(info_s.converged)
        np.testing.assert_allclose(np.asarray(xs_b[i]), np.asarray(x_s),
                                   rtol=0, atol=1e-6)


def test_vmapped_bicgstab_matches_single_solves():
    n = 48
    rng = np.random.default_rng(4)
    mats = [np.eye(n) * s + rng.normal(size=(n, n)) for s in (n, 4 * n)]
    rhss = [rng.normal(size=(n,)) for _ in mats]
    Ab = jnp.asarray(np.stack(mats), jnp.float32)
    bb = jnp.asarray(np.stack(rhss), jnp.float32)

    def solve(A, b):
        return linsolve.bicgstab(lambda v: A @ v, b, tol=1e-6, maxiter=400)

    xs_b, info_b = jax.vmap(solve)(Ab, bb)
    for i in range(len(mats)):
        x_s, info_s = solve(Ab[i], bb[i])
        assert bool(info_b.converged[i]) == bool(info_s.converged)
        np.testing.assert_allclose(np.asarray(xs_b[i]), np.asarray(x_s),
                                   rtol=0, atol=1e-6)
