"""Geometric multigrid preconditioner tests (solver/multigrid.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.solver import linsolve, multigrid as mg
from fluidgym_tpu.solver import stencil as st


def _poisson_op(shape, ndims, fixed_axes=(), seed=0, dtype=jnp.float32):
    """Variable-coefficient Poisson-like SPD stencil; axes in ``fixed_axes``
    (physical numbering) get zeroed boundary couplings (FIXED faces),
    everything else wraps (PERIODIC)."""
    rng = np.random.default_rng(seed)
    rank = len(shape)
    offs = []
    for d in range(ndims):
        ax = rank - 1 - d
        c = rng.uniform(0.5, 1.5, size=shape)
        lo = -c
        hi = -np.roll(c, -1, axis=ax)
        if d in fixed_axes:
            sl_lo = [slice(None)] * rank
            sl_lo[ax] = slice(0, 1)
            lo[tuple(sl_lo)] = 0.0
            sl_hi = [slice(None)] * rank
            sl_hi[ax] = slice(-1, None)
            hi[tuple(sl_hi)] = 0.0
        offs.extend([lo, hi])
    off = np.stack(offs, axis=0)
    diag = -off.sum(axis=0) + 0.05
    return st.StencilOp(diag=jnp.asarray(diag, dtype),
                        off=jnp.asarray(off, dtype))


def _dense(apply_fn, shape):
    n = int(np.prod(shape))
    cols = []
    for i in range(n):
        e = np.zeros(n, np.float64)
        e[i] = 1.0
        cols.append(np.asarray(
            apply_fn(jnp.asarray(e.reshape(shape), jnp.float32))).ravel())
    return np.stack(cols, axis=1)


def test_kernel_apply_matches_stencil_apply():
    shape, ndims = (8, 12), 2
    op = _poisson_op(shape, ndims, fixed_axes=(1,), seed=1)
    k = mg.stencil_to_kernel(op, ndims)
    x = jnp.asarray(np.random.default_rng(2).normal(size=shape), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mg.kernel_apply(k, x, ndims)),
        np.asarray(st.stencil_apply(op, x, ndims)), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape,ndims,fixed", [
    ((8, 12), 2, ()), ((8, 12), 2, (1,)), ((4, 6, 8), 3, (1,)),
])
def test_galerkin_coarsen_equals_dense_rap(shape, ndims, fixed):
    """Closed-form coarse kernel == dense R @ A @ P."""
    op = _poisson_op(shape, ndims, fixed_axes=fixed, seed=3)
    k = mg.stencil_to_kernel(op, ndims)
    factors = mg._coarsen_factors(shape)
    kc = mg.galerkin_coarsen(k, ndims, factors)

    A = _dense(lambda x: mg.kernel_apply(k, x, ndims), shape)
    cshape = tuple(s // f for s, f in
                   zip(shape, [factors[ndims - 1 - i] for i in range(len(shape))]))
    P = _dense(lambda xc: mg._prolong(xc, ndims, factors), cshape)
    # R = mean over children = (1/prod f) P^T
    R = P.T / float(np.prod(factors))
    Ac_dense = R @ A @ P
    Ac_kernel = _dense(lambda x: mg.kernel_apply(kc, x, ndims), cshape)
    np.testing.assert_allclose(Ac_kernel, Ac_dense, rtol=1e-5, atol=1e-6)


def test_vcycle_is_symmetric():
    """<u, M^-1 v> == <M^-1 u, v>: required for PCG correctness."""
    shape, ndims = (16, 16), 2
    op = _poisson_op(shape, ndims, fixed_axes=(0, 1), seed=4)
    pre = mg.build_mg_preconditioner((op,), ndims)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    Mu = pre((u,))[0]
    Mv = pre((v,))[0]
    a = float(jnp.vdot(u, Mv))
    b = float(jnp.vdot(Mu, v))
    assert abs(a - b) <= 1e-4 * max(abs(a), abs(b))


@pytest.mark.parametrize("shape,ndims,fixed", [
    ((64, 64), 2, (0, 1)), ((16, 32, 32), 3, (1,)),
])
def test_mg_pcg_beats_jacobi_pcg(shape, ndims, fixed):
    """The V-cycle cuts PCG iterations by >=3x on a stiff Poisson problem."""
    op = _poisson_op(shape, ndims, fixed_axes=fixed, seed=6)
    b = jnp.asarray(np.random.default_rng(7).normal(size=shape), jnp.float32)
    mv = lambda x: st.stencil_apply(op, x, ndims)
    inv_d = 1.0 / op.diag

    x_j, info_j = linsolve.cg(mv, b, tol=1e-6, maxiter=4000,
                              precond=lambda r: inv_d * r)
    pre = mg.build_mg_preconditioner((op,), ndims)
    x_m, info_m = linsolve.cg(mv, b, tol=1e-6, maxiter=4000,
                              precond=lambda r: pre((r,))[0])
    assert bool(info_m.converged)
    assert int(info_m.iterations) * 3 <= int(info_j.iterations), (
        int(info_m.iterations), int(info_j.iterations))
    # same solution
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # ~2.5 min: full PISO substep A/B at physics tolerance
def test_piso_substep_with_multigrid_matches_default():
    """A cylinder-style multi-block env step with pressure_multigrid=True
    produces the same physics as the Jacobi default."""
    import dataclasses

    import fluidgym_tpu

    kw = dict(resolution=8, load_initial_domain=False,
              load_domain_statistics=False, randomize_initial_state=False,
              episode_length=3, step_length=0.02, dt=0.01)

    def run(use_mg):
        env = fluidgym_tpu.make("CylinderJet2D-easy-v0", **kw)
        if use_mg:
            orig = env._get_simulation
            env._get_simulation = lambda: dataclasses.replace(
                orig(), pressure_multigrid=True)
        env.reset(seed=0)
        obs, r, te, tr, info = env.step(jnp.asarray([0.5], jnp.float32))
        return float(np.asarray(r).reshape(())), info

    r_def, info_def = run(False)
    r_mg, info_mg = run(True)
    assert np.isfinite(r_mg)
    assert abs(r_mg - r_def) <= 5e-3 * max(1.0, abs(r_def)), (r_mg, r_def)
    assert int(np.asarray(info_mg["pressure_iterations"])) <= int(
        np.asarray(info_def["pressure_iterations"]))
