"""Fused whole-solve Pallas CG (ops/cg_pallas.py) vs the XLA reference loop.

Runs the kernel in interpret mode on CPU; the TPU dispatch path is gated by
``fused_cg_enabled`` and exercised on hardware by bench/validation runs.
Semantics target: exact parity with ``linsolve.cg`` (NORM2_NORMALIZED,
warm start, Jacobi preconditioning, return-best, stall patience).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.ops import cg_pallas
from fluidgym_tpu.solver import linsolve
from fluidgym_tpu.solver import stencil as st


def _poisson_like_op(shape, ndims, seed=0, dtype=jnp.float32):
    """Random diagonally-dominant SPD stencil in StencilOp layout: symmetric
    negative off-coefficients (periodic wrap), diag = -sum(off) + eps."""
    rng = np.random.default_rng(seed)
    offs = []
    for d in range(ndims):
        ax = len(shape) - 1 - d
        c = rng.uniform(0.5, 1.5, size=shape)  # coef on the lower face
        offs_lo = -c
        offs_hi = -np.roll(c, -1, axis=ax)  # symmetry: A[i,i+1] == A[i+1,i]
        offs.extend([offs_lo, offs_hi])
    off = np.stack(offs, axis=0)
    diag = -off.sum(axis=0) + 0.05
    return st.StencilOp(diag=jnp.asarray(diag, dtype),
                        off=jnp.asarray(off, dtype))


def _both(op, b, ndims, x0=None, **kw):
    mv = lambda v: st.stencil_apply(op, v, ndims)
    precond = None
    if kw.get("precondition", True):
        inv = 1.0 / op.diag
        precond = lambda r: inv * r
    x_ref, info_ref = linsolve.cg(
        mv, b, x0=x0, tol=kw.get("tol", 1e-6), maxiter=kw.get("maxiter", 500),
        precond=precond, return_best=kw.get("return_best", True),
        stall_iters=kw.get("stall_iters", 250))
    x_fused, info_fused = cg_pallas.fused_cg(
        op.diag, op.off, b, x0=x0, ndims=ndims, tol=kw.get("tol", 1e-6),
        maxiter=kw.get("maxiter", 500),
        stall_iters=kw.get("stall_iters", 250),
        precondition=kw.get("precondition", True),
        return_best=kw.get("return_best", True), interpret=True)
    return (x_ref, info_ref), (x_fused, info_fused)


@pytest.mark.parametrize("shape,ndims", [((16, 128), 2), ((4, 8, 128), 3)])
def test_fused_cg_matches_xla_cg(shape, ndims):
    op = _poisson_like_op(shape, ndims)
    b = jnp.asarray(np.random.default_rng(1).normal(size=shape), jnp.float32)
    (x_ref, i_ref), (x_f, i_f) = _both(op, b, ndims, tol=1e-6)
    assert bool(i_ref.converged) and bool(i_f.converged)
    # both satisfy the same RMSE criterion; iterates agree to solver tol scale
    assert np.allclose(np.asarray(x_f), np.asarray(x_ref), atol=5e-4), (
        np.abs(np.asarray(x_f) - np.asarray(x_ref)).max())
    assert abs(int(i_f.iterations) - int(i_ref.iterations)) <= 2


def test_fused_cg_warm_start():
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=2)
    b = jnp.asarray(np.random.default_rng(3).normal(size=shape), jnp.float32)
    x_cold, _ = cg_pallas.fused_cg(op.diag, op.off, b, ndims=ndims, tol=1e-6,
                                   interpret=True)
    x0 = x_cold + 1e-3
    (x_ref, i_ref), (x_f, i_f) = _both(op, b, ndims, x0=x0, tol=1e-6)
    assert bool(i_f.converged)
    assert int(i_f.iterations) < 20  # warm start actually used
    assert np.allclose(np.asarray(x_f), np.asarray(x_ref), atol=5e-4)


def test_fused_cg_zero_rhs():
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=4)
    b = jnp.zeros(shape, jnp.float32)
    x, info = cg_pallas.fused_cg(op.diag, op.off, b, ndims=ndims, tol=1e-6,
                                 interpret=True)
    assert np.array_equal(np.asarray(x), np.zeros(shape))
    assert bool(info.converged)


def test_fused_cg_nonconvergence_flagged():
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=5)
    b = jnp.asarray(np.random.default_rng(6).normal(size=shape), jnp.float32)
    x, info = cg_pallas.fused_cg(op.diag, op.off, b, ndims=ndims, tol=1e-12,
                                 maxiter=3, interpret=True)
    assert not bool(info.converged)
    assert np.isfinite(np.asarray(x)).all()


def test_fused_cg_vmap():
    """BatchedFluidEnv vmaps through the solve; each lane must match its
    standalone solve."""
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=7)
    rng = np.random.default_rng(8)
    bs = jnp.asarray(rng.normal(size=(3,) + shape), jnp.float32)

    solve = functools.partial(cg_pallas.fused_cg, ndims=ndims, tol=1e-6,
                              interpret=True)
    xb, infob = jax.vmap(lambda b: solve(op.diag, op.off, b))(bs)
    for i in range(3):
        xi, _ = solve(op.diag, op.off, bs[i])
        assert np.allclose(np.asarray(xb[i]), np.asarray(xi), atol=5e-4)
    assert bool(infob.converged.all())


def test_fused_cg_vmap_chunked(monkeypatch):
    """Batches beyond the VMEM budget split into resident chunks; lanes must
    still match standalone solves (pad lanes are discarded)."""
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=9)
    rng = np.random.default_rng(10)
    bs = jnp.asarray(rng.normal(size=(5,) + shape), jnp.float32)

    monkeypatch.setattr(cg_pallas, "_VMEM_BUDGET_BYTES",
                        2 * cg_pallas._lane_bytes(shape, ndims, jnp.float32))
    solve = functools.partial(cg_pallas.fused_cg, ndims=ndims, tol=1e-6,
                              interpret=True)
    xb, infob = jax.vmap(lambda b: solve(op.diag, op.off, b))(bs)  # 3 chunks
    assert bool(infob.converged.all())
    for i in range(5):
        xi, _ = solve(op.diag, op.off, bs[i])
        assert np.allclose(np.asarray(xb[i]), np.asarray(xi), atol=5e-4)


def test_fused_cg_vmap_xla_fallback(monkeypatch):
    """When VMEM holds fewer than 8 lanes, the vmap rule falls back to the
    lockstep XLA loop (lane serialization loses); results still match."""
    shape, ndims = (16, 128), 2
    op = _poisson_like_op(shape, ndims, seed=11)
    rng = np.random.default_rng(12)
    bs = jnp.asarray(rng.normal(size=(5,) + shape), jnp.float32)

    monkeypatch.setattr(cg_pallas, "_VMEM_BUDGET_BYTES",
                        3 * cg_pallas._lane_bytes(shape, ndims, jnp.float32))
    assert cg_pallas._max_lanes(shape, ndims, jnp.float32) < 8
    solve = functools.partial(cg_pallas.fused_cg, ndims=ndims, tol=1e-6,
                              interpret=True)
    xb, infob = jax.vmap(lambda b: solve(op.diag, op.off, b))(bs)
    assert bool(infob.converged.all())
    for i in range(5):
        xi, _ = solve(op.diag, op.off, bs[i])
        assert np.allclose(np.asarray(xb[i]), np.asarray(xi), atol=5e-4)


def test_dispatch_gate():
    """_fused_cg_usable: single block + no CONNECTED faces + VMEM fit only."""
    from fluidgym_tpu.solver.piso import _fused_cg_usable

    assert cg_pallas.fused_cg_eligible((64, 128), 2, jnp.float32)
    assert not cg_pallas.fused_cg_eligible((8, 8), 2, jnp.float32)  # tiny
    assert not cg_pallas.fused_cg_eligible((512, 512, 64), 3, jnp.float32)

    # eligibility is necessary but the mode gate must hold on CPU "auto"
    cg_pallas.set_fused_cg("auto")
    assert not cg_pallas.fused_cg_enabled()  # CPU backend in tests


def test_fused_solve_differentiable_matches_xla(monkeypatch):
    """piso._solve with the fused kernel under lax.custom_linear_solve:
    solution and implicit-function gradient match the XLA path."""
    from fluidgym_tpu.core.domain import BoundKind, BlockTopo, DomainTopo, FaceSpec
    from fluidgym_tpu.solver import piso

    shape, ndims = (8, 128), 2
    op = _poisson_like_op(shape, ndims, seed=13)
    topo = DomainTopo(
        ndims=2,
        blocks=(BlockTopo(shape=shape, orthogonal=True,
                          faces=tuple(FaceSpec(kind=BoundKind.PERIODIC)
                                      for _ in range(4))),),
    )
    b = jnp.asarray(np.random.default_rng(14).normal(size=shape), jnp.float32)

    def solve_loss(diag, fused):
        cg_pallas.set_fused_cg(fused)
        try:
            op2 = st.StencilOp(diag=diag, off=op.off)
            x, _ = piso._solve((op2,), (b,), topo, tol=1e-6, maxiter=400,
                               symmetric=True, use_bicg=False,
                               return_best=True, differentiable=True,
                               precondition=True)
            return jnp.sum(x[0] ** 2)
        finally:
            cg_pallas.set_fused_cg("auto")

    g_xla = jax.grad(lambda d: solve_loss(d, False))(op.diag)
    g_fused = jax.grad(lambda d: solve_loss(d, True))(op.diag)
    l_xla = solve_loss(op.diag, False)
    l_fused = solve_loss(op.diag, True)
    assert np.allclose(float(l_xla), float(l_fused), rtol=1e-4)
    assert np.allclose(np.asarray(g_xla), np.asarray(g_fused),
                       rtol=1e-3, atol=1e-5 * np.abs(np.asarray(g_xla)).max())
