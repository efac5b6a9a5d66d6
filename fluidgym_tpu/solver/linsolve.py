"""Matrix-free Krylov solvers (CG / BiCGStab) with reference-compatible
convergence semantics.

Replaces the reference's cuBLAS/cuSPARSE CSR solvers
(``/root/reference/src/fluidgym/simulation/extensions/cg_solver_kernel.cu``,
``bicgstab_solver_kernel.cu``) with ``lax.while_loop`` Krylov iterations over
matrix-free stencil applies.

Reference-compatible pieces:

* convergence criterion ``NORM2_NORMALIZED`` = ||r||_2 / sqrt(n) <= tol
  (cg_solver_kernel.cu:100-105; PISOtorch_simulation.py:1096-1098);
* all-zero RHS short-circuits to a zero solution
  (PISOtorch_diff.py:_linear_solve_wrapper "if not rhs.eq(0).all()");
* ``return_best_result``: track the iterate with the lowest residual and
  return it if the solve does not converge (PISOtorch.cpp:567);
* default tolerances 1e-5 (fp32) / 1e-8 (fp64) (PISOtorch_diff.py:247-253).

Differentiation: solves are wrapped in ``jax.lax.custom_linear_solve`` at the
call sites (solver/piso.py), which supplies the implicit-function VJP (a
transposed solve) that the reference hand-writes in
PISOtorch_diff.py:516-618 -- including gradients w.r.t. the stencil
coefficients via automatic differentiation of the matvec.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Vec = Any  # an array or any pytree of arrays (e.g. tuple of per-block fields)

__all__ = ["SolveInfo", "default_tolerance", "cg", "bicgstab"]


def _vdot(a: Vec, b: Vec) -> Array:
    """Real inner product over a pytree."""
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return sum(jnp.vdot(x, y).real for x, y in zip(leaves_a, leaves_b))


def _size(a: Vec) -> int:
    return sum(x.size for x in jax.tree.leaves(a))


def _dtype(a: Vec):
    return jax.tree.leaves(a)[0].dtype


def _axpy(alpha, x: Vec, y: Vec) -> Vec:
    return jax.tree.map(lambda xx, yy: alpha * xx + yy, x, y)


def _scale_add(y: Vec, beta, x: Vec) -> Vec:
    return jax.tree.map(lambda yy, xx: yy + beta * xx, y, x)


def _zeros_like(a: Vec) -> Vec:
    return jax.tree.map(jnp.zeros_like, a)


def _where(pred, a: Vec, b: Vec) -> Vec:
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _all_zero(a: Vec) -> Array:
    leaves = jax.tree.leaves(a)
    out = jnp.all(leaves[0] == 0)
    for x in leaves[1:]:
        out = jnp.logical_and(out, jnp.all(x == 0))
    return out


class SolveInfo(NamedTuple):
    """Result metadata mirroring the reference LinearSolverResultInfo."""

    converged: Array      # bool
    iterations: Array     # int32
    residual: Array       # final (or best) normalized residual


def default_tolerance(dtype) -> float:
    """Reference default solver tolerance by dtype (PISOtorch_diff.py:247)."""
    return 1e-8 if jnp.dtype(dtype) == jnp.float64 else 1e-5


def _rmse(r: Array) -> Array:
    return jnp.sqrt(jnp.mean(r * r))


def cg(
    matvec: Callable[[Vec], Vec],
    b: Vec,
    x0: Vec | None = None,
    *,
    tol: float | None = None,
    maxiter: int = 5000,
    return_best: bool = True,
    precond: Callable[[Vec], Vec] | None = None,
    stall_iters: int = 250,
) -> tuple[Vec, SolveInfo]:
    """(Preconditioned) conjugate gradients on an SPD matrix-free operator.

    ``b`` may be an array or a pytree of arrays (multi-block fields);
    ``precond`` applies an SPD preconditioner inverse (e.g. Jacobi).
    Convergence: RMSE of the TRUE residual <= tol (NORM2_NORMALIZED).
    ``stall_iters``: stop early when the best residual has not improved for
    this many iterations -- fp32 cannot reach arbitrarily tight tolerances
    (the reference falls back to fp64 instead; here ``return_best`` hands
    back the best iterate without burning the remaining ``maxiter``).
    """
    dt = _dtype(b)
    if tol is None:
        tol = default_tolerance(dt)
    n = _size(b)
    tol2_sum = jnp.asarray((tol * tol) * n, dt)  # ||r||^2 threshold

    x = _zeros_like(b) if x0 is None else x0
    r = jax.tree.map(lambda bb, ax: bb - ax, b, matvec(x)) if x0 is not None else b
    z = precond(r) if precond is not None else r
    p = z
    rz = _vdot(r, z).astype(dt)
    rs = _vdot(r, r).astype(dt)

    def cond(carry):
        x, r, p, rz, rs, it, best_x, best_rs, best_it = carry
        ok = jnp.logical_and(it < maxiter, rs > tol2_sum)
        return jnp.logical_and(ok, it - best_it < stall_iters)

    def body(carry):
        x, r, p, rz, rs, it, best_x, best_rs, best_it = carry
        tiny = jnp.asarray(1e-30, dt)
        # Per-lane freeze: under vmap the batched while_loop runs until the
        # SLOWEST lane converges and keeps applying the body to all lanes;
        # masking the scalar step sizes to zero freezes converged/stalled
        # lanes at exactly the iterate a single-env solve would return
        # (reference: per-batch LinearSolverResultInfo, PISOtorch.cpp:567).
        # In the unbatched path the loop exits before ``done`` can be true,
        # so this is a no-op there.
        done = jnp.logical_or(rs <= tol2_sum, it - best_it >= stall_iters)
        # Periodic TRUE-residual recomputation against fp32 drift (reference
        # residual_reset_step=100).  Implemented as a maintenance iteration
        # that spends its single matvec on A@x instead of A@p -- a batched
        # lax.cond would evaluate BOTH branches (two matvecs per iteration
        # for every vmapped solve); selecting the matvec INPUT keeps the hot
        # loop at one matvec regardless of batching.
        recompute = (it + 1) % 100 == 0
        Av = matvec(_where(recompute, x, p))  # recompute ? A@x : A@p
        denom = _vdot(p, Av).astype(dt)
        alpha = jnp.where(
            jnp.logical_or(done, recompute),
            jnp.asarray(0, dt),
            rz / jnp.where(jnp.abs(denom) < tiny, tiny, denom),
        )
        x = _axpy(alpha, p, x)
        r_true = jax.tree.map(lambda bb, av: bb - av, b, Av)
        r = _where(recompute, r_true, _axpy(-alpha, Av, r))
        z = precond(r) if precond is not None else r
        rz_new = _vdot(r, z).astype(dt)
        rs_new = _vdot(r, r).astype(dt)
        beta = jnp.where(
            done,
            jnp.asarray(0, dt),
            rz_new / jnp.where(jnp.abs(rz) < tiny, tiny, rz),
        )
        p = _scale_add(z, beta, p)
        better = jnp.logical_and(rs_new < best_rs, jnp.logical_not(done))
        best_x = _where(better, x, best_x)
        best_rs = jnp.where(better, rs_new, best_rs)
        best_it = jnp.where(better, it + 1, best_it)
        return x, r, p, rz_new, rs_new, it + 1, best_x, best_rs, best_it

    init = (x, r, p, rz, rs, jnp.asarray(0, jnp.int32), x, rs,
            jnp.asarray(0, jnp.int32))
    x, r, p, rz, rs, it, best_x, best_rs, _ = lax.while_loop(cond, body, init)

    converged = rs <= tol2_sum
    if return_best:
        x = _where(converged, x, best_x)
        rs_out = jnp.where(converged, rs, best_rs)
    else:
        rs_out = rs
    # all-zero RHS -> zero solution
    b_zero = _all_zero(b)
    x = _where(b_zero, _zeros_like(x), x)
    converged = jnp.logical_or(converged, b_zero)
    info = SolveInfo(converged=converged, iterations=it, residual=jnp.sqrt(rs_out / n))
    return x, info


def bicgstab(
    matvec: Callable[[Vec], Vec],
    b: Vec,
    x0: Vec | None = None,
    *,
    tol: float | None = None,
    maxiter: int = 5000,
    return_best: bool = True,
    stall_iters: int = 250,
    precond: Callable[[Vec], Vec] | None = None,
) -> tuple[Vec, SolveInfo]:
    """BiCGStab for non-symmetric matrix-free operators (advection systems).

    ``b`` may be an array or a pytree of arrays.  Mirrors the unpreconditioned
    path of bicgstab_solver_kernel.cu (the reference default:
    Simulation.preconditionBiCG=False).

    ``precond``: optional RIGHT preconditioner ``K^-1 r`` (e.g. Jacobi for
    the full non-orthogonal pressure system).  Right preconditioning keeps
    ``r`` the TRUE residual, so the stopping criterion, stall tracking and
    return-best logic are unchanged.
    """
    dt = _dtype(b)
    if tol is None:
        tol = default_tolerance(dt)
    n = _size(b)
    tol2_sum = jnp.asarray((tol * tol) * n, dt)

    x = _zeros_like(b) if x0 is None else x0
    r = jax.tree.map(lambda bb, ax: bb - ax, b, matvec(x)) if x0 is not None else b
    r_hat = r
    rho = _vdot(r_hat, r).astype(dt)
    p = r
    rs = _vdot(r, r).astype(dt)

    def cond(carry):
        x, r, p, rho, rs, it, best_x, best_rs, best_it = carry
        ok = jnp.logical_and(it < maxiter, rs > tol2_sum)
        return jnp.logical_and(ok, it - best_it < stall_iters)

    def body(carry):
        x, r, p, rho, rs, it, best_x, best_rs, best_it = carry
        tiny = jnp.asarray(1e-30, dt)
        # per-lane freeze under vmap (see cg); no-op in the unbatched path
        done = jnp.logical_or(rs <= tol2_sum, it - best_it >= stall_iters)
        not_done = jnp.logical_not(done)
        p_hat = precond(p) if precond is not None else p
        v = matvec(p_hat)
        denom = _vdot(r_hat, v).astype(dt)
        alpha = jnp.where(
            done, jnp.asarray(0, dt),
            rho / jnp.where(jnp.abs(denom) < tiny, tiny, denom))
        s = _axpy(-alpha, v, r)
        s_hat = precond(s) if precond is not None else s
        t = matvec(s_hat)
        tt = _vdot(t, t).astype(dt)
        omega = jnp.where(
            done, jnp.asarray(0, dt),
            _vdot(t, s).astype(dt) / jnp.where(tt < tiny, tiny, tt))
        x = jax.tree.map(
            lambda xx, pp, ss: xx + alpha * pp + omega * ss, x, p_hat, s_hat)
        r = _axpy(-omega, t, s)
        rho_new = jnp.where(done, rho, _vdot(r_hat, r).astype(dt))
        beta = jnp.where(
            done, jnp.asarray(0, dt),
            (rho_new / jnp.where(jnp.abs(rho) < tiny, tiny, rho))
            * (alpha / jnp.where(jnp.abs(omega) < tiny, tiny, omega)))
        p = jax.tree.map(lambda rr, pp, vv: rr + beta * (pp - omega * vv), r, p, v)
        rs_new = jnp.where(done, rs, _vdot(r, r).astype(dt))
        better = jnp.logical_and(rs_new < best_rs, not_done)
        best_x = _where(better, x, best_x)
        best_rs = jnp.where(better, rs_new, best_rs)
        best_it = jnp.where(better, it + 1, best_it)
        return x, r, p, rho_new, rs_new, it + 1, best_x, best_rs, best_it

    init = (x, r, p, rho, rs, jnp.asarray(0, jnp.int32), x, rs,
            jnp.asarray(0, jnp.int32))
    x, r, p, rho, rs, it, best_x, best_rs, _ = lax.while_loop(cond, body, init)

    converged = rs <= tol2_sum
    if return_best:
        x = _where(converged, x, best_x)
        rs_out = jnp.where(converged, rs, best_rs)
    else:
        rs_out = rs
    b_zero = _all_zero(b)
    x = _where(b_zero, _zeros_like(x), x)
    converged = jnp.logical_or(converged, b_zero)
    info = SolveInfo(converged=converged, iterations=it, residual=jnp.sqrt(rs_out / n))
    return x, info
