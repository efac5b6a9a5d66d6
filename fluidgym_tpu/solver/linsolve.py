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

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

__all__ = ["SolveInfo", "default_tolerance", "cg", "bicgstab"]


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
    matvec: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    *,
    tol: float | None = None,
    maxiter: int = 5000,
    return_best: bool = True,
) -> tuple[Array, SolveInfo]:
    """Conjugate gradients on an SPD matrix-free operator.

    Convergence: RMSE of the residual <= tol (NORM2_NORMALIZED).
    """
    if tol is None:
        tol = default_tolerance(b.dtype)
    n = b.size
    tol2_sum = jnp.asarray((tol * tol) * n, b.dtype)  # ||r||^2 threshold

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b
    p = r
    rs = jnp.vdot(r, r).real.astype(b.dtype)

    def cond(carry):
        x, r, p, rs, it, best_x, best_rs = carry
        return jnp.logical_and(it < maxiter, rs > tol2_sum)

    def body(carry):
        x, r, p, rs, it, best_x, best_rs = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap).real.astype(b.dtype)
        alpha = rs / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r).real.astype(b.dtype)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = r + beta * p
        better = rs_new < best_rs
        best_x = jnp.where(better, x, best_x)
        best_rs = jnp.where(better, rs_new, best_rs)
        return x, r, p, rs_new, it + 1, best_x, best_rs

    init = (x, r, p, rs, jnp.asarray(0, jnp.int32), x, rs)
    x, r, p, rs, it, best_x, best_rs = lax.while_loop(cond, body, init)

    converged = rs <= tol2_sum
    if return_best:
        x = jnp.where(converged, x, best_x)
        rs_out = jnp.where(converged, rs, best_rs)
    else:
        rs_out = rs
    # all-zero RHS -> zero solution
    b_zero = jnp.all(b == 0)
    x = jnp.where(b_zero, jnp.zeros_like(x), x)
    converged = jnp.logical_or(converged, b_zero)
    info = SolveInfo(converged=converged, iterations=it, residual=jnp.sqrt(rs_out / n))
    return x, info


def bicgstab(
    matvec: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    *,
    tol: float | None = None,
    maxiter: int = 5000,
    return_best: bool = True,
) -> tuple[Array, SolveInfo]:
    """BiCGStab for non-symmetric matrix-free operators (advection systems).

    Mirrors the unpreconditioned path of bicgstab_solver_kernel.cu (the
    reference default: Simulation.preconditionBiCG=False).
    """
    if tol is None:
        tol = default_tolerance(b.dtype)
    n = b.size
    tol2_sum = jnp.asarray((tol * tol) * n, b.dtype)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b
    r_hat = r
    rho = jnp.vdot(r_hat, r).real.astype(b.dtype)
    p = r
    rs = jnp.vdot(r, r).real.astype(b.dtype)

    def cond(carry):
        x, r, p, rho, rs, it, best_x, best_rs = carry
        return jnp.logical_and(it < maxiter, rs > tol2_sum)

    def body(carry):
        x, r, p, rho, rs, it, best_x, best_rs = carry
        v = matvec(p)
        denom = jnp.vdot(r_hat, v).real.astype(b.dtype)
        alpha = rho / jnp.where(denom == 0, 1.0, denom)
        s = r - alpha * v
        t = matvec(s)
        tt = jnp.vdot(t, t).real.astype(b.dtype)
        omega = jnp.vdot(t, s).real.astype(b.dtype) / jnp.where(tt == 0, 1.0, tt)
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho_new = jnp.vdot(r_hat, r).real.astype(b.dtype)
        beta = (rho_new / jnp.where(rho == 0, 1.0, rho)) * (
            alpha / jnp.where(omega == 0, 1.0, omega)
        )
        p = r + beta * (p - omega * v)
        rs_new = jnp.vdot(r, r).real.astype(b.dtype)
        better = rs_new < best_rs
        best_x = jnp.where(better, x, best_x)
        best_rs = jnp.where(better, rs_new, best_rs)
        return x, r, p, rho_new, rs_new, it + 1, best_x, best_rs

    init = (x, r, p, rho, rs, jnp.asarray(0, jnp.int32), x, rs)
    x, r, p, rho, rs, it, best_x, best_rs = lax.while_loop(cond, body, init)

    converged = rs <= tol2_sum
    if return_best:
        x = jnp.where(converged, x, best_x)
        rs_out = jnp.where(converged, rs, best_rs)
    else:
        rs_out = rs
    b_zero = jnp.all(b == 0)
    x = jnp.where(b_zero, jnp.zeros_like(x), x)
    converged = jnp.logical_or(converged, b_zero)
    info = SolveInfo(converged=converged, iterations=it, residual=jnp.sqrt(rs_out / n))
    return x, info
