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

__all__ = ["SolveInfo", "default_tolerance", "cg", "bicgstab", "refined"]


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


def _two_sum_acc(hi: Vec, lo: Vec, d: Vec) -> tuple[Vec, Vec]:
    """Accumulate ``d`` into the double-float pair ``(hi, lo)``.

    Fast two-sum per leaf (exact in round-to-nearest when |hi| >= |d|, which
    holds here because each refinement correction is orders of magnitude
    smaller than the accumulated solution), followed by a renormalization so
    ``lo`` stays a strict tail of ``hi``."""
    def _acc(h, l, dd):
        s = h + dd
        err = (h - s) + dd
        l2 = l + err
        h3 = s + l2
        l3 = (s - h3) + l2
        return h3, l3
    flat_h, treedef = jax.tree.flatten(hi)
    flat_l = jax.tree.leaves(lo)
    flat_d = jax.tree.leaves(d)
    pairs = [_acc(h, l, dd) for h, l, dd in zip(flat_h, flat_l, flat_d)]
    return (jax.tree.unflatten(treedef, [p[0] for p in pairs]),
            jax.tree.unflatten(treedef, [p[1] for p in pairs]))


def refined(
    matvec: Callable[[Vec], Vec],
    b: Vec,
    inner: Callable[[Vec], Vec],
    *,
    tol: float,
    restarts: int = 3,
    x0: Vec | None = None,
) -> tuple[Vec, SolveInfo]:
    """Residual-rescaled iterative refinement around ANY fp32 inner solver.

    fp32 Krylov stalls near ``eps * |x|``: once corrections ``alpha*p`` are
    ~1e-7 relative to the accumulated iterate they round away, so tight
    tolerances (airfoil 1e-7, 3D cylinder 5e-7) end by stagnation after
    burning the stall patience (round-2 VALIDATION).  The reference escapes
    to an fp64 re-solve (PISOtorch_diff.py:418-447); fp64 is not native on
    TPU, so instead the solve is RESTARTED on the recomputed true residual,
    RESCALED to unit RMS — putting the inner solve back in fp32's sweet spot
    every time — while the solution accumulates in a double-float (hi, lo)
    compensated pair whose effective precision is ~2x fp32 mantissa.  Each
    restart multiplies the attainable residual by the inner solver's relative
    tolerance, so a moderate inner tol (1e-3) reaches 1e-7+ in 2-3 restarts
    WITHOUT any stall-patience burn.

    ``inner(rhs) -> (x, SolveInfo)`` is the wrapped solver (XLA CG, the
    fused/merged Pallas kernels, ...), called with a unit-RMS right-hand
    side and a zero initial guess; ``x0`` warm-starts the OUTER accumulation.
    All restarts execute under jit (masked to no-ops once converged:
    converged lanes feed the inner solver an all-zero RHS, which every
    solver here short-circuits), so the wrapper is vmap/batch-safe.
    """
    dt = _dtype(b)
    n = _size(b)
    tol2_sum = jnp.asarray((tol * tol) * n, dt)
    tiny = jnp.asarray(1e-30, dt)

    x_hi = _zeros_like(b) if x0 is None else x0
    x_lo = _zeros_like(b)
    total_it = jnp.asarray(0, jnp.int32)
    rs = jnp.asarray(jnp.inf, dt)
    for k in range(max(1, restarts)):
        # true residual of the double-float iterate; hi first so the large
        # cancellation happens before the small tail is subtracted
        r = jax.tree.map(lambda bb, a: bb - a, b, matvec(x_hi))
        r = jax.tree.map(lambda rr, a: rr - a, r, matvec(x_lo))
        rs = _vdot(r, r).astype(dt)
        done = rs <= tol2_sum
        # rescale to unit RMS; converged lanes get an all-zero RHS (the
        # inner solve short-circuits on it)
        s = jnp.where(done, jnp.asarray(0, dt),
                      lax.rsqrt(jnp.maximum(rs / n, tiny)))
        rn = jax.tree.map(lambda rr: rr * s, r)
        d, info = inner(rn)
        total_it = total_it + info.iterations
        inv_s = jnp.where(done, jnp.asarray(0, dt), 1.0 / jnp.maximum(s, tiny))
        d = jax.tree.map(lambda dd: dd * inv_s, d)
        x_hi, x_lo = _two_sum_acc(x_hi, x_lo, d)

    # the caller consumes a single fp32 field: collapse, and report the
    # residual OF THE COLLAPSED iterate (the honest downstream quantity --
    # reachable because the pressure systems' natural scale keeps the
    # fp32-representation floor eps*|A||x| below the declared tolerances)
    x = jax.tree.map(lambda h, l: h + l, x_hi, x_lo)
    r = jax.tree.map(lambda bb, a: bb - a, b, matvec(x))
    rs = _vdot(r, r).astype(dt)
    b_zero = _all_zero(b)
    x = _where(b_zero, _zeros_like(x), x)
    converged = jnp.logical_or(rs <= tol2_sum, b_zero)
    return x, SolveInfo(converged=converged, iterations=total_it,
                        residual=jnp.sqrt(rs / n))


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
