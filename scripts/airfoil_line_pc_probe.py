"""Offline preconditioner study on the REAL airfoil pressure operator (CPU).

Builds the production pressure Poisson operator at the developed
Airfoil2D-easy state (same recipe as piso.piso_substep: advection diag ->
build_pressure_ops) and counts PCG iterations for a 4-decade residual
reduction (the warm-start -> tol 1e-7 span measured in production) under
  * Jacobi (the production preconditioner),
  * line-relaxation along axis 0 / axis 1 (block tridiagonal solves --
    the textbook anisotropy fix for stretched boundary-layer grids),
  * ADI (axis 0 then axis 1, multiplicative).

The RHS is random (all-spectrum), x0 = 0; Jacobi's count under this proxy
calibrates against the ~600 iters/solve seen in production.  Iteration
counts are hardware-independent; wall-clock decisions then need one TPU
A/B of the winning variant.

Run: PYTHONPATH=/root/repo python -u scripts/airfoil_line_pc_probe.py \
        [env_id] [| tee file]   (prints unbuffered)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import fluidgym_tpu
from fluidgym_tpu.solver import nonortho
from fluidgym_tpu.solver import stencil as st

ENV_ID = sys.argv[1] if len(sys.argv) > 1 else "Airfoil2D-easy-v0"
DECADES = 4.0


def log(*a):
    print(*a, flush=True)


def build_system():
    import jax.numpy as jnp

    env = fluidgym_tpu.make(ENV_ID, load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False,
                            episode_length=10**9)
    env.reset(seed=0)
    state, geoms, topo, cfg = env._state, env._geoms, env._topo, env._cfg
    nu = state.viscosity
    dt = jnp.asarray(0.01, state.blocks[0].velocity.dtype)
    adv_ops = st.build_advection_ops(state, geoms, topo, nu, dt,
                                     upwind=cfg.advection_upwind_blend)
    if cfg.non_orthogonal:
        nus = tuple(jnp.full_like(g.det, 1.0) * st._block_nu(state, b, nu, False)
                    for b, g in enumerate(geoms))
        adv_ops = nonortho.apply_matrix_terms(
            adv_ops, geoms, topo, nus, det_divide=True, field="velocity")
    adiags = tuple(op.diag for op in adv_ops)
    p_ops = st.build_pressure_ops(adiags, geoms, topo)
    return p_ops, topo


def make_apply(ops, topo):
    import jax
    import jax.numpy as jnp
    from fluidgym_tpu.solver.stencil import domain_apply

    ops64 = tuple(type(o)(diag=jnp.asarray(o.diag, jnp.float64),
                          off=jnp.asarray(o.off, jnp.float64)) for o in ops)
    fn = jax.jit(lambda xs: domain_apply(ops64, xs, topo))

    def apply_A(xs):
        ys = fn(tuple(jnp.asarray(x) for x in xs))
        return [np.asarray(y) for y in ys]
    return apply_A


def dot(xs, ys):
    return sum(float(np.vdot(x, y)) for x, y in zip(xs, ys))


def tridiag_solve_along(diag, lo, hi, r, arr_axis):
    """Thomas solve along `arr_axis` for every line of the block (numpy)."""
    d = np.moveaxis(diag, arr_axis, -1).copy()
    a = np.moveaxis(lo, arr_axis, -1)
    c = np.moveaxis(hi, arr_axis, -1)
    b = np.moveaxis(r, arr_axis, -1).copy()
    n = d.shape[-1]
    for i in range(1, n):
        w = a[..., i] / d[..., i - 1]
        d[..., i] -= w * c[..., i - 1]
        b[..., i] -= w * b[..., i - 1]
    x = np.empty_like(b)
    x[..., -1] = b[..., -1] / d[..., -1]
    for i in range(n - 2, -1, -1):
        x[..., i] = (b[..., i] - c[..., i] * x[..., i + 1]) / d[..., i]
    return np.moveaxis(x, -1, arr_axis)


def make_precond(ops, kind):
    diags = [np.asarray(o.diag, np.float64) for o in ops]
    offs = [np.asarray(o.off, np.float64) for o in ops]

    def line_factors(axis):
        fs = []
        for dg, of in zip(diags, offs):
            nd = dg.ndim
            arr_axis = nd - 1 - axis
            hi = of[2 * axis + 1].copy()
            hi[(slice(None),) * arr_axis + (-1,)] = 0.0
            lo = np.roll(hi, 1, axis=arr_axis)  # symmetric: A[i,i-1]=hi[i-1]
            fs.append((dg, lo, hi, arr_axis))
        return fs

    f0 = line_factors(0)
    f1 = line_factors(1)

    def line(rs, fs):
        return [tridiag_solve_along(dg, lo, hi, r, ax)
                for (dg, lo, hi, ax), r in zip(fs, rs)]

    if kind == "jacobi":
        return lambda rs: [r / d for r, d in zip(rs, diags)]
    if kind == "line0":
        return lambda rs: line(rs, f0)
    if kind == "line1":
        return lambda rs: line(rs, f1)
    if kind == "adi":
        # symmetrized sweep keeps M SPD-ish for PCG: z = M1(r); z += M0(r - A z)
        return lambda rs: line(line(rs, f0), f1)
    raise ValueError(kind)


def pcg(apply_A, M, b, tol_rel, maxiter=8000):
    x = [np.zeros_like(v) for v in b]
    r = [v.copy() for v in b]
    n = sum(v.size for v in b)
    r0 = np.sqrt(dot(r, r) / n)
    z = M(r)
    p = [v.copy() for v in z]
    rz = dot(r, z)
    for it in range(maxiter):
        rmse = np.sqrt(dot(r, r) / n)
        if rmse <= tol_rel * r0:
            return it, rmse / r0
        Ap = apply_A(p)
        alpha = rz / dot(p, Ap)
        x = [xx + alpha * pp for xx, pp in zip(x, p)]
        r = [rr - alpha * aa for rr, aa in zip(r, Ap)]
        z = M(r)
        rz_new = dot(r, z)
        p = [zz + (rz_new / rz) * pp for zz, pp in zip(z, p)]
        rz = rz_new
    return maxiter, np.sqrt(dot(r, r) / n) / r0


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    t0 = time.time()
    ops, topo = build_system()
    log(f"pressure operator built ({time.time()-t0:.0f}s): "
        f"{len(ops)} blocks {[tuple(o.diag.shape) for o in ops]}")
    apply_A = make_apply(ops, topo)
    rng = np.random.default_rng(0)
    b = [rng.standard_normal(tuple(o.diag.shape)) for o in ops]
    tol_rel = 10.0 ** (-DECADES)
    for kind in ("jacobi", "line0", "line1", "adi"):
        M = make_precond(ops, kind)
        t0 = time.time()
        iters, rel = pcg(apply_A, M, b, tol_rel)
        log(f"{kind:7s}: {iters:5d} iters to {DECADES:.0f} decades "
            f"(final rel {rel:.2e}, {time.time()-t0:.1f}s host)")


if __name__ == "__main__":
    main()
