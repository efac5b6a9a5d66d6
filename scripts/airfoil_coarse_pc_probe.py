"""Two-level (coarse-space) preconditioner study on the REAL airfoil
pressure operator (CPU, fp64 math).

Round-4 context: line relaxation (1.2-1.7x iteration cut, >=2-3x cost) and
the Galerkin MG V-cycle (5-19x cut, 15-40x per-iteration cost on TPU) are
both recorded negatives; the remaining lever for the airfoil family's
throughput (VERDICT r3 #5) is an iteration cut whose per-iteration cost is
one cheap reduction + one small MXU matmul.  That is exactly an ADDITIVE
two-level preconditioner

    M^-1 r = D^-1 r + W E^+ W^T r,      E = W^T A W

with an aggregation coarse space W: per-block tiles of s x s cells,
column = tile indicator.  W^T r is an average-pool (one pass over r), W c
is a nearest-upsample, E^+ is a precomputed k x k pinv (k ~ 70-300) -- no
V-cycle hierarchy of latency-bound tiny levels.

Variants measured (PCG iterations for a 4-decade residual reduction, the
production warm-start -> tol 1e-7 span; random all-spectrum RHS; Jacobi's
count calibrates against ~600 iters/solve in production):
  * jacobi              production baseline
  * cl18                existing per-block constant+linear space (k=18;
                        what `pressure_coarse_precondition` ships today)
  * agg16 / agg8 / agg4 aggregation tiles of 16/8/4 cells per axis
  * agg8-stale          agg8 with E built from a PERTURBED operator
                        (advection diag scaled by 1 +- 10%) -- staleness
                        tolerance for reusing E across substeps

Iteration counts are hardware-independent; the winning variant still needs
one TPU A/B (scripts/airfoil_perf_ab.py pattern) before shipping.

Run: PYTHONPATH=/root/repo python -u scripts/airfoil_coarse_pc_probe.py \
        [env_id]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

ENV_ID = sys.argv[1] if len(sys.argv) > 1 else "Airfoil2D-easy-v0"
DECADES = 4.0


def log(*a):
    print(*a, flush=True)


def build_system(perturb: float = 0.0):
    import jax.numpy as jnp

    import fluidgym_tpu
    from fluidgym_tpu.solver import nonortho
    from fluidgym_tpu.solver import stencil as st

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
        nus = tuple(jnp.full_like(g.det, 1.0)
                    * st._block_nu(state, b, nu, False)
                    for b, g in enumerate(geoms))
        adv_ops = nonortho.apply_matrix_terms(
            adv_ops, geoms, topo, nus, det_divide=True, field="velocity")
    adiags = tuple(op.diag for op in adv_ops)
    if perturb:
        rng = np.random.default_rng(7)
        adiags = tuple(
            jnp.asarray(np.asarray(d)
                        * (1.0 + perturb * rng.uniform(-1, 1, d.shape)))
            for d in adiags)
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


# --------------------------------------------------------------------------
# coarse spaces
# --------------------------------------------------------------------------
def basis_const_linear(shapes):
    """Per-block [1, x-ramp, y-ramp] (what _deflation_basis builds for a
    non-periodic topology); returns a list of dense columns."""
    cols = []
    for b, shp in enumerate(shapes):
        nd = len(shp)
        modes = [np.ones(shp)]
        for ax in range(nd):
            ramp = np.linspace(-1.0, 1.0, shp[ax])
            modes.append(np.broadcast_to(
                ramp.reshape((1,) * ax + (-1,) + (1,) * (nd - 1 - ax)),
                shp).copy())
        for m in modes:
            cols.append([m if bb == b else np.zeros(shapes[bb])
                         for bb in range(len(shapes))])
    return cols


def tile_maps(shapes, s):
    """Per-block integer tile-id map (cells -> coarse dof), ids globally
    unique across blocks; remainder cells join the last tile of the axis."""
    maps, k = [], 0
    for shp in shapes:
        idx = np.zeros(shp, np.int64)
        axes_bins = []
        for n in shp:
            nb = max(1, n // s)
            edges = np.minimum(np.arange(n) // s, nb - 1)
            axes_bins.append((edges, nb))
        if len(shp) == 2:
            (e0, n0), (e1, n1) = axes_bins
            idx = e0[:, None] * n1 + e1[None, :]
            nt = n0 * n1
        else:
            (e0, n0), (e1, n1), (e2, n2) = axes_bins
            idx = (e0[:, None, None] * n1 + e1[None, :, None]) * n2 \
                + e2[None, None, :]
            nt = n0 * n1 * n2
        maps.append(idx + k)
        k += nt
    return maps, k


def make_agg_precond(apply_A, diags, shapes, s, apply_A_for_E=None):
    """Additive two-level M^-1 = D^-1 + W E^+ W^T with tile aggregation."""
    maps, k = tile_maps(shapes, s)
    applyE = apply_A_for_E or apply_A
    # E = W^T A W, one column at a time (probe only; production batches)
    t0 = time.time()
    E = np.zeros((k, k))
    counts = np.zeros(k)
    for m in maps:
        np.add.at(counts, m.ravel(), 1.0)
    for j in range(k):
        col = [np.where(m == j, 1.0, 0.0) for m in maps]
        Ac = applyE(col)
        for m, a in zip(maps, Ac):
            np.add.at(E[:, j], m.ravel(), a.ravel())
    d = 1.0 / np.sqrt(np.abs(np.diag(E)) + 1e-30)
    En = E * d[:, None] * d[None, :]
    En_inv = np.linalg.pinv(En, rcond=1e-8)
    t_setup = time.time() - t0

    def M(rs):
        rhs = np.zeros(k)
        for m, r in zip(maps, rs):
            np.add.at(rhs, m.ravel(), r.ravel())
        c = d * (En_inv @ (d * rhs))
        return [r / dg + c[m] for r, dg, m in zip(rs, diags, maps)]

    return M, k, t_setup


def make_dense_coarse_precond(apply_A, diags, cols):
    k = len(cols)
    E = np.zeros((k, k))
    Acols = [apply_A(c) for c in cols]
    for i in range(k):
        for j in range(k):
            E[i, j] = dot(cols[i], Acols[j])
    d = 1.0 / np.sqrt(np.abs(np.diag(E)) + 1e-30)
    En_inv = np.linalg.pinv(E * d[:, None] * d[None, :], rcond=1e-8)

    def M(rs):
        rhs = np.array([dot(c, rs) for c in cols])
        cc = d * (En_inv @ (d * rhs))
        out = [r / dg for r, dg in zip(rs, diags)]
        for w, c in zip(cc, cols):
            out = [o + w * cb for o, cb in zip(out, c)]
        return out

    return M, k


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
    shapes = [tuple(o.diag.shape) for o in ops]
    log(f"pressure operator built ({time.time() - t0:.0f}s): "
        f"{len(ops)} blocks {shapes}")
    apply_A = make_apply(ops, topo)
    diags = [np.asarray(o.diag, np.float64) for o in ops]
    rng = np.random.default_rng(0)
    b = [rng.standard_normal(s) for s in shapes]
    tol_rel = 10.0 ** (-DECADES)

    t0 = time.time()
    it_j, rel = pcg(apply_A, lambda rs: [r / d for r, d in zip(rs, diags)],
                    b, tol_rel)
    log(f"jacobi      : {it_j:5d} iters (rel {rel:.2e}, "
        f"{time.time() - t0:.1f}s host)")

    cols = basis_const_linear(shapes)
    M, k = make_dense_coarse_precond(apply_A, diags, cols)
    t0 = time.time()
    it, rel = pcg(apply_A, M, b, tol_rel)
    log(f"cl{k:<10d}: {it:5d} iters ({it_j / max(it, 1):.2f}x; "
        f"rel {rel:.2e}, {time.time() - t0:.1f}s host)")

    stale_ops = None
    for s in (16, 8, 4):
        M, k, t_setup = make_agg_precond(apply_A, diags, shapes, s)
        t0 = time.time()
        it, rel = pcg(apply_A, M, b, tol_rel)
        log(f"agg{s:<2d} (k={k:4d}): {it:5d} iters "
            f"({it_j / max(it, 1):.2f}x; rel {rel:.2e}, "
            f"{time.time() - t0:.1f}s host, E setup {t_setup:.1f}s)")
        if s == 8:
            if stale_ops is None:
                sops, stopo = build_system(perturb=0.10)
                stale_ops = make_apply(sops, stopo)
            M, k, _ = make_agg_precond(apply_A, diags, shapes, s,
                                       apply_A_for_E=stale_ops)
            t0 = time.time()
            it, rel = pcg(apply_A, M, b, tol_rel)
            log(f"agg8-stale  : {it:5d} iters ({it_j / max(it, 1):.2f}x; "
                f"rel {rel:.2e}, {time.time() - t0:.1f}s host)")


if __name__ == "__main__":
    main()
