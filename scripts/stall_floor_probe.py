"""Probe the fp32 stagnation floor of the airfoil pressure solve and A/B
candidate fixes (VERDICT r2 weak #1 / next #4).

The airfoil runs its pressure solves at tol 1e-7 (airfoil_env_base.py:216)
but round-2 VALIDATION records them ending "by stagnation, not convergence"
with ~250 stall-patience iterations burned per solve.  Candidates:

  A. plain fp32 PCG (status quo) -- measure the floor;
  B. residual-rescaled iterative refinement: restart PCG on the recomputed
     true residual, RESCALED to unit RMS so the inner solve works in fp32's
     sweet spot, accumulating x in double-float (two-sum hi/lo pair);
  C. same but without the double-float accumulation (isolate its effect).

Run CPU (semantics): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ...
Run TPU (timing):    python scripts/stall_floor_probe.py --steps N
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.solver import linsolve
from fluidgym_tpu.solver import stencil as st


def _true_rmse(mv, b, x):
    r = jax.tree.map(lambda bb, ax: bb - ax, b, mv(x))
    rs = sum(jnp.vdot(rr, rr).real for rr in jax.tree.leaves(r))
    n = sum(leaf.size for leaf in jax.tree.leaves(b))
    return jnp.sqrt(rs / n)


def refined_cg(mv, b, *, tol, inner_tol, restarts, maxiter, precond,
               double_float=True):
    """Prototype: outer refinement loop around fp32 PCG."""
    x_hi = jax.tree.map(jnp.zeros_like, b)
    x_lo = jax.tree.map(jnp.zeros_like, b)
    total_iters = 0
    for k in range(restarts):
        # true residual with cancellation-aware ordering
        r = jax.tree.map(lambda bb, a: bb - a, b, mv(x_hi))
        if double_float:
            r = jax.tree.map(lambda rr, a: rr - a, r, mv(x_lo))
        rms = float(_true_rmse(lambda v: jax.tree.map(jnp.zeros_like, v), r,
                               jax.tree.map(jnp.zeros_like, r)))
        if rms <= tol:
            break
        s = 1.0 / max(rms, 1e-30)
        rn = jax.tree.map(lambda rr: rr * s, r)
        d, info = linsolve.cg(mv, rn, tol=inner_tol, maxiter=maxiter,
                              precond=precond, stall_iters=250)
        total_iters += int(info.iterations)
        d = jax.tree.map(lambda dd: dd / s, d)
        if double_float:
            # two-sum: x_hi + d exactly = hi' + err; fold err into x_lo
            def _acc(hi, lo, dd):
                new_hi = hi + dd
                err = (hi - new_hi) + dd        # exact in round-to-nearest
                new_lo = lo + err
                # renormalize occasionally so lo stays small
                h2 = new_hi + new_lo
                l2 = (new_hi - h2) + new_lo
                return h2, l2
            acc = jax.tree.map(_acc, x_hi, x_lo, d)
            x_hi = jax.tree.map(lambda t: t[0], acc,
                                is_leaf=lambda t: isinstance(t, tuple))
            x_lo = jax.tree.map(lambda t: t[1], acc,
                                is_leaf=lambda t: isinstance(t, tuple))
        else:
            x_hi = jax.tree.map(lambda hi, dd: hi + dd, x_hi, d)
    return x_hi, x_lo, total_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="Airfoil2D-easy-v0")
    ap.add_argument("--steps", type=int, default=3,
                    help="env steps to develop the RHS before probing")
    ap.add_argument("--maxiter", type=int, default=1500)
    ap.add_argument("--inner-tol", type=float, default=1e-3)
    ap.add_argument("--restarts", type=int, default=5)
    args = ap.parse_args()

    env = fluidgym_tpu.make(args.env_id, load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False)
    env.reset(seed=0)
    for _ in range(args.steps):
        env.step(env._zero_action)
    state = env._state

    adv_ops = st.build_advection_ops(state, env._geoms, env._topo,
                                     state.viscosity, env._cfg.dt)
    adiags = tuple(op.diag for op in adv_ops)
    ops = st.build_pressure_ops(adiags, env._geoms, env._topo)
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    inv_diag = tuple(1.0 / op.diag for op in ops)

    def precond(rs):
        return tuple(d * r for d, r in zip(inv_diag, rs))

    # a physical RHS at the TRUE problem scale: apply A to the env's actual
    # developed pressure field (in-range by construction for the singular
    # Neumann operator, and carrying the real solution's magnitude and
    # spectrum -- the regime where round-2 VALIDATION records stagnation)
    p_real = tuple(blk.pressure for blk in state.blocks)
    prms = float(np.sqrt(np.mean(
        np.concatenate([np.asarray(p).ravel() for p in p_real]) ** 2)))
    print(f"pressure_rms={prms:.3e}")
    b = mv(p_real)

    brms = float(_true_rmse(lambda v: jax.tree.map(jnp.zeros_like, v), b,
                            jax.tree.map(jnp.zeros_like, b)))
    print(f"system: {sum(x.size for x in b)} cells, b_rms={brms:.3e}")

    tol = 1e-7

    # A: plain PCG
    t0 = time.time()
    xA, infoA = linsolve.cg(mv, b, tol=tol, maxiter=args.maxiter,
                            precond=precond, stall_iters=250)
    rA = float(_true_rmse(mv, b, xA))
    print(f"A plain PCG:     iters={int(infoA.iterations):5d} "
          f"reported={float(infoA.residual):.3e} true_rmse={rA:.3e} "
          f"converged={bool(infoA.converged)} ({time.time()-t0:.1f}s)")

    # B: production linsolve.refined (residual-rescaled restarts +
    # double-float accumulation) around the same inner PCG
    def inner(rhs):
        return linsolve.cg(mv, rhs, tol=args.inner_tol,
                           maxiter=args.maxiter, precond=precond,
                           stall_iters=250)

    t0 = time.time()
    xB, infoB = linsolve.refined(mv, b, inner, tol=tol,
                                 restarts=args.restarts)
    rB = float(_true_rmse(mv, b, xB))
    print(f"B linsolve.refined: iters={int(infoB.iterations):5d} "
          f"reported={float(infoB.residual):.3e} true_rmse={rB:.3e} "
          f"converged={bool(infoB.converged)} ({time.time()-t0:.1f}s)")

    # C: the same refinement WITHOUT double-float accumulation (prototype
    # above) -- isolates the compensated pair's contribution to the floor
    t0 = time.time()
    xC, _lo, itC = refined_cg(mv, b, tol=tol, inner_tol=args.inner_tol,
                              restarts=args.restarts, maxiter=args.maxiter,
                              precond=precond, double_float=False)
    rC = float(_true_rmse(mv, b, xC))
    print(f"C refined fp32-acc: iters={itC:5d} true_rmse={rC:.3e} "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
