"""Per-solve timing breakdown of the res-56 flagship on the TPU.

Times the actual components of one PISO substep on captured production
operators (developed bench state, batch 64): merged resident pressure solve
(warm-started), BiCGStab advection solve, operator building, and the
CFL-implied substep count — so flagship optimization targets the real
bottleneck instead of end-to-end proxies (the loose-tol probe backfired:
bad pressure degrades the flow and the adaptive CFL eats the savings).

Run (TPU): PYTHONPATH=/root/repo python -u scripts/solve_breakdown.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.core.domain_io import load_domain
from fluidgym_tpu.solver import piso, stencil as st

BATCH = 64
RES = 56


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def main() -> None:
    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=RES, load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    topo, geoms, state = load_domain(
        REPO / "bench_assets" / f"cyl2d_res{RES}_developed", dtype=env._dtype)
    cfg = env._cfg
    nu = state.viscosity

    # CFL-implied substeps for one env step
    step_len = float(cfg.dt) * int(env._n_sim_steps)
    ts, n_sub_dev = jax.jit(lambda s: piso.get_max_time_step(
        s, env._geoms, topo, cfg.dt, cfg.adaptive_cfl))(state)
    n_sub = float(n_sub_dev) * int(env._n_sim_steps)
    out = {"cfl_dt": float(ts), "substeps_per_env_step": n_sub}

    dtv = jnp.asarray(float(ts), env._dtype)

    def build_ops(s):
        adv_ops = st.build_advection_ops(s, env._geoms, topo, nu, dtv)
        vel_rhs = st.advection_rhs_velocity(s, env._geoms, topo, nu, dtv)
        p_ops = st.build_pressure_ops(
            tuple(op.diag for op in adv_ops), env._geoms, topo)
        return adv_ops, vel_rhs, p_ops

    bstate = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), state)
    t_build, (adv_ops, vel_rhs, p_ops) = timed(
        jax.jit(jax.vmap(build_ops)), bstate)
    out["ops_build_ms"] = round(1e3 * t_build, 2)

    def adv_solve(ops, rhs, s):
        x, info = piso._solve(
            ops, rhs, topo, tol=cfg.advection_tol,
            maxiter=cfg.advection_maxiter, symmetric=False, use_bicg=True,
            return_best=False, differentiable=False,
            x0=tuple(blk.velocity for blk in s.blocks))
        return x, info.converged

    t_adv, (_x, conv) = timed(
        jax.jit(jax.vmap(adv_solve, in_axes=(0, 0, 0))),
        adv_ops, vel_rhs, bstate)
    out["advection_solve_ms"] = round(1e3 * t_adv, 2)
    out["advection_converged"] = bool(jnp.all(conv))

    def p_solve(ops, s):
        pressures = tuple(blk.pressure for blk in s.blocks)
        # representative RHS: divergence of the current velocity field
        div = st.divergence_of(
            tuple(blk.velocity for blk in s.blocks), s, env._geoms, topo)
        rhs = tuple(-d for d in div)
        mean = piso._global_mean(rhs)
        rhs = tuple(r - mean for r in rhs)
        x, info = piso._solve(
            ops, rhs, topo, tol=cfg.pressure_tol,
            maxiter=cfg.pressure_maxiter, symmetric=True, use_bicg=False,
            return_best=True, differentiable=False, x0=pressures,
            precondition=True, stall_iters=cfg.pressure_stall_iters)
        return x, info.iterations, info.converged

    t_p, (_xp, iters, conv_p) = timed(
        jax.jit(jax.vmap(p_solve, in_axes=(0, 0))), p_ops, bstate)
    out["pressure_solve_ms"] = round(1e3 * t_p, 2)
    out["pressure_iters_mean"] = round(float(jnp.mean(iters)), 1)
    out["pressure_converged"] = bool(jnp.all(conv_p))

    # one full env step for scale
    env._state = state
    carry = env._pure_carry()
    fn = jax.jit(jax.vmap(env._pure_step))
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    a0 = jnp.zeros((BATCH, 1), jnp.float32)
    t_step, _ = timed(fn, bcarry, a0, n=3)
    out["env_step_ms"] = round(1e3 * t_step, 2)
    out["est_pressure_share"] = round(
        n_sub * cfg.corrector_steps * t_p / t_step, 3)
    out["est_advection_share"] = round(n_sub * t_adv / t_step, 3)
    out["est_build_share"] = round(n_sub * t_build / t_step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
