"""Profile the cylinder env substep on TPU: iteration counts + time split.

Develops the flow like bench.py, then dissects one PISO substep at developed
flow: advection solve iterations, pressure solve iterations per corrector,
and wall time per phase.  Writes progress to stdout line-buffered.
"""

import functools
import time

import jax
import jax.numpy as jnp


import fluidgym_tpu
from fluidgym_tpu.solver import linsolve, nonortho, piso
from fluidgym_tpu.solver import stencil as st

ENV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=10**9,
)


def main():
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", step_length=0.05, **ENV_KW)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    t0 = time.time()
    for i in range(100):
        state, *_ = fn(state, action)
    jax.block_until_ready(state)
    print(f"developed flow to t=5 in {time.time()-t0:.1f}s", flush=True)

    dstate = state[0]
    geoms, topo, cfg, hooks = env._geoms, env._topo, env._cfg, env._hooks
    print("cfg:", cfg, flush=True)

    # one substep, instrumented
    dt_full = jnp.asarray(cfg.dt, jnp.float32)

    @jax.jit
    def cfl_ts(s):
        max_vel = st.max_computational_velocity(s, geoms, topo)
        max_ts = cfg.adaptive_cfl / jnp.maximum(max_vel, 1e-30)
        n = jnp.maximum(jnp.ceil(dt_full / max_ts), 1.0)
        return dt_full / n, n

    ts, nsub = cfl_ts(dstate)
    print(f"CFL substep ts={float(ts):.5f} nsub_per_dt={float(nsub)} "
          f"(dt={cfg.dt}, env step_length=0.05)", flush=True)

    s = piso._run_hooks(hooks, "PRE", dstate, time_step=ts)

    # velocity prediction
    nu = s.viscosity
    t0 = time.time()

    @jax.jit
    def build_adv(s, ts):
        adv_ops = st.build_advection_ops(s, geoms, topo, nu, ts)
        vel_rhs = st.advection_rhs_velocity(s, geoms, topo, nu, ts)
        if cfg.non_orthogonal:
            nus = tuple(jnp.full_like(g.det, 1.0) * nu for g in geoms)
            adv_ops = nonortho.apply_matrix_terms(
                adv_ops, geoms, topo, nus, det_divide=True, field="velocity")
            S_comps = []
            for d in range(topo.ndims):
                S_comps.append(nonortho.deferred_rhs(
                    tuple(blk.velocity[d] for blk in s.blocks), geoms, topo,
                    nus, field="velocity",
                    bval_fn=lambda b, f, _d=d: s.blocks[b].faces[f].velocity[_d],
                    boundary_visc=nu))
            vel_rhs = tuple(
                vel_rhs[b] - jnp.stack([S_comps[d][b] for d in range(topo.ndims)], 0)
                / geoms[b].det for b in range(len(topo.blocks)))
        return adv_ops, vel_rhs

    adv_ops, vel_rhs = jax.block_until_ready(build_adv(s, ts))
    t_build = time.time() - t0

    def mv(ops):
        return lambda xs: st.domain_apply(ops, xs, topo)

    @jax.jit
    def vel_solve(adv_ops, vel_rhs, x0):
        return linsolve.bicgstab(mv(adv_ops), vel_rhs, x0=x0,
                                 tol=cfg.advection_tol,
                                 maxiter=cfg.advection_maxiter)

    x0 = tuple(blk.velocity for blk in s.blocks)
    u_star, vinfo = jax.block_until_ready(vel_solve(adv_ops, vel_rhs, x0))
    t0 = time.time()
    u_star, vinfo = jax.block_until_ready(vel_solve(adv_ops, vel_rhs, x0))
    t_vel = time.time() - t0
    print(f"velocity solve: iters={int(vinfo.iterations)} "
          f"res={float(vinfo.residual):.2e} time={t_vel*1e3:.1f}ms "
          f"(build {t_build*1e3:.1f}ms, warm-started)", flush=True)

    # pressure correctors
    adiags = tuple(op.diag for op in adv_ops)

    @jax.jit
    def build_p(s, u_star, ts):
        p_ops = st.build_pressure_ops(adiags, geoms, topo)
        inv_a = tuple(1.0 / a for a in adiags)
        hbyA = st.pressure_rhs_vec(s, geoms, topo, adv_ops, u_star, nu, ts)
        div = st.divergence_of(hbyA, s, geoms, topo)
        pressures = tuple(blk.pressure for blk in s.blocks)
        if cfg.non_orthogonal:
            Sp = nonortho.deferred_rhs_flux(pressures, geoms, topo, inv_a)
            div = tuple(d + sp for d, sp in zip(div, Sp))
        rhs_p = tuple(-d for d in div)
        rhs_mean = piso._global_mean(rhs_p)
        rhs_p = tuple(r - rhs_mean for r in rhs_p)
        return p_ops, rhs_p, hbyA

    p_ops, rhs_p, hbyA = jax.block_until_ready(build_p(s, u_star, ts))

    inv_diag = tuple(1.0 / op.diag for op in p_ops)

    def precond(rs):
        return tuple(d * r for d, r in zip(inv_diag, rs))

    @jax.jit
    def p_solve(p_ops, rhs_p, x0):
        return linsolve.cg(mv(p_ops), rhs_p, x0=x0, tol=cfg.pressure_tol,
                           maxiter=cfg.pressure_maxiter,
                           return_best=cfg.pressure_return_best_result,
                           precond=precond)

    p, pinfo = jax.block_until_ready(p_solve(p_ops, rhs_p, None))
    t0 = time.time()
    p, pinfo = jax.block_until_ready(p_solve(p_ops, rhs_p, None))
    t_p = time.time() - t0
    print(f"pressure solve (cold): iters={int(pinfo.iterations)} "
          f"res={float(pinfo.residual):.2e} time={t_p*1e3:.1f}ms "
          f"tol={cfg.pressure_tol}", flush=True)

    # warm start from previous pressure (for comparison)
    x0p = tuple(blk.pressure for blk in s.blocks)
    p2, pinfo2 = jax.block_until_ready(p_solve(p_ops, rhs_p, x0p))
    print(f"pressure solve (warm from prev p): iters={int(pinfo2.iterations)} "
          f"res={float(pinfo2.residual):.2e}", flush=True)

    # deflation start
    x0_fn = piso._make_deflation_x0(p_ops, topo, jnp.float32)

    @jax.jit
    def p_solve_defl(p_ops, rhs_p):
        return linsolve.cg(mv(p_ops), rhs_p, x0=x0_fn(rhs_p),
                           tol=cfg.pressure_tol, maxiter=cfg.pressure_maxiter,
                           precond=precond)

    p3, pinfo3 = jax.block_until_ready(p_solve_defl(p_ops, rhs_p))
    t0 = time.time()
    p3, pinfo3 = jax.block_until_ready(p_solve_defl(p_ops, rhs_p))
    t_p3 = time.time() - t0
    print(f"pressure solve (deflated): iters={int(pinfo3.iterations)} "
          f"res={float(pinfo3.residual):.2e} time={t_p3*1e3:.1f}ms", flush=True)

    # timing of a full env step for reference
    envf = fluidgym_tpu.make("CylinderJet2D-easy-v0", **ENV_KW)
    envf.reset(seed=0)
    fnf = jax.jit(envf._pure_step)
    st2 = (dstate, state[1])
    st2, *_ = fnf(st2, action)
    jax.block_until_ready(st2)
    t0 = time.time()
    for _ in range(5):
        st2, *_ = fnf(st2, action)
    jax.block_until_ready(st2)
    print(f"full env step (0.25): {(time.time()-t0)/5*1e3:.0f}ms", flush=True)

    # matvec cost
    xs = tuple(blk.pressure for blk in s.blocks)
    mv_p = jax.jit(lambda xs: st.domain_apply(p_ops, xs, topo))
    r = jax.block_until_ready(mv_p(xs))
    t0 = time.time()
    for _ in range(100):
        r = mv_p(r)
    jax.block_until_ready(r)
    print(f"pressure matvec: {(time.time()-t0)/100*1e6:.0f}us", flush=True)
    ncells = sum(int(b.pressure.size) for b in s.blocks)
    print(f"ncells={ncells}", flush=True)


if __name__ == "__main__":
    main()
