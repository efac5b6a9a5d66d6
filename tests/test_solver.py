"""Solver golden tests: projection, Taylor-Green decay, diffusion, advection,
and gradient checks.  These replace the reference's CUDA-oracle comparisons
(SURVEY.md section 4) with analytic solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import BCType, DomainBuilder
from fluidgym_tpu.solver import stencil as st
from fluidgym_tpu.solver.piso import (
    ADAPTIVE,
    SimConfig,
    make_divergence_free,
    piso_fixed_steps,
    piso_substep,
    single_step,
)


def _periodic_box(n=32, L=2 * np.pi, nu=0.01, scalar=0):
    dom = DomainBuilder(ndims=2, viscosity=nu, scalar_channels=scalar)
    coords = geo.make_uniform_grid((n, n), (0.0, 0.0), (L, L))
    dom.create_block(coords)
    return dom


def _taylor_green(n=32, L=2 * np.pi):
    x = (np.arange(n) + 0.5) / n * L
    X, Y = np.meshgrid(x, x, indexing="xy")  # arrays [y, x]
    u = np.sin(X) * np.cos(Y)
    v = -np.cos(X) * np.sin(Y)
    return np.stack([u, v], axis=0)


def test_projection_divergence_free():
    """Projection of a smooth compressible field drives the (central-difference)
    divergence to near zero under repeated application.  Note: like the
    reference's FD velocity corrector (kernel.cu PISO_update_velocity), the
    collocated scheme cannot remove grid-Nyquist divergence modes, so the test
    field is smooth (low wavenumbers)."""
    n = 24
    dom = _periodic_box(n=n)
    blk = dom._blocks[0]
    x = (np.arange(n) + 0.5) / n * 2 * np.pi
    X, Y = np.meshgrid(x, x, indexing="xy")
    u = np.sin(X) * np.cos(2 * Y) + 0.3 * np.cos(X + Y)
    v = np.cos(2 * X) * np.sin(Y) + 0.2 * np.sin(X - 2 * Y)
    blk.set_velocity(np.stack([u, v]))
    topo, geoms, state = dom.build()
    cfg = SimConfig(pressure_tol=1e-8)
    proj = jax.jit(
        lambda s: make_divergence_free(s, geoms, topo, cfg, iterations=1,
                                       maxiter=2000)
    )
    div0 = float(jnp.max(jnp.abs(
        st.velocity_divergence(state, geoms, topo)[0])))
    for _ in range(4):
        state = proj(state)
    div4 = float(jnp.max(jnp.abs(
        st.velocity_divergence(state, geoms, topo)[0])))
    assert div4 < 1e-3 * div0


def test_taylor_green_decay():
    n, L, nu = 48, 2 * np.pi, 0.02
    dom = _periodic_box(n=n, L=L, nu=nu)
    dom._blocks[0].set_velocity(_taylor_green(n, L))
    topo, geoms, state = dom.build()
    cfg = SimConfig(pressure_tol=1e-7, advection_tol=1e-7)
    dt = 0.05
    steps = 40
    t_final = dt * steps
    e0 = float(jnp.mean(state.blocks[0].velocity ** 2))
    state2 = jax.jit(
        lambda s: piso_fixed_steps(s, geoms, topo, cfg, jnp.asarray(dt, jnp.float32),
                                   steps)
    )(state)
    e1 = float(jnp.mean(state2.blocks[0].velocity ** 2))
    expected = e0 * np.exp(-4 * nu * t_final)
    # implicit Euler is dissipative; expect decay within ~10% of analytic
    assert e1 < e0
    assert abs(e1 - expected) / expected < 0.1
    # velocity field stays divergence-free
    div = st.velocity_divergence(state2, geoms, topo)[0]
    assert float(jnp.max(jnp.abs(div))) < 1e-3


def test_scalar_diffusion_steady_profile():
    """Dirichlet plates at T=1 (bottom) / 0 (top), no flow, kappa large:
    temperature relaxes to the linear conduction profile."""
    n = 16
    dom = DomainBuilder(ndims=2, viscosity=1.0, scalar_channels=1)
    coords = geo.make_uniform_grid((n, n), (0.0, 0.0), (1.0, 1.0))
    blk = dom.create_block(coords)
    dom.set_scalar_diffusivity(0.5)
    blk.close_boundary("-y", scalar=1.0)
    blk.close_boundary("+y", scalar=0.0)
    blk.set_scalar(np.full((1, n, n), 0.5))
    topo, geoms, state = dom.build()
    cfg = SimConfig(advection_tol=1e-8, pressure_tol=1e-7)
    state = jax.jit(
        lambda s: piso_fixed_steps(s, geoms, topo, cfg, jnp.asarray(0.1, jnp.float32), 100)
    )(state)
    T = np.asarray(state.blocks[0].scalar[0])
    y_centers = (np.arange(n) + 0.5) / n
    expected = 1.0 - y_centers
    assert np.allclose(T.mean(axis=1), expected, atol=2e-2)


def test_scalar_advection_translation():
    """Uniform velocity transports a scalar bump at the right speed."""
    n, L = 64, 1.0
    dom = DomainBuilder(ndims=2, viscosity=1e-6, scalar_channels=1)
    coords = geo.make_uniform_grid((n, n), (0.0, 0.0), (L, L))
    blk = dom.create_block(coords)
    dom.set_scalar_diffusivity(1e-6)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="xy")
    T0 = np.exp(-((X - 0.3) ** 2 + (Y - 0.5) ** 2) / (2 * 0.05**2))
    blk.set_scalar(T0[None])
    blk.set_velocity(np.stack([np.ones((n, n)), np.zeros((n, n))]))
    topo, geoms, state = dom.build()
    cfg = SimConfig(advection_tol=1e-8, pressure_tol=1e-7, corrector_steps=0,
                    advect_passive_scalar=True)
    # advect for t=0.2 -> bump moves 0.2 in x
    state = jax.jit(
        lambda s: piso_fixed_steps(s, geoms, topo, cfg, jnp.asarray(0.005, jnp.float32), 40)
    )(state)
    T = np.asarray(state.blocks[0].scalar[0])
    com_x = (T * X).sum() / T.sum()
    assert abs(com_x - 0.5) < 0.02


def test_adaptive_step_advances_time():
    n = 16
    dom = _periodic_box(n=n)
    dom._blocks[0].set_velocity(_taylor_green(n))
    topo, geoms, state = dom.build()
    cfg = SimConfig(dt=0.2, substeps=ADAPTIVE, adaptive_cfl=0.3,
                    pressure_tol=1e-6)
    out = jax.jit(
        lambda s: single_step(s, geoms, topo, cfg)
    )(state)
    # energy decayed (sim ran) and no NaNs
    assert np.isfinite(np.asarray(out.blocks[0].velocity)).all()
    assert float(jnp.mean(out.blocks[0].velocity ** 2)) < float(
        jnp.mean(state.blocks[0].velocity ** 2)
    )


def test_gradient_through_step_finite_difference():
    """d(loss)/d(u0) through a full PISO step matches finite differences --
    the reference pins gradients the same way
    (tests/simulation/test_torch_resample.py:141-180)."""
    n = 12
    dom = _periodic_box(n=n, nu=0.05)
    dom._blocks[0].set_velocity(_taylor_green(n) * 0.5)
    topo, geoms, state = dom.build()
    cfg = SimConfig(pressure_tol=1e-8, advection_tol=1e-8)
    dt = jnp.asarray(0.05, jnp.float32)

    def loss(vel0):
        from dataclasses import replace

        s = state.replace_block(0, replace(state.blocks[0], velocity=vel0))
        s = piso_substep(s, geoms, topo, cfg, dt)
        return jnp.sum(s.blocks[0].velocity ** 2)

    v0 = state.blocks[0].velocity
    loss = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(v0)
    assert np.isfinite(np.asarray(g)).all()

    rng = np.random.default_rng(0)
    direction = jnp.asarray(rng.normal(size=v0.shape), v0.dtype)
    eps = 1e-2
    f_plus = float(loss(v0 + eps * direction))
    f_minus = float(loss(v0 - eps * direction))
    fd = (f_plus - f_minus) / (2 * eps)
    analytic = float(jnp.vdot(g, direction))
    assert abs(fd - analytic) / (abs(fd) + 1e-6) < 5e-2


def test_advect_static_scalar_only():
    """advect_static advances the scalar with velocity frozen
    (reference Simulation.advect_static, PISOtorch_simulation.py:1184)."""
    import fluidgym_tpu
    from fluidgym_tpu.solver.piso import advect_static

    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=3,
        step_length=0.1, dt=0.05, local_obs_window=3)
    env.reset(seed=0)
    s0 = env._state
    s1 = jax.jit(lambda s: advect_static(
        s, env._geoms, env._topo, env._cfg, 0.05, iterations=2))(s0)
    # velocity and pressure untouched; scalar advanced and finite
    np.testing.assert_array_equal(np.asarray(s1.blocks[0].velocity),
                                  np.asarray(s0.blocks[0].velocity))
    np.testing.assert_array_equal(np.asarray(s1.blocks[0].pressure),
                                  np.asarray(s0.blocks[0].pressure))
    d = np.abs(np.asarray(s1.blocks[0].scalar) - np.asarray(s0.blocks[0].scalar))
    assert d.max() > 1e-6
    assert np.isfinite(np.asarray(s1.blocks[0].scalar)).all()


def test_get_max_time_step():
    import fluidgym_tpu
    from fluidgym_tpu.solver.piso import get_max_time_step

    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=3,
        step_length=0.1, dt=0.05, local_obs_window=3)
    env.reset(seed=0)
    ts, ss = get_max_time_step(env._state, env._geoms, env._topo, 0.5, cfl=0.1)
    ts, ss = float(ts), int(ss)
    assert ss >= 1 and ts > 0
    np.testing.assert_allclose(ts * ss, 0.5, rtol=1e-5)


def test_coarse_preconditioner_same_solution_fewer_iters():
    """Additive Jacobi+coarse preconditioning must not change the solution
    and should cut iterations on a cold Poisson solve."""
    import fluidgym_tpu
    from fluidgym_tpu.solver import linsolve
    from fluidgym_tpu.solver import stencil as st_mod
    from fluidgym_tpu.solver.piso import _make_coarse_solver

    # two connected wall-bounded blocks: the per-block constant modes are
    # exactly the slow coarse space the deflation targets (on periodic
    # domains the basis is intentionally reduced and may not help)
    dom = DomainBuilder(ndims=2, viscosity=1e-3)
    g1 = geo.make_wall_refined_ortho_grid(
        16, 16, corner_lower=(0, 0), corner_upper=(1, 1),
        wall_refinement=(), base=1.0)
    g2 = geo.make_wall_refined_ortho_grid(
        16, 16, corner_lower=(1, 0), corner_upper=(2, 1),
        wall_refinement=(), base=1.0)
    b1 = dom.create_block(g1)
    b2 = dom.create_block(g2)
    dom.connect_blocks(0, "+x", 1, "-x")
    b1.close_boundary("-x"); b1.close_boundary("-y"); b1.close_boundary("+y")
    b2.close_boundary("+x"); b2.close_boundary("-y"); b2.close_boundary("+y")
    rng0 = np.random.default_rng(7)
    b1.set_velocity(rng0.normal(size=(2, 16, 16)) * 0.1)
    b2.set_velocity(rng0.normal(size=(2, 16, 16)) * 0.1)
    topo, geoms, s = dom.build()

    adiags = tuple(jnp.ones_like(g.det) for g in geoms)
    p_ops = st_mod.build_pressure_ops(adiags, geoms, topo)
    div = st_mod.divergence_of(
        tuple(b.velocity for b in s.blocks), s, geoms, topo)
    rhs = tuple(-d for d in div)
    mean = sum(jnp.sum(r) for r in rhs) / sum(r.size for r in rhs)
    rhs = tuple(r - mean for r in rhs)

    inv_diag = tuple(1.0 / op.diag for op in p_ops)
    coarse = _make_coarse_solver(p_ops, topo, jnp.float32)

    def jac(rs):
        return tuple(d * r for d, r in zip(inv_diag, rs))

    def jac_coarse(rs):
        cg = coarse(rs)
        return tuple(d * r + c for d, r, c in zip(inv_diag, rs, cg))

    def mv(xs):
        return st_mod.domain_apply(p_ops, xs, topo)

    x1, i1 = linsolve.cg(mv, rhs, tol=5e-6, maxiter=2000, precond=jac)
    x2, i2 = linsolve.cg(mv, rhs, tol=5e-6, maxiter=2000, precond=jac_coarse)
    assert bool(i1.converged) and bool(i2.converged)
    assert int(i2.iterations) <= int(i1.iterations)
    # same solution up to the nullspace constant
    d0 = np.asarray(x1[0]) - np.asarray(x2[0])
    assert np.abs(d0 - d0.mean()).max() < 5e-4


def test_pressure_extrapolation_matches_physics():
    """Extrapolated warm starts (SimConfig.pressure_extrapolate) change only
    solver trajectories, not converged physics, in both modes -- and the
    differentiable path still yields finite gradients through the new scan
    carries."""
    import dataclasses

    import fluidgym_tpu
    from fluidgym_tpu.solver import piso

    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4, episode_length=3,
        step_length=0.1, dt=0.05, load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    state, geoms, topo = env._state, env._geoms, env._topo
    base_cfg = dataclasses.replace(env._cfg, substeps=1, differentiable=False)

    outs = {}
    for extrap in (False, True):
        cfg = dataclasses.replace(base_cfg, pressure_extrapolate=extrap)
        s, info = piso.piso_fixed_steps_info(
            state, geoms, topo, cfg, jnp.asarray(0.05, jnp.float32), 4)
        assert bool(info.pressure_converged), info
        outs[extrap] = s
    for b in range(len(topo.blocks)):
        np.testing.assert_allclose(
            np.asarray(outs[True].blocks[b].velocity),
            np.asarray(outs[False].blocks[b].velocity), atol=5e-4)

    # differentiable mode: adaptive masked scan with the extrapolation carry
    cfg_d = dataclasses.replace(env._cfg, differentiable=True,
                                pressure_extrapolate=True)

    def loss(scale):
        s0 = jax.tree.map(lambda a: a, state)
        s0 = s0.replace_block(0, dataclasses.replace(
            s0.blocks[0], velocity=s0.blocks[0].velocity * scale))
        s1 = piso.piso_adaptive_step(
            s0, geoms, topo, cfg_d, jnp.asarray(0.05, jnp.float32))
        return sum(jnp.sum(b.velocity ** 2) for b in s1.blocks)

    g = jax.grad(loss)(jnp.asarray(1.0, jnp.float32))
    assert np.isfinite(float(g)) and float(g) != 0.0
