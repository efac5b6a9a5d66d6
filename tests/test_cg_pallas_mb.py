"""Merged-frame fused CG (ops/cg_pallas_mb.py) vs the XLA blockwise solver.

CPU runs the kernel in interpret mode: these tests pin SEMANTICS (solution,
convergence metadata, vmap lane folding); TPU lowering is exercised by
scripts/merged_cg_ab.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu
from fluidgym_tpu.ops import cg_pallas_mb as mb
from fluidgym_tpu.solver import block_merge as bm
from fluidgym_tpu.solver import linsolve
from fluidgym_tpu.solver import stencil as st

TOL = 1e-5


@pytest.fixture(scope="module")
def cyl():
    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    plan = bm.merge_plan(env._topo)
    assert plan is not None
    adv_ops = st.build_advection_ops(
        env._state, env._geoms, env._topo, env._state.viscosity, env._cfg.dt)
    adiags = tuple(op.diag for op in adv_ops)
    ops = st.build_pressure_ops(adiags, env._geoms, env._topo)
    return env, plan, ops


def _rhs(topo, seed=0):
    """Manufactured in-range RHS for the singular all-Neumann operator."""
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float32)
                 for bt in topo.blocks)


def _solve_ref(ops, topo, b, tol=TOL):
    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = mv(_rhs(topo, 99)) if b is None else b
    return linsolve.cg(mv, b, tol=tol, maxiter=4000,
                       precond=lambda rs: tuple(
                           r / op.diag for r, op in zip(rs, ops)))


def test_eligibility(cyl):
    env, plan, ops = cyl
    assert mb.fused_cg_mb_eligible(plan, jnp.float32)
    assert not mb.fused_cg_mb_eligible(None, jnp.float32)


def test_merged_kernel_matches_blockwise_solution(cyl):
    env, plan, ops = cyl
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = mv(_rhs(topo, 7))
    x_ref, info_ref = _solve_ref(ops, topo, b)
    assert bool(info_ref.converged)

    mops = bm.pack_ops(plan, ops)
    diags = tuple(m[0] for m in mops)
    offs = tuple(m[1] for m in mops)
    mbs = bm.pack_fields(plan, b)
    xs, info = mb.fused_cg_mb(plan, diags, offs, mbs, tol=TOL,
                              maxiter=4000, interpret=True)
    assert bool(info.converged), info
    x_got = bm.unpack_fields(plan, xs)
    # both solve the same singular system: solutions agree up to a constant
    shift = float(np.asarray(x_got[0]).ravel()[0]
                  - np.asarray(x_ref[0]).ravel()[0])
    for g, r in zip(x_got, x_ref):
        np.testing.assert_allclose(np.asarray(g) - shift, np.asarray(r),
                                   atol=5e-4)
    # the returned iterate truly solves the blockwise system
    res = [np.asarray(bb) - np.asarray(aa)
           for bb, aa in zip(b, mv(x_got))]
    n = sum(a.size for a in res)
    rmse = np.sqrt(sum((a ** 2).sum() for a in res) / n)
    assert rmse <= 2 * TOL, rmse


def test_warm_start_converges_immediately(cyl):
    env, plan, ops = cyl
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = mv(_rhs(topo, 11))
    x_ref, _ = _solve_ref(ops, topo, b)
    mops = bm.pack_ops(plan, ops)
    xs, info = mb.fused_cg_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        bm.pack_fields(plan, b), x0s=bm.pack_fields(plan, x_ref),
        tol=TOL, maxiter=4000, interpret=True)
    assert bool(info.converged)
    assert int(info.iterations) <= 3


def test_vmap_lane_folding_matches_single(cyl):
    env, plan, ops = cyl
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    batch = 3
    bs_list = [mv(_rhs(topo, 20 + i)) for i in range(batch)]
    mops = bm.pack_ops(plan, ops)
    diags = tuple(m[0] for m in mops)
    offs = tuple(m[1] for m in mops)

    def solve_one(mb_fields):
        xs, info = mb.fused_cg_mb(plan, diags, offs, mb_fields, tol=TOL,
                                  maxiter=4000, interpret=True)
        return xs, info.converged, info.iterations

    batched = jax.tree.map(
        lambda *a: jnp.stack(a), *[bm.pack_fields(plan, b) for b in bs_list])
    xs_b, conv_b, _ = jax.vmap(solve_one)(batched)
    assert bool(conv_b.all())
    for i in range(batch):
        xs_1, conv_1, _ = solve_one(bm.pack_fields(plan, bs_list[i]))
        assert bool(conv_1)
        for s in range(len(plan.superblocks)):
            a = np.asarray(xs_b[s][i])
            c = np.asarray(xs_1[s])
            # same singular system: compare up to the constant mode
            np.testing.assert_allclose(a - a.mean(), c - c.mean(), atol=5e-4)


def test_all_zero_rhs_short_circuits(cyl):
    env, plan, ops = cyl
    mops = bm.pack_ops(plan, ops)
    zeros = tuple(jnp.zeros_like(m[0]) for m in mops)
    xs, info = mb.fused_cg_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        zeros, tol=TOL, maxiter=50, interpret=True)
    assert bool(info.converged)
    for x in xs:
        assert not np.asarray(x).any()


def test_piso_solve_routes_through_merged_kernel(cyl):
    """piso._solve dispatches multi-block pressure solves to the merged
    kernel when both gates are on, and matches the XLA path."""
    from fluidgym_tpu.ops import cg_pallas
    from fluidgym_tpu.solver import piso

    env, plan, ops = cyl
    topo = env._topo
    b = st.domain_apply(ops, _rhs(topo, 5), topo)
    kw = dict(tol=TOL, maxiter=3000, symmetric=True, use_bicg=False,
              return_best=True, precondition=True, differentiable=False)
    cg_pallas.set_fused_cg(False)
    mb.set_fused_cg_mb(False)
    try:
        assert piso._fused_cg_mb_plan(ops, topo, None) is None
        x_ref, inf_ref = piso._solve(ops, b, topo, **kw)
        cg_pallas.set_fused_cg(True)
        mb.set_fused_cg_mb(True)
        assert piso._fused_cg_mb_plan(ops, topo, None) is not None
        x_m, inf_m = piso._solve(ops, b, topo, **kw)
    finally:
        cg_pallas.set_fused_cg("auto")
        mb.set_fused_cg_mb("auto")
    assert bool(inf_ref.converged) and bool(inf_m.converged)
    for a, r in zip(x_m, x_ref):
        a, r = np.asarray(a), np.asarray(r)
        np.testing.assert_allclose(a - a.mean(), r - r.mean(), atol=5e-4)


def test_airfoil_merged_kernel_matches_blockwise():
    """C-grid coverage: the reflected wake-cut fixup (flip slab) inside the
    resident kernel reproduces the blockwise CG solution."""
    env = fluidgym_tpu.make(
        "Airfoil2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    topo = env._topo
    plan = bm.merge_plan(topo)
    assert plan is not None and mb.fused_cg_mb_eligible(plan, jnp.float32)
    adv_ops = st.build_advection_ops(
        env._state, env._geoms, topo, env._state.viscosity, env._cfg.dt)
    ops = st.build_pressure_ops(tuple(op.diag for op in adv_ops),
                                env._geoms, topo)

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = mv(_rhs(topo, 31))
    x_ref, info_ref = _solve_ref(ops, topo, b, tol=1e-4)
    mops = bm.pack_ops(plan, ops)
    xs, info = mb.fused_cg_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        bm.pack_fields(plan, b), tol=1e-4, maxiter=4000, interpret=True)
    assert bool(info.converged), info
    x_got = bm.unpack_fields(plan, xs)
    res = [np.asarray(bb) - np.asarray(aa)
           for bb, aa in zip(b, mv(x_got))]
    n = sum(a.size for a in res)
    rmse = np.sqrt(sum((a ** 2).sum() for a in res) / n)
    assert rmse <= 2e-4, rmse


def test_strip_coarse_cuts_iterations_same_solution(cyl):
    """Two-level strip preconditioning (solver/coarse_strips.py) inside the
    kernel: same converged solution, strictly fewer iterations."""
    env, plan, ops = cyl
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    # smooth manufactured solution: the coarse space targets the smooth
    # long-axis error modes (a white-noise RHS is Jacobi territory)
    fields = []
    for bt in topo.blocks:
        H, W = bt.shape
        yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                             indexing="ij")
        fields.append(jnp.asarray(
            np.sin(2 * np.pi * yy) + np.cos(2 * np.pi * xx)
            + 0.5 * np.sin(4 * np.pi * (yy + xx)), jnp.float32))
    b = mv(tuple(fields))
    mops = bm.pack_ops(plan, ops)
    diags = tuple(m[0] for m in mops)
    offs = tuple(m[1] for m in mops)
    mbs = bm.pack_fields(plan, b)
    xs0, i0 = mb.fused_cg_mb(plan, diags, offs, mbs, tol=TOL,
                             maxiter=4000, interpret=True)
    xs1, i1 = mb.fused_cg_mb(plan, diags, offs, mbs, tol=TOL,
                             maxiter=4000, coarse_strips=True,
                             interpret=True)
    assert bool(i0.converged) and bool(i1.converged)
    # measured 264 -> 131 on this setup; assert a robust margin
    assert int(i1.iterations) < 0.75 * int(i0.iterations), (
        int(i0.iterations), int(i1.iterations))
    # different preconditioners land on different iterates of the singular
    # ill-conditioned system (apart by up to kappa*tol); the contract is the
    # TRUE blockwise residual, not iterate equality
    x_got = bm.unpack_fields(plan, xs1)
    res = [np.asarray(bb) - np.asarray(aa) for bb, aa in zip(b, mv(x_got))]
    n = sum(a.size for a in res)
    rmse = np.sqrt(sum((a ** 2).sum() for a in res) / n)
    assert rmse <= 2 * TOL, rmse


def test_strip_coarse_E_matches_brute_force(cyl):
    """assemble_E == restrict(A(prolong(e_j))) columnwise on the real
    cylinder pressure operator."""
    from fluidgym_tpu.solver import coarse_strips as cs

    env, plan, ops = cyl
    mops = bm.pack_ops(plan, ops)
    sp = cs.strip_plan(plan)
    assert sp is not None
    E = np.asarray(cs.assemble_E(plan, sp, mops))

    def mv(ys):
        return bm.merged_apply(plan, mops, ys)

    cols = []
    for j in range(sp.K):
        e = np.zeros(sp.K, np.float32)
        e[j] = 1.0
        cols.append(np.asarray(
            cs.restrict(plan, sp, mv(cs.prolong(plan, sp, jnp.asarray(e))))))
    E_ref = np.stack(cols, 1)
    np.testing.assert_allclose(E, E_ref,
                               atol=1e-4 * np.abs(E_ref).max())


# ---------------------------------------------------------------------------
# merged-frame fused BiCGStab (the non-symmetric advection/scalar systems)
# ---------------------------------------------------------------------------


def _vel_rhs(topo, seed=0, ncomp=2):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(
        rng.standard_normal((ncomp,) + bt.shape), jnp.float32)
        for bt in topo.blocks)


@pytest.fixture(scope="module")
def cyl_adv(cyl):
    """Non-symmetric advection-diffusion operator on the cylinder O-grid."""
    env, plan, _ = cyl
    adv_ops = st.build_advection_ops(
        env._state, env._geoms, env._topo, env._state.viscosity,
        jnp.asarray(0.01, jnp.float32))
    return env, plan, adv_ops


def _pack_comp(plan, fields, ncomp):
    per_c = [bm.pack_fields(plan, tuple(f[c] for f in fields))
             for c in range(ncomp)]
    return tuple(jnp.stack([per_c[c][s] for c in range(ncomp)], axis=0)
                 for s in range(len(plan.superblocks)))


def test_fused_bicgstab_solves_advection_system(cyl_adv):
    env, plan, ops = cyl_adv
    topo = env._topo
    assert mb.fused_bicg_mb_eligible(plan, jnp.float32)

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = _vel_rhs(topo, 3)
    mops = bm.pack_ops(plan, ops)
    xs, info = mb.fused_bicgstab_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        _pack_comp(plan, b, 2), tol=1e-6, maxiter=2000, interpret=True)
    assert bool(info.converged), info
    x_got = tuple(
        jnp.stack([bm.unpack_fields(plan, tuple(x[c] for x in xs))[bi]
                   for c in range(2)], axis=0)
        for bi, x in [(i, xs) for i in range(len(topo.blocks))])
    # the returned iterate solves the ORIGINAL blockwise system per component
    res = [np.asarray(bb) - np.asarray(aa)
           for bb, aa in zip(b, mv(x_got))]
    n_lane = sum(a[0].size for a in res)
    for c in range(2):
        rmse = np.sqrt(sum((a[c] ** 2).sum() for a in res) / n_lane)
        assert rmse <= 3e-6, (c, rmse)


def test_fused_bicgstab_warm_start(cyl_adv):
    env, plan, ops = cyl_adv
    topo = env._topo

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    x_true = _vel_rhs(topo, 5)
    b = mv(x_true)
    mops = bm.pack_ops(plan, ops)
    xs, info = mb.fused_bicgstab_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        _pack_comp(plan, b, 2), x0s=_pack_comp(plan, x_true, 2),
        tol=1e-6, maxiter=2000, interpret=True)
    assert bool(info.converged)
    assert int(info.iterations) <= 3


def test_fused_bicgstab_vmap_folds_batch_and_components(cyl_adv):
    env, plan, ops = cyl_adv
    topo = env._topo
    mops = bm.pack_ops(plan, ops)
    diags = tuple(m[0] for m in mops)
    offs = tuple(m[1] for m in mops)

    batch = 3
    bs_list = [_vel_rhs(topo, 30 + i) for i in range(batch)]

    def solve_one(packed):
        xs, info = mb.fused_bicgstab_mb(
            plan, diags, offs, packed, tol=1e-6, maxiter=2000,
            interpret=True)
        return xs, info.converged

    batched = jax.tree.map(
        lambda *a: jnp.stack(a),
        *[_pack_comp(plan, b, 2) for b in bs_list])
    xs_b, conv_b = jax.vmap(solve_one)(batched)
    assert bool(conv_b.all())
    for i in range(batch):
        xs_1, conv_1 = solve_one(_pack_comp(plan, bs_list[i], 2))
        assert bool(conv_1)
        for s in range(len(plan.superblocks)):
            np.testing.assert_allclose(np.asarray(xs_b[s][i]),
                                       np.asarray(xs_1[s]), atol=2e-4)


def test_fused_bicgstab_env_step_parity(cyl):
    """End-to-end: one env step with the merged BiCGStab routed in
    (interpret mode) matches the XLA-solver step."""
    import fluidgym_tpu

    kw = dict(resolution=16, load_initial_domain=False,
              load_domain_statistics=False, randomize_initial_state=False,
              episode_length=3, step_length=0.02, dt=0.01)

    def run(enabled):
        mb.set_fused_bicg_mb(enabled)
        try:
            env = fluidgym_tpu.make("CylinderJet2D-easy-v0", **kw)
            env.reset(seed=0)
            act = np.zeros(env.action_space.shape, np.float32)
            _, _, _, _, info = env.step(act)
            return float(np.asarray(info["drag"]).mean())
        finally:
            mb.set_fused_bicg_mb(False)

    d_off = run(False)
    d_on = run(True)
    assert np.isfinite(d_on)
    np.testing.assert_allclose(d_on, d_off, rtol=2e-3)


def test_fused_bicgstab_single_block_trivial_plan():
    """block_merge.trivial_plan lets the merged BiCGStab serve single-block
    topologies (RBC/TCF advection): solve a non-symmetric system on a
    closed single block and check against linsolve.bicgstab."""
    from fluidgym_tpu.core import geometry as geo
    from fluidgym_tpu.core.domain import DomainBuilder
    from fluidgym_tpu.solver import linsolve

    n = 24
    dom = DomainBuilder(ndims=2, viscosity=0.02)
    blk = dom.create_block(geo.make_uniform_grid((n, n), (0, 0), (1.0, 1.0)))
    for f in range(4):
        blk.close_boundary(f)
    rng = np.random.default_rng(2)
    blk.set_velocity(0.3 * rng.standard_normal((2, n, n)).astype(np.float32))
    topo, geoms, state = dom.build()
    plan = bm.trivial_plan(topo)
    assert plan is not None and len(plan.superblocks) == 1
    ops = st.build_advection_ops(state, geoms, topo, state.viscosity,
                                 jnp.asarray(0.05, jnp.float32))

    def mv(xs):
        return st.domain_apply(ops, xs, topo)

    b = _vel_rhs(topo, 8)
    mops = bm.pack_ops(plan, ops)
    xs, info = mb.fused_bicgstab_mb(
        plan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        _pack_comp(plan, b, 2), tol=1e-6, maxiter=2000, interpret=True)
    assert bool(info.converged), info
    x_got = tuple(
        jnp.stack([bm.unpack_fields(plan, tuple(x[c] for x in xs))[0]
                   for c in range(2)], axis=0)
        for x in [xs])
    res = [np.asarray(bb) - np.asarray(aa)
           for bb, aa in zip(b, mv(x_got))]
    n_lane = res[0][0].size
    for c in range(2):
        rmse = np.sqrt(sum((a[c] ** 2).sum() for a in res) / n_lane)
        assert rmse <= 3e-6, (c, rmse)


def test_fused_bicgstab_differentiable_path(cyl_adv):
    """Under lax.custom_linear_solve the kernel is a black-box FORWARD
    solver: solutions and implicit-function gradients must match the XLA
    path (the transposed solve stays XLA either way)."""
    from fluidgym_tpu.solver import piso

    env, plan, ops = cyl_adv
    topo = env._topo
    b = _vel_rhs(topo, 44)

    def solve_sum(bb, enabled):
        mb.set_fused_bicg_mb(enabled)
        try:
            x, _ = piso._solve(ops, bb, topo, tol=1e-6, maxiter=2000,
                               symmetric=False, use_bicg=True,
                               return_best=True, differentiable=True)
        finally:
            mb.set_fused_bicg_mb(False)
        return sum(jnp.sum(xx * (1.0 + 0.1 * i))
                   for i, xx in enumerate(x))

    v_off, g_off = jax.value_and_grad(lambda bb: solve_sum(bb, False))(b)
    v_on, g_on = jax.value_and_grad(lambda bb: solve_sum(bb, True))(b)
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=0, atol=1e-4)
