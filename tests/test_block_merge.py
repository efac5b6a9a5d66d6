"""Topology canonicalization (solver/block_merge.py): the merged operator
must be an exact permutation of the multi-block operator.

The plan itself is numerically self-checked at build time on random
coefficients (merge_plan returns None on any mismatch), so these tests
assert (a) the expected topologies DO merge, (b) pack/unpack is a lossless
permutation, (c) the jnp merged_apply path matches stencil.domain_apply on
real pressure operators, and (d) a CG solve through the merged frame
reproduces the multi-block CG solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu
from fluidgym_tpu.solver import block_merge as bm
from fluidgym_tpu.solver import linsolve
from fluidgym_tpu.solver import stencil as st


@pytest.fixture(scope="module")
def cyl_env():
    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    return env


@pytest.fixture(scope="module")
def cyl_plan(cyl_env):
    plan = bm.merge_plan(cyl_env._topo)
    assert plan is not None
    return plan


def test_cylinder_2d_merges_to_annulus_plus_wake(cyl_env, cyl_plan):
    assert len(cyl_plan.superblocks) == 2
    sizes = sorted(len(sb.members) for sb in cyl_plan.superblocks)
    assert sizes == [1, 4]  # wake + 4-block ring
    assert cyl_plan.identity_seams
    # the ring closure is realized by the roll wrap, not a fixup
    assert len(cyl_plan.fixups) == 2  # one per seam side (annulus<->wake)


def test_single_block_topologies_do_not_merge():
    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    assert bm.merge_plan(env._topo) is None


def test_pack_unpack_roundtrip(cyl_env, cyl_plan):
    topo = cyl_env._topo
    rng = np.random.default_rng(1)
    xs = tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float32)
               for bt in topo.blocks)
    ys = bm.pack_fields(cyl_plan, xs)
    back = bm.unpack_fields(cyl_plan, ys)
    for a, b in zip(xs, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the merge is a permutation: every cell appears exactly once
    assert sum(int(np.prod(y.shape)) for y in ys) == sum(
        int(np.prod(x.shape)) for x in xs)


def _pressure_ops(env):
    adv_ops = st.build_advection_ops(
        env._state, env._geoms, env._topo, env._state.viscosity, env._cfg.dt)
    adiags = tuple(op.diag for op in adv_ops)
    return st.build_pressure_ops(adiags, env._geoms, env._topo)


def test_merged_apply_matches_domain_apply_on_pressure_ops(cyl_env, cyl_plan):
    """Real pressure operator (nonzero CONNECTED coefficients at every seam),
    random input: merged roll+fixup apply == reference halo-exchange apply."""
    env = cyl_env
    ops = _pressure_ops(env)
    rng = np.random.default_rng(2)
    xs = tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float32)
               for bt in env._topo.blocks)
    want = st.domain_apply(ops, xs, env._topo)
    mops = bm.pack_ops(cyl_plan, ops)
    got = bm.unpack_fields(
        cyl_plan, bm.merged_apply(cyl_plan, mops, bm.pack_fields(cyl_plan, xs)))
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-6, atol=2e-6)


def test_cg_through_merged_frame_matches_blockwise_cg(cyl_env, cyl_plan):
    """fp64 so unpreconditioned CG actually converges on a random RHS
    (fp32 stalls near 3e-3); the merged system is P A P^T, so the unpacked
    merged solution must solve the ORIGINAL blockwise system to the same
    residual."""
    env = cyl_env
    topo = env._topo
    with jax.enable_x64(True):
        ops = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                           _pressure_ops(env))
        def mv_blocks(xs):
            return st.domain_apply(ops, xs, topo)

        # manufactured RHS b = A x_true: guaranteed in range(A) even though
        # the all-Neumann pressure matrix is singular
        rng = np.random.default_rng(3)
        x_true = tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float64)
                       for bt in topo.blocks)
        b = mv_blocks(x_true)
        ncell = sum(a.size for a in b)

        mops = bm.pack_ops(cyl_plan, ops)
        mb = bm.pack_fields(cyl_plan, b)

        def mv_merged(ys):
            return bm.merged_apply(cyl_plan, mops, ys)

        tol = 1e-7
        y, info_m = linsolve.cg(mv_merged, mb, tol=tol, maxiter=30000)
        assert bool(info_m.converged), info_m
        x_m = bm.unpack_fields(cyl_plan, y)
        r = [np.asarray(bi) - np.asarray(ai)
             for bi, ai in zip(b, mv_blocks(x_m))]
        rmse = np.sqrt(sum((a ** 2).sum() for a in r) / ncell)
        assert rmse <= 2 * tol, rmse


def test_cylinder_3d_merges():
    env = fluidgym_tpu.make(
        "CylinderJet3D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False,
        resolution=8)
    env.reset(seed=0)
    plan = bm.merge_plan(env._topo)
    assert plan is not None and plan.identity_seams
    assert len(plan.superblocks) == 2


@pytest.fixture(scope="module")
def airfoil_env():
    env = fluidgym_tpu.make(
        "Airfoil2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    return env


def test_airfoil_c_grid_merges_with_reflected_cut(airfoil_env):
    """The 6-block C-grid canonicalizes to strip + upper + lower halves;
    the wake cut survives as a same-parity reflected seam (flip on the
    tangential axis)."""
    plan = bm.merge_plan(airfoil_env._topo)
    assert plan is not None
    assert len(plan.superblocks) == 3
    assert not plan.identity_seams
    cut = [f for f in plan.fixups if any(f.flip)]
    assert len(cut) == 2  # one per side of the wake cut
    for f in cut:
        assert f.sb != f.src_sb and f.face == f.src_face  # same-parity


def test_airfoil_merged_apply_matches_domain_apply(airfoil_env):
    env = airfoil_env
    plan = bm.merge_plan(env._topo)
    ops = _pressure_ops(env)
    rng = np.random.default_rng(4)
    xs = tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float32)
               for bt in env._topo.blocks)
    want = st.domain_apply(ops, xs, env._topo)
    mops = bm.pack_ops(plan, ops)
    got = bm.unpack_fields(
        plan, bm.merged_apply(plan, mops, bm.pack_fields(plan, xs)))
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_solve_merged_xla_path_matches_blockwise(airfoil_env):
    """piso._solve with merged-XLA routing enabled must solve the SAME
    system as the blockwise path on the flip-seam C-grid (the topology the
    resident kernels decline): converged, residual at tol, and the unpacked
    solution satisfies the BLOCK-frame operator."""
    from fluidgym_tpu.solver import piso

    env = airfoil_env
    topo = env._topo
    ops = _pressure_ops(env)
    rng = np.random.default_rng(7)
    x_true = tuple(jnp.asarray(rng.standard_normal(bt.shape), jnp.float32)
                   for bt in topo.blocks)
    b = st.domain_apply(ops, x_true, topo)  # in range(A)
    ncell = sum(a.size for a in b)
    kw = dict(tol=3e-5, maxiter=4000, symmetric=True, use_bicg=False,
              return_best=True, differentiable=False, precondition=True)

    x_ref, info_ref = piso._solve(ops, b, topo, **kw)
    assert bool(info_ref.converged)

    bm.set_merged_xla_solves(True)
    try:
        assert piso._merged_xla_plan(ops, topo) is not None
        x_m, info_m = piso._solve(ops, b, topo, **kw)
    finally:
        bm.set_merged_xla_solves(False)
    assert bool(info_m.converged)
    # the merge is an exact permutation: iterates match up to fp reduction
    # ordering, so iteration counts agree closely
    assert abs(int(info_m.iterations) - int(info_ref.iterations)) <= 5, (
        int(info_m.iterations), int(info_ref.iterations))
    r = [np.asarray(bi) - np.asarray(ai)
         for bi, ai in zip(b, st.domain_apply(ops, x_m, topo))]
    rmse = np.sqrt(sum((a ** 2).sum() for a in r) / ncell)
    assert rmse <= 2 * kw["tol"], rmse


def test_solve_merged_xla_bicgstab_with_channels(airfoil_env):
    """The merged-XLA BiCGStab path carries joint velocity solves (leading
    component axis) by vmapping the merged matvec over components."""
    from fluidgym_tpu.solver import piso

    env = airfoil_env
    topo = env._topo
    ops = _pressure_ops(env)  # SPD is fine for BiCGStab
    rng = np.random.default_rng(8)
    x_true = tuple(
        jnp.asarray(rng.standard_normal((2,) + bt.shape), jnp.float32)
        for bt in topo.blocks)
    b = tuple(
        jnp.stack([st.domain_apply(ops, tuple(x[c] for x in x_true),
                                   topo)[bi] for c in range(2)], axis=0)
        for bi in range(len(topo.blocks)))
    ncell = sum(a.size for a in b)
    kw = dict(tol=3e-5, maxiter=4000, symmetric=False, use_bicg=True,
              return_best=True, differentiable=False, precondition=True)

    bm.set_merged_xla_solves(True)
    try:
        x_m, info_m = piso._solve(ops, b, topo, **kw)
    finally:
        bm.set_merged_xla_solves(False)
    assert bool(info_m.converged)
    got = [np.stack([np.asarray(
        st.domain_apply(ops, tuple(x[c] for x in x_m), topo)[bi])
        for c in range(2)]) for bi in range(len(topo.blocks))]
    r = [np.asarray(bi) - ai for bi, ai in zip(b, got)]
    rmse = np.sqrt(sum((a ** 2).sum() for a in r) / ncell)
    assert rmse <= 2 * kw["tol"], rmse
