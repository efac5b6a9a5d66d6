"""Multi-block halo-exchange tests: a periodic box split into two connected
blocks must reproduce the single-block solution exactly (inter-block
continuity, SURVEY.md section 7 stage 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import DomainBuilder
from fluidgym_tpu.solver import stencil as st
from fluidgym_tpu.solver.piso import SimConfig, piso_fixed_steps


def _taylor_green(n, L=2 * np.pi, x0=0.0):
    x = x0 + (np.arange(n) + 0.5) / n * L
    y = (np.arange(n) + 0.5) / n * (2 * np.pi)
    X, Y = np.meshgrid(x, y, indexing="xy")
    u = np.sin(X) * np.cos(Y)
    v = -np.cos(X) * np.sin(Y)
    return np.stack([u, v], axis=0)


def _single_block_box(n, nu=0.02):
    dom = DomainBuilder(ndims=2, viscosity=nu)
    dom.create_block(geo.make_uniform_grid((n, n), (0, 0), (2 * np.pi, 2 * np.pi)))
    dom._blocks[0].set_velocity(_taylor_green(n))
    return dom.build()


def _two_block_box(n, nu=0.02):
    """Same box split into left/right halves, joined with CONNECTED faces on
    both the interior seam and the (formerly periodic) outer x faces."""
    L = 2 * np.pi
    dom = DomainBuilder(ndims=2, viscosity=nu)
    left = dom.create_block(geo.make_uniform_grid((n // 2, n), (0, 0), (L / 2, L)))
    right = dom.create_block(geo.make_uniform_grid((n // 2, n), (L / 2, 0), (L, L)))
    vel = _taylor_green(n)
    left.set_velocity(vel[:, :, : n // 2])
    right.set_velocity(vel[:, :, n // 2 :])
    # seam: left "+x" <-> right "-x"; wrap: left "-x" <-> right "+x"
    dom.connect_blocks(0, "+x", 1, "-x")
    dom.connect_blocks(0, "-x", 1, "+x")
    return dom.build()


def _stitch(fields):
    """Concatenate left/right block fields back to the full box (x last)."""
    return jnp.concatenate([fields[0], fields[1]], axis=-1)


def test_connected_halo_matches_roll():
    """domain_apply on the split box == stencil_apply on the full box."""
    n = 16
    topo1, geoms1, state1 = _single_block_box(n)
    topo2, geoms2, state2 = _two_block_box(n)

    dt = jnp.asarray(0.1, jnp.float32)
    ops1 = st.build_advection_ops(state1, geoms1, topo1, state1.viscosity, dt)
    ops2 = st.build_advection_ops(state2, geoms2, topo2, state2.viscosity, dt)

    # coefficients must agree after stitching
    np.testing.assert_allclose(
        np.asarray(_stitch([o.diag for o in ops2])),
        np.asarray(ops1[0].diag), rtol=1e-6)

    # operator application on a random field must agree
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.normal(size=(2, n, n)), jnp.float32)
    xs_split = (x_full[..., : n // 2], x_full[..., n // 2 :])
    y1 = st.stencil_apply(ops1[0], x_full, 2)
    y2 = st.domain_apply(ops2, xs_split, topo2)
    np.testing.assert_allclose(np.asarray(_stitch(y2)), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


def test_two_block_taylor_green_matches_single_block():
    n, nu = 32, 0.02
    topo1, geoms1, state1 = _single_block_box(n, nu)
    topo2, geoms2, state2 = _two_block_box(n, nu)
    cfg = SimConfig(pressure_tol=1e-7, advection_tol=1e-7)
    dt = jnp.asarray(0.05, jnp.float32)

    run1 = jax.jit(lambda s: piso_fixed_steps(s, geoms1, topo1, cfg, dt, 10))
    run2 = jax.jit(lambda s: piso_fixed_steps(s, geoms2, topo2, cfg, dt, 10))
    out1 = run1(state1)
    out2 = run2(state2)

    u1 = np.asarray(out1.blocks[0].velocity)
    u2 = np.asarray(_stitch([b.velocity for b in out2.blocks]))
    # same physics, same discretization; solver tolerance limits agreement
    np.testing.assert_allclose(u2, u1, atol=5e-4)

    div = st.velocity_divergence(out2, geoms2, topo2)
    assert float(jnp.max(jnp.abs(div[0]))) < 1e-3
    assert float(jnp.max(jnp.abs(div[1]))) < 1e-3


def test_pressure_gradient_across_seam():
    """FD pressure gradient must see across CONNECTED faces."""
    n = 16
    topo2, geoms2, state2 = _two_block_box(n)
    x = (np.arange(n) + 0.5) / n * 2 * np.pi
    X, Y = np.meshgrid(x, x, indexing="xy")
    p_full = np.sin(X) * np.cos(Y)
    ps = (jnp.asarray(p_full[:, : n // 2], jnp.float32),
          jnp.asarray(p_full[:, n // 2 :], jnp.float32))
    grads = st.pressure_gradient(ps, geoms2, topo2)
    g = np.asarray(_stitch(grads))
    # analytic: dp/dx = cos(x)cos(y), dp/dy = -sin(x)sin(y)
    h = 2 * np.pi / n
    assert np.allclose(g[0], np.cos(X) * np.cos(Y), atol=0.1)
    assert np.allclose(g[1], -np.sin(X) * np.sin(Y), atol=0.1)


def _two_block_box_rotated(n, nu=0.02):
    """Split box whose right half is stored rotated by 180 degrees: both
    connections are same-side with inverted tangential axes -- the pattern the
    cylinder O-grid seams use (reference grid.py:382-395)."""
    L = 2 * np.pi
    dom = DomainBuilder(ndims=2, viscosity=nu)
    left_coords = geo.make_uniform_grid((n // 2, n), (0, 0), (L / 2, L))
    right_coords = geo.make_uniform_grid((n // 2, n), (L / 2, 0), (L, L))
    right_rot = right_coords[:, ::-1, ::-1].copy()  # 180-degree rotation
    left = dom.create_block(left_coords)
    right = dom.create_block(right_rot)
    vel = _taylor_green(n)
    left.set_velocity(vel[:, :, : n // 2])
    # rotate the right-half field to the block's rotated frame
    right.set_velocity(vel[:, :, n // 2 :][:, ::-1, ::-1].copy())
    # seam: left "+x" <-> right "+x" (same side, tangential inverted)
    dom.connect_blocks(0, "+x", 1, "+x", "+y")
    # wrap: left "-x" <-> right "-x"
    dom.connect_blocks(0, "-x", 1, "-x", "+y")
    return dom.build()


def test_rotated_connection_matches_single_block():
    n, nu = 32, 0.02
    topo1, geoms1, state1 = _single_block_box(n, nu)
    topo2, geoms2, state2 = _two_block_box_rotated(n, nu)
    cfg = SimConfig(pressure_tol=1e-7, advection_tol=1e-7)
    dt = jnp.asarray(0.05, jnp.float32)

    out1 = jax.jit(lambda s: piso_fixed_steps(s, geoms1, topo1, cfg, dt, 5))(state1)
    out2 = jax.jit(lambda s: piso_fixed_steps(s, geoms2, topo2, cfg, dt, 5))(state2)

    u1 = np.asarray(out1.blocks[0].velocity)
    u_right = np.asarray(out2.blocks[1].velocity)[:, ::-1, ::-1]  # unrotate
    u2 = np.concatenate([np.asarray(out2.blocks[0].velocity), u_right], axis=-1)
    np.testing.assert_allclose(u2, u1, atol=5e-4)


def _two_boxes():
    import numpy as np
    from fluidgym_tpu.core.domain import DomainBuilder
    from fluidgym_tpu.core import geometry as geo

    dom = DomainBuilder(ndims=2, viscosity=1e-3)
    g1 = geo.make_wall_refined_ortho_grid(
        8, 8, corner_lower=(0, 0), corner_upper=(1, 1),
        wall_refinement=(), base=1.0)
    g2 = geo.make_wall_refined_ortho_grid(
        8, 8, corner_lower=(1, 0), corner_upper=(2, 1),
        wall_refinement=(), base=1.0)
    return dom, dom.create_block(g1), dom.create_block(g2)


def test_close_boundary_severs_reciprocal_connection():
    """Closing one side of a CONNECTED seam closes the neighbor's face too
    (reference CloseBoundary -> CloseConnectedBoudary,
    domain_structs.cpp:1790-1818) -- a one-way connection would silently
    read the closed block's interior as halo."""
    from fluidgym_tpu.core.domain import BoundKind

    dom, b1, b2 = _two_boxes()
    dom.connect_blocks(0, "+x", 1, "-x")
    assert b2.faces[0].kind == BoundKind.CONNECTED
    b1.close_boundary("+x")
    assert b1.faces[1].kind == BoundKind.FIXED
    assert b2.faces[0].kind == BoundKind.FIXED


def test_connect_blocks_validates_2d_axis_and_shapes():
    import pytest
    from fluidgym_tpu.core.domain import DomainBuilder
    from fluidgym_tpu.core import geometry as geo

    dom, b1, b2 = _two_boxes()
    with pytest.raises(ValueError, match="axis mapping"):
        dom.connect_blocks(0, "+x", 1, "-x", "+x")  # face-normal as tangent

    dom2 = DomainBuilder(ndims=2, viscosity=1e-3)
    g1 = geo.make_wall_refined_ortho_grid(
        8, 8, corner_lower=(0, 0), corner_upper=(1, 1),
        wall_refinement=(), base=1.0)
    g3 = geo.make_wall_refined_ortho_grid(
        8, 12, corner_lower=(1, 0), corner_upper=(2, 1),
        wall_refinement=(), base=1.0)
    dom2.create_block(g1)
    dom2.create_block(g3)
    with pytest.raises(ValueError, match="incompatible sizes"):
        dom2.connect_blocks(0, "+x", 1, "-x")  # 8 vs 12 tangential cells
