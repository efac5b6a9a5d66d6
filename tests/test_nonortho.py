"""Non-orthogonal correction tests: operator consistency on a sheared grid.

On a uniformly sheared grid the metric has constant off-diagonal terms, so
the orthogonal-only operator is INCONSISTENT with the physical Laplacian; with
the non-ortho matrix + deferred-RHS terms the full operator must approximate
``phi/dt - nu lap(phi)`` to second order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import DomainBuilder
from fluidgym_tpu.solver import nonortho
from fluidgym_tpu.solver import stencil as st


def _sheared_domain(n, shear, nu=1.0):
    """Unit box sheared in x by ``shear * y``, Dirichlet scalar walls holding
    an analytic field's boundary values."""
    base = geo.make_uniform_grid((n, n), (0.0, 0.0), (1.0, 1.0))
    coords = base.copy()
    coords[0] = base[0] + shear * base[1]  # x' = x + s*y
    dom = DomainBuilder(ndims=2, viscosity=nu, scalar_channels=1)
    blk = dom.create_block(coords)
    assert not blk.orthogonal
    return dom, blk


def _phi(x, y):
    return np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y) + 0.3 * np.cos(
        2 * np.pi * (x - y)
    )


def _lap_phi(x, y):
    k = (2 * np.pi) ** 2
    return -2 * k * np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y) - 0.3 * 2 * k * np.cos(
        2 * np.pi * (x - y)
    )


def test_sheared_operator_consistency():
    n, shear, nu = 64, 0.35, 1.0
    dom, blk = _sheared_domain(n, shear, nu)
    centers = blk._centers  # (2, ny, nx) physical coords
    X, Y = centers[0], centers[1]
    phi = _phi(X, Y)

    # Dirichlet walls holding the analytic boundary values (at the wall-
    # adjacent ghost position approximated by the boundary face value)
    for f in range(4):
        blk.close_boundary(f)
    # set face scalar values from analytic field evaluated at face centers
    vcoords = blk.coords
    for f, sl in ((0, (slice(None), slice(0, 1))), (1, (slice(None), slice(-1, None))),
                  (2, (slice(0, 1), slice(None))), (3, (slice(-1, None), slice(None)))):
        # face centers: average adjacent vertex coords along the face
        if f < 2:
            vx = vcoords[:, :, 0 if f == 0 else -1]
            fc = 0.5 * (vx[:, 1:] + vx[:, :-1])  # (2, ny)
            vals = _phi(fc[0], fc[1])[None, :, None]
            vals = np.moveaxis(vals, 2, 2)
            blk.set_boundary_scalar(f, vals.reshape(1, n, 1))
        else:
            vy = vcoords[:, 0 if f == 2 else -1, :]
            fc = 0.5 * (vy[:, 1:] + vy[:, :-1])  # (2, nx)
            blk.set_boundary_scalar(f, _phi(fc[0], fc[1]).reshape(1, 1, n))

    blk.set_scalar(phi[None])
    topo, geoms, state = dom.build()
    dt = jnp.asarray(1.0, jnp.float32)
    kappa = jnp.asarray(nu, jnp.float32)

    ops = st.build_advection_ops(state, geoms, topo, kappa, dt,
                                 for_scalar=True, scalar_channel=0)
    rhs = st.advection_rhs_scalar(state, geoms, topo, kappa, dt, 0)

    ones = (jnp.ones_like(geoms[0].det),)
    ops_no = nonortho.apply_matrix_terms(
        ops, geoms, topo, tuple(o * kappa for o in ones),
        det_divide=True, field="scalar")
    S = nonortho.deferred_rhs(
        (state.blocks[0].scalar[0],), geoms, topo, ones, field="scalar",
        bval_fn=lambda b, f: state.blocks[b].faces[f].scalar[0])

    phi_j = jnp.asarray(phi, jnp.float32)
    # residual of the full (matrix + deferred) operator against the RHS
    # sources: at the analytic solution,
    #   A phi + S*kappa/det - (phi/dt + bterms/det) ~ -nu lap(phi) ... = 0
    # i.e. the "operator applied" form must equal phi/dt - nu*lap(phi):
    lhs_full = (
        st.domain_apply(ops_no, (phi_j,), topo)[0]
        + S[0] * kappa / geoms[0].det
        - (rhs[0] - phi_j / dt)  # boundary source terms
    )
    target = phi / 1.0 - nu * _lap_phi(np.asarray(X), np.asarray(Y))

    lhs_ortho = (
        st.domain_apply(ops, (phi_j,), topo)[0] - (rhs[0] - phi_j / dt)
    )

    interior = (slice(2, -2), slice(2, -2))
    err_full = np.abs(np.asarray(lhs_full)[interior] - target[interior]).mean()
    err_ortho = np.abs(np.asarray(lhs_ortho)[interior] - target[interior]).mean()
    scale = np.abs(target[interior]).mean()

    # non-ortho corrections must make the operator consistent...
    assert err_full / scale < 0.02, (err_full / scale, err_ortho / scale)
    # ...and substantially more accurate than the orthogonal-only operator
    assert err_full < 0.25 * err_ortho


def test_nonortho_vanishes_on_orthogonal_grid():
    n = 16
    dom = DomainBuilder(ndims=2, viscosity=0.1)
    dom.create_block(geo.make_uniform_grid((n, n), (0, 0), (1.0, 1.0)))
    topo, geoms, state = dom.build()
    assert nonortho.cross_coefficients(geoms[0], topo.blocks[0].orthogonal) is None
    dt = jnp.asarray(0.1, jnp.float32)
    ops = st.build_advection_ops(state, geoms, topo, state.viscosity, dt)
    ops2 = nonortho.apply_matrix_terms(
        ops, geoms, topo, (jnp.ones_like(geoms[0].det),),
        det_divide=True, field="velocity")
    assert ops2[0] is ops[0]


def test_flux_form_matches_direct_deferred_on_periodic_domain():
    """deferred_rhs_flux is documented as algebraically identical to
    deferred_rhs(include_direct=True) away from walls; on a fully periodic
    sheared block they must agree everywhere (pins the include_direct
    reference implementation against the production flux form)."""
    import numpy as np
    import jax.numpy as jnp

    from fluidgym_tpu.core.domain import DomainBuilder
    from fluidgym_tpu.solver import nonortho

    # sheared periodic box -> genuinely non-orthogonal metric
    n = 12
    xs0 = np.linspace(0.0, 1.0, n + 1)
    ys0 = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs0, ys0, indexing="xy")
    X = X + 0.3 * Y  # shear
    coords = np.stack([X, Y], axis=0)
    dom = DomainBuilder(ndims=2, viscosity=1e-3)
    dom.create_block(coords)  # all faces periodic by default
    topo, geoms, state = dom.build()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ras = (jnp.ones_like(geoms[0].det),)

    S_flux = nonortho.deferred_rhs_flux((x,), geoms, topo, ras)[0]
    S_direct = nonortho.deferred_rhs(
        (x,), geoms, topo, ras, field="pressure", include_direct=True)[0]
    np.testing.assert_allclose(
        np.asarray(S_flux), np.asarray(S_direct), rtol=0, atol=5e-5)


def test_pressure_non_ortho_passes_reduce_divergence():
    """The pressure tolerance only controls the ORTHOGONAL operator's
    residual; the deferred cross-term correction lags one iterate.  Inner
    non-ortho passes (SimConfig.pressure_non_ortho_steps, the reference's
    pstep loop, PISOtorch_simulation.py:1841) rebuild the deferred RHS from
    the fresh solution and re-solve -- on a sheared grid the post-substep
    velocity divergence must drop markedly and saturate."""
    import fluidgym_tpu.solver.piso as piso

    n, shear = 32, 0.35
    base = geo.make_uniform_grid((n, n), (0.0, 0.0), (1.0, 1.0))
    coords = base.copy()
    coords[0] = base[0] + shear * base[1]
    dom = DomainBuilder(ndims=2, viscosity=0.01)
    blk = dom.create_block(coords)
    for f in range(4):
        blk.close_boundary(f)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="xy")
    u = np.sin(np.pi * X) ** 2 * np.cos(np.pi * Y) * np.sin(np.pi * Y)
    v = -np.cos(np.pi * X) * np.sin(np.pi * X) * np.sin(np.pi * Y) ** 2
    blk.set_velocity(0.5 * np.stack([u, v]))
    topo, geoms, state = dom.build()

    def div_after(k):
        cfg = piso.SimConfig(dt=0.02, substeps=1, non_orthogonal=True,
                             pressure_tol=1e-8, pressure_non_ortho_steps=k)
        s2 = jax.jit(lambda s, c=cfg: piso.piso_substep(
            s, geoms, topo, c, jnp.asarray(0.02, jnp.float32)))(state)
        d = st.velocity_divergence(s2, geoms, topo)[0]
        return float(jnp.sqrt(jnp.mean(d * d)))

    d1, d3, d6 = div_after(1), div_after(3), div_after(6)
    assert d3 < 0.6 * d1, (d1, d3)          # passes pay off
    assert d6 < d3 * 1.5 + 1e-12, (d3, d6)  # and saturate (no divergence)


def test_pressure_matrix_terms_match_direct_deferred():
    """apply_matrix_terms(field="pressure") moves the DIRECT+CENTER cross
    terms from the deferred RHS into the operator (the reference's
    NON_ORTHO_CENTER_MATRIX|DIRECT_MATRIX|DIAGONAL_RHS split,
    PISOtorch_simulation.py:479-486; not used by the production pressure
    path, which is either fully-deferred or pressure_non_ortho_full).
    Both formulations must share the same fixed point, which requires
    C_mat x == S_full(x) - S_diag(x) for any x (no walls here, so corner
    one-sided variants are inert)."""
    n = 12
    xs0 = np.linspace(0.0, 1.0, n + 1)
    ys0 = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs0, ys0, indexing="xy")
    coords = np.stack([X + 0.3 * Y, Y], axis=0)
    dom = DomainBuilder(ndims=2, viscosity=1e-3)
    dom.create_block(coords)  # fully periodic
    topo, geoms, state = dom.build()

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ones = (jnp.ones_like(geoms[0].det),)
    adiags = ones
    p_ops = st.build_pressure_ops(adiags, geoms, topo)
    p_ops_no = nonortho.apply_matrix_terms(
        p_ops, geoms, topo, ones, det_divide=False, field="pressure")

    # the corrector uses: P p = -div - S  (rhs negated), so the matrix
    # contribution C_mat must satisfy C_mat x = S_full(x) - S_diag(x)
    # with the S sign convention of the corrector (div + S)
    c_mat_x = (st.domain_apply(p_ops_no, (x,), topo)[0]
               - st.domain_apply(p_ops, (x,), topo)[0])
    S_full = nonortho.deferred_rhs(
        (x,), geoms, topo, ones, field="pressure", include_direct=True)[0]
    S_diag = nonortho.deferred_rhs(
        (x,), geoms, topo, ones, field="pressure", include_direct=False)[0]
    np.testing.assert_allclose(
        np.asarray(c_mat_x), np.asarray(S_full - S_diag), rtol=0, atol=5e-5)


def test_pressure_full_mode_substep():
    """A PISO substep with the FULL non-orthogonal pressure system
    (SimConfig.pressure_non_ortho_full: flux-form cross terms inside the
    BiCGStab matvec, no deferred lag) must produce a post-substep
    divergence at least as good as the deferred form's saturated inner
    passes, on a sheared grid."""
    import fluidgym_tpu.solver.piso as piso

    n, shear = 32, 0.35
    base = geo.make_uniform_grid((n, n), (0.0, 0.0), (1.0, 1.0))
    coords = base.copy()
    coords[0] = base[0] + shear * base[1]
    dom = DomainBuilder(ndims=2, viscosity=0.01)
    blk = dom.create_block(coords)
    for f in range(4):
        blk.close_boundary(f)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="xy")
    u = np.sin(np.pi * X) ** 2 * np.cos(np.pi * Y) * np.sin(np.pi * Y)
    v = -np.cos(np.pi * X) * np.sin(np.pi * X) * np.sin(np.pi * Y) ** 2
    blk.set_velocity(0.5 * np.stack([u, v]))
    topo, geoms, state = dom.build()

    def div_after(**kw):
        cfg = piso.SimConfig(dt=0.02, substeps=1, non_orthogonal=True,
                             pressure_tol=1e-8, **kw)
        s2 = jax.jit(lambda s, c=cfg: piso.piso_substep(
            s, geoms, topo, c, jnp.asarray(0.02, jnp.float32)))(state)
        d = st.velocity_divergence(s2, geoms, topo)[0]
        return float(jnp.sqrt(jnp.mean(d * d)))

    d_deferred1 = div_after(pressure_non_ortho_steps=1)
    d_deferred3 = div_after(pressure_non_ortho_steps=3)
    d_full = div_after(pressure_non_ortho_full=True)
    assert np.isfinite(d_full)
    # the full solve has NO iterate lag: it must beat one deferred pass
    # and land at (or below) the saturated-inner-pass level
    assert d_full < d_deferred1, (d_full, d_deferred1)
    assert d_full < 1.5 * d_deferred3, (d_full, d_deferred3)


def test_full_mode_operator_preserves_constants():
    """The flux-form cross-term map annihilates constants (tangential
    central differences of a constant vanish; FIXED faces carry no flux),
    so the full pressure operator keeps the Neumann constant null mode --
    the solvability-projection (mean removal) stays valid in full mode."""
    n = 12
    xs0 = np.linspace(0.0, 1.0, n + 1)
    ys0 = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs0, ys0, indexing="xy")
    coords = np.stack([X + 0.3 * Y, Y], axis=0)
    dom = DomainBuilder(ndims=2, viscosity=1e-3)
    blk = dom.create_block(coords)
    for f in range(4):
        blk.close_boundary(f)
    topo, geoms, state = dom.build()
    ones = (jnp.ones_like(geoms[0].det),)
    S = nonortho.deferred_rhs_flux(ones, geoms, topo, ones)[0]
    assert float(jnp.abs(S).max()) < 1e-6
