"""Matrix-free finite-volume stencil operators (single block).

TPU-native re-expression of the reference's CSR matrix assembly kernels
(``/root/reference/src/fluidgym/simulation/extensions/PISO_multiblock_cuda_kernel.cu``)
as fused array ops.  Instead of assembling a sparse CSR matrix, we build the
stencil **coefficient arrays** (diagonal + one coefficient per face) once per
substep and apply the operator matrix-free with shifted multiplies -- the form
XLA fuses into a handful of HBM-bandwidth-bound passes and that maps directly
onto a Pallas kernel.

Numerics replicated exactly from the reference:

* advective face fluxes: central average of cell contravariant components
  ``flux_f = 0.5 * (C_P + C_N)``, ``C_d = det * (M^-1 u)_d``
  (``computeFluxesNDLoop``, kernel.cu:1568-1643);
* implicit-Euler advection-diffusion matrix: ``diag = 1/dt + sum_f(0.5 *
  sign_f * flux_f + visc_f)/det (+ wall terms)``, ``off_f = (0.5 * sign_f *
  flux_f - visc_f)/det`` with ``visc_f = 0.5*(alpha_P nu_P + alpha_N nu_N)``
  (``PISO_build_matrix``, kernel.cu:3617-3880);
* prescribed (FIXED) boundary faces: matrix entry removed; Dirichlet walls add
  ``2 nu alpha / det`` to the diagonal (kernel.cu:3816-3848) and the matching
  advective/diffusive source terms to the RHS (``kPISO_build_advection_RHS``,
  kernel.cu:4303-4398);
* pressure (Poisson) matrix: ``off_f = 0.5*(alpha_P/A_P + alpha_N/A_N)``,
  ``diag = -sum_f off_f``, zero Neumann at prescribed faces, NOT divided by
  det (``PISO_build_pressure_matrix``, kernel.cu:4813-4981);
* pressure RHS: ``hbyA = (u_old/dt - H u* + S)/A`` with H the off-diagonal
  part of the advection matrix (``PISO_build_pressure_rhs``, kernel.cu:5137);
* divergence of the hbyA field from contravariant face fluxes
  (``k_computePressureRHSdivergenceFromFlux``, kernel.cu:5390);
* FD velocity correction ``u = hbyA - (1/A) * M^-T grad_xi p`` with central /
  one-sided pressure differences (``getPressureGradient`` kernel.cu:816-850,
  ``PISO_update_velocity`` kernel.cu:5958+).

Boundary metric coefficients use the adjacent cell's ``alpha``/``det``; for
orthogonal grids this equals the reference's boundary face-transform values
(see ``k_CoordsToFaceTransforms``, grid_gen.cu:398: one-sided differences at
walls reproduce the adjacent cell metric).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from fluidgym_tpu.core.domain import (
    BCType,
    BlockGeom,
    BlockState,
    BlockTopo,
    BoundKind,
    face_axis,
    face_sign,
)

Array = jax.Array

__all__ = [
    "StencilOp",
    "stencil_apply",
    "stencil_off_apply",
    "contravariant",
    "build_advection_op",
    "advection_rhs_velocity",
    "advection_rhs_scalar",
    "build_pressure_op",
    "pressure_rhs_vec",
    "divergence_of",
    "pressure_gradient",
    "correct_velocity_fd",
    "max_computational_velocity",
    "velocity_divergence",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("diag", "off"),
    meta_fields=(),
)
@dataclass
class StencilOp:
    """Matrix-free stencil operator: ``(A x)_i = diag_i x_i + sum_f off_f[i] *
    x_{neighbor_f(i)}``.  ``off`` has shape ``(2*ndims, *spatial)`` with face
    order -x,+x,-y,+y[,-z,+z]; coefficients are zero at prescribed faces so
    periodic rolls never leak across walls."""

    diag: Array
    off: Array


# ---------------------------------------------------------------------------
# shift / slicing helpers
# ---------------------------------------------------------------------------

def _axis(rank: int, d: int) -> int:
    """Array axis of physical axis d for an array of given rank."""
    return rank - 1 - d


def _nbr(x: Array, f: int) -> Array:
    """Values of the face-f neighbor at each cell (periodic wrap)."""
    d = face_axis(f)
    shift = 1 if f % 2 == 0 else -1  # lower face -> i-1 neighbor
    return jnp.roll(x, shift, axis=_axis(x.ndim, d))


def _face_slab(rank: int, f: int):
    """Index tuple selecting the slab of cells adjacent to face f."""
    d = face_axis(f)
    idx = [slice(None)] * rank
    idx[_axis(rank, d)] = slice(-1, None) if f % 2 else slice(0, 1)
    return tuple(idx)


def _slab(x: Array, f: int) -> Array:
    return x[_face_slab(x.ndim, f)]


# ---------------------------------------------------------------------------
# operator application
# ---------------------------------------------------------------------------

def stencil_apply(op: StencilOp, x: Array, ndims: int) -> Array:
    """Apply the stencil operator; ``x`` may have leading channel dims."""
    out = op.diag * x
    for f in range(2 * ndims):
        out = out + op.off[f] * _nbr(x, f)
    return out


def stencil_off_apply(op: StencilOp, x: Array, ndims: int) -> Array:
    """Apply only the off-diagonal part (the reference's ``H u*``)."""
    out = jnp.zeros_like(x * op.diag)
    for f in range(2 * ndims):
        out = out + op.off[f] * _nbr(x, f)
    return out


# ---------------------------------------------------------------------------
# metric helpers
# ---------------------------------------------------------------------------

def contravariant(u: Array, geom: BlockGeom, topo: BlockTopo) -> Array:
    """Contravariant velocity components ``C_d = det * (M^-1 u)_d``; the
    volumetric face flux density (kernel.cu:658 getContravariantComponent)."""
    if topo.orthogonal:
        return geom.det * geom.minv_diag * u
    # minv: (*s, k, i); u: (d, *s) -> C_k = det * sum_i minv[k,i] u_i
    c = jnp.einsum("...ki,i...->k...", geom.minv, u)
    return geom.det * c


def computational_velocity(u: Array, geom: BlockGeom, topo: BlockTopo) -> Array:
    """Index-space velocity ``(M^-1 u)`` used for CFL estimation."""
    if topo.orthogonal:
        return geom.minv_diag * u
    return jnp.einsum("...ki,i...->k...", geom.minv, u)


def max_computational_velocity(state: BlockState, geom: BlockGeom, topo: BlockTopo) -> Array:
    """Max abs component of index-space velocity over cells and FIXED bounds
    (reference Domain.getMaxVelocity(True, True), domain_structs.cpp:1580)."""
    m = jnp.max(jnp.abs(computational_velocity(state.velocity, geom, topo)))
    for f, spec in enumerate(topo.faces):
        if spec.kind == BoundKind.FIXED and state.faces[f].velocity is not None:
            d = face_axis(f)
            if topo.orthogonal:
                bvel = _slab(geom.minv_diag, f) * state.faces[f].velocity
            else:
                bvel = jnp.einsum(
                    "...ki,i...->k...", _slab(geom.minv, f), state.faces[f].velocity
                )
            m = jnp.maximum(m, jnp.max(jnp.abs(bvel)))
    return m


def _boundary_flux(state: BlockState, geom: BlockGeom, topo: BlockTopo, f: int) -> Array:
    """Unsigned contravariant flux through FIXED face f (slab shape)."""
    d = face_axis(f)
    bvel = state.faces[f].velocity  # (ndims, *slab)
    if topo.orthogonal:
        return _slab(geom.det * geom.minv_diag[d], f) * bvel[d]
    minv_row = _slab(geom.minv, f)[..., d, :]  # (*slab, i)
    return _slab(geom.det, f) * jnp.einsum("...i,i...->...", minv_row, bvel)


def _face_fluxes(state: BlockState, geom: BlockGeom, topo: BlockTopo) -> list[Array]:
    """Per-face unsigned advective fluxes (computeFluxesNDLoop)."""
    ndims = topo.ndims
    C = contravariant(state.velocity, geom, topo)  # (d, *s)
    fluxes = []
    for f in range(2 * ndims):
        d = face_axis(f)
        flux = 0.5 * (C[d] + _nbr(C[d], f))
        spec = topo.faces[f]
        if spec.kind == BoundKind.FIXED:
            bflux = _boundary_flux(state, geom, topo, f)
            flux = flux.at[_face_slab(flux.ndim, f)].set(bflux)
        fluxes.append(flux)
    return fluxes


# ---------------------------------------------------------------------------
# advection-diffusion system (prediction step)
# ---------------------------------------------------------------------------

def build_advection_op(
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
    nu: Array,
    dt: Array,
    for_scalar: bool = False,
    scalar_channel: int = 0,
) -> StencilOp:
    """Implicit-Euler advection-diffusion matrix (PISO_build_matrix).

    ``nu``: scalar kinematic viscosity (velocity) or diffusivity (scalar
    channel).  Returns coefficients already divided by ``det``.
    """
    ndims = topo.ndims
    det = geom.det
    fluxes = _face_fluxes(state, geom, topo)

    diag = det / dt
    offs = []
    for f in range(2 * ndims):
        d = face_axis(f)
        spec = topo.faces[f]
        adv = (0.5 * face_sign(f)) * fluxes[f]
        visc = (0.5 * nu) * (geom.alpha[d] + _nbr(geom.alpha[d], f))
        off = adv - visc
        diag_c = adv + visc
        if spec.kind == BoundKind.FIXED:
            slab = _face_slab(off.ndim, f)
            off = off.at[slab].set(0.0)
            # wall contribution to the diagonal (ghost value at half-cell):
            # Dirichlet (no-slip / fixed value): +2 nu alpha ; Neumann: 0
            bctype = (
                spec.scalar_types[scalar_channel] if for_scalar else spec.vel_type
            )
            wall = (
                (2.0 * nu) * geom.alpha[d][slab]
                if bctype == BCType.DIRICHLET
                else jnp.zeros_like(geom.alpha[d][slab])
            )
            diag_c = diag_c.at[slab].set(wall)
        diag = diag + diag_c
        offs.append(off / det)
    return StencilOp(diag=diag / det, off=jnp.stack(offs, axis=0))


def _boundary_rhs_terms(
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
    nu: Array,
    values_fn,
    bctype_fn,
    neumann_source: bool = False,
) -> Array:
    """Shared boundary source accumulation for advection RHS (velocity and
    scalar variants).  ``values_fn(f) -> (C, *slab)`` boundary values,
    ``bctype_fn(f) -> BCType``.  ``neumann_source``: scalars get a
    prescribed-gradient diffusive source ``nu * value`` on Neumann faces
    (kernel.cu:4266-4272); slip velocity walls get none.
    Returns ``(C, *spatial)`` (to be /det)."""
    ndims = topo.ndims
    out = None
    for f in range(2 * ndims):
        spec = topo.faces[f]
        if spec.kind != BoundKind.FIXED:
            continue
        d = face_axis(f)
        vals = values_fn(f)  # (C, *slab)
        bflux = _boundary_flux(state, geom, topo, f) * face_sign(f)
        alpha_b = _slab(geom.alpha[d], f)
        term = -vals * bflux  # advective boundary source
        if bctype_fn(f) == BCType.DIRICHLET:
            term = term + vals * (2.0 * nu) * alpha_b
        elif neumann_source:
            term = term + vals * nu
        if out is None:
            out = jnp.zeros(vals.shape[:-len(topo.shape)] + topo.shape, term.dtype)
        out = out.at[(slice(None),) * (out.ndim - len(topo.shape)) + _face_slab(len(topo.shape), f)].add(term)
    if out is None:
        out = jnp.zeros((1,) + topo.shape, geom.det.dtype)
    return out


def advection_rhs_velocity(
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
    nu: Array,
    dt: Array,
) -> Array:
    """RHS of the velocity prediction system (kPISO_build_advection_RHS)."""
    bterms = _boundary_rhs_terms(
        state,
        geom,
        topo,
        nu,
        values_fn=lambda f: state.faces[f].velocity,
        bctype_fn=lambda f: topo.faces[f].vel_type,
    )
    rhs = state.velocity / dt + bterms / geom.det
    if state.velocity_source is not None:
        rhs = rhs + state.velocity_source
    return rhs


def advection_rhs_scalar(
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
    kappa: Array,
    dt: Array,
    channel: int,
) -> Array:
    """RHS of the scalar prediction system for one channel; ``(*spatial)``."""
    bterms = _boundary_rhs_terms(
        state,
        geom,
        topo,
        kappa,
        values_fn=lambda f: state.faces[f].scalar[channel : channel + 1],
        bctype_fn=lambda f: topo.faces[f].scalar_types[channel],
        neumann_source=True,
    )
    return state.scalar[channel] / dt + bterms[0] / geom.det


# ---------------------------------------------------------------------------
# pressure system (corrector step)
# ---------------------------------------------------------------------------

def build_pressure_op(adiag: Array, geom: BlockGeom, topo: BlockTopo) -> StencilOp:
    """Pressure Poisson matrix (PISO_build_pressure_matrix, kernel.cu:4813).

    Built SIGN-FLIPPED relative to the reference (positive definite) so plain
    CG applies; the RHS is negated to match.  ``off_f = -0.5 * (alpha_P/A_P +
    alpha_N/A_N)``, ``diag = -sum_f off_f``; zero (Neumann) at FIXED faces.
    """
    ndims = topo.ndims
    ra = geom.alpha / adiag  # (d, *s)
    diag = jnp.zeros_like(adiag)
    offs = []
    for f in range(2 * ndims):
        d = face_axis(f)
        coef = 0.5 * (ra[d] + _nbr(ra[d], f))
        if topo.faces[f].kind == BoundKind.FIXED:
            coef = coef.at[_face_slab(coef.ndim, f)].set(0.0)
        diag = diag + coef
        offs.append(-coef)
    return StencilOp(diag=diag, off=jnp.stack(offs, axis=0))


def pressure_rhs_vec(
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
    adv_op: StencilOp,
    u_star: Array,
    nu: Array,
    dt: Array,
) -> Array:
    """``hbyA = (u_old/dt - H u* + S)/A`` (PISO_build_pressure_rhs).

    ``u_old`` is the block velocity from before the prediction solve; the
    boundary sources S match the advection RHS ones
    (PRESSURE_RHS_WITH_BOUNDARY_SOURCES is enabled in the reference,
    kernel.cu:5134).
    """
    H = stencil_off_apply(adv_op, u_star, topo.ndims)
    bterms = _boundary_rhs_terms(
        state,
        geom,
        topo,
        nu,
        values_fn=lambda f: state.faces[f].velocity,
        bctype_fn=lambda f: topo.faces[f].vel_type,
    )
    S = bterms / geom.det
    if state.velocity_source is not None:
        S = S + state.velocity_source
    return (state.velocity / dt - H + S) / adv_op.diag


def divergence_of(
    field: Array,
    state: BlockState,
    geom: BlockGeom,
    topo: BlockTopo,
) -> Array:
    """Divergence of a colocated vector field from contravariant face fluxes;
    FIXED faces use the prescribed boundary velocity flux
    (k_computePressureRHSdivergenceFromFlux -> computeFluxesNDLoop)."""
    ndims = topo.ndims
    C = contravariant(field, geom, topo)
    div = jnp.zeros_like(geom.det)
    for f in range(2 * ndims):
        d = face_axis(f)
        flux = 0.5 * (C[d] + _nbr(C[d], f))
        if topo.faces[f].kind == BoundKind.FIXED:
            bflux = _boundary_flux(state, geom, topo, f)
            flux = flux.at[_face_slab(flux.ndim, f)].set(bflux)
        div = div + face_sign(f) * flux
    return div


def velocity_divergence(state: BlockState, geom: BlockGeom, topo: BlockTopo) -> Array:
    """Divergence of the current block velocity (diagnostic)."""
    return divergence_of(state.velocity, state, geom, topo)


def pressure_gradient(p: Array, geom: BlockGeom, topo: BlockTopo) -> Array:
    """FD pressure gradient (getPressureGradient, kernel.cu:816-850).

    Central differences over +-1 cells in index space; one-sided at FIXED
    faces; mapped to physical space with ``M^-T``.  Returns ``(d, *s)``.
    """
    ndims = topo.ndims
    grads = []
    for d in range(ndims):
        lo_fixed = topo.faces[2 * d].kind == BoundKind.FIXED
        hi_fixed = topo.faces[2 * d + 1].kind == BoundKind.FIXED
        ax = _axis(p.ndim, d)
        val_n = jnp.roll(p, 1, axis=ax)
        val_p = jnp.roll(p, -1, axis=ax)
        fac = jnp.full_like(p, 0.5)
        if lo_fixed:
            slab = _face_slab(p.ndim, 2 * d)
            val_n = val_n.at[slab].set(p[slab])
            fac = fac.at[slab].set(1.0)
        if hi_fixed:
            slab = _face_slab(p.ndim, 2 * d + 1)
            val_p = val_p.at[slab].set(p[slab])
            fac = fac.at[slab].set(1.0)
        grads.append((val_p - val_n) * fac)
    g = jnp.stack(grads, axis=0)  # index-space gradient (d, *s)
    if topo.orthogonal:
        return geom.minv_diag * g
    # physical grad_i = sum_k Minv[k, i] * g_k
    return jnp.einsum("...ki,k...->i...", geom.minv, g)


def correct_velocity_fd(
    hbyA: Array,
    p: Array,
    adiag: Array,
    geom: BlockGeom,
    topo: BlockTopo,
    dt: Array,
    time_step_normalized: bool = False,
) -> Array:
    """FD velocity corrector: ``u = hbyA - (1/A) grad p`` (PISO_update_velocity)."""
    grad = pressure_gradient(p, geom, topo)
    upd = grad / adiag
    if time_step_normalized:
        upd = upd * dt
    return hbyA - upd
