"""Non-orthogonal grid corrections for the FV stencil operators.

TPU-native re-expression of the reference's non-orthogonal Laplacian
machinery (``PISO_multiblock_cuda_kernel.cu``):

* cross metric coefficients ``beta(a, t) = det * (M^-1 row_a . M^-1 row_t)``
  (``getLaplaceCoefficient``, kernel.cu:1258-1274), face-interpolated as
  ``faceAlpha = 0.5 * (beta_P * ra_P + beta_N * ra_N)``
  (``interpolateNonOrthoLaplaceComponents``, kernel.cu:1928-2000);
* matrix contributions under flags NON_ORTHO_DIRECT_MATRIX |
  NON_ORTHO_CENTER_MATRIX (the reference default mode,
  PISOtorch_simulation.py:485-487): for each face f and tangential face tf,
  interior corners add ``cno = sign_f * sign_tf * faceAlpha / 4`` as
  ``diag -= cno; off[f] -= cno; off[tf] -= cno`` (advection matrix,
  kernel.cu:3753-3814; the pressure matrix kernel.cu:4894-4950 carries the
  opposite raw signs, which our sign-flipped pressure operator maps onto the
  SAME update);
* gradient-type corners (Neumann field BC at a FIXED tf face, or pressure)
  use the one-sided variant ``diag -= 3*cno; off[f] -= 3*cno;
  off[tf_other] += cno`` (kernel.cu:3781-3796);
* deferred corner (diagonal-neighbor) terms under NON_ORTHO_DIAGONAL_RHS go
  to the RHS using the previous iterate (``getNonOrthoLaplaceRHS_v2``,
  kernel.cu:3050-3204), including Dirichlet boundary corner values and the
  boundary-tangential-gradient source at prescribed faces;
* corner values follow ``getCornerValue`` (kernel.cu:2759-2880) with
  includeDepth0=includeDepth1=False, maxDepth=2: interior corners reduce to
  ``diagonal_cell / 4``.

Known simplifications (documented deviations, refined in later rounds):
* corner values at the 1-2 cells where a CONNECTED seam meets another
  boundary use within-halo rolls instead of the reference's two-connection
  walk;
* neighbor cross-coefficients across CONNECTED faces use mapped axes with
  orientation sign flips (the reference indexes them in the local frame,
  which agrees for the aligned connections its meshes use);
* boundary cross-coefficients at prescribed faces use the adjacent cell's
  metric (matches the face-transform extrapolation on smooth grids).

All corrections vanish identically on orthogonal blocks and are skipped.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fluidgym_tpu.core.domain import (
    BCType,
    BlockGeom,
    BoundKind,
    DomainTopo,
    face_axis,
    face_sign,
)
from fluidgym_tpu.solver.stencil import (
    StencilOp,
    _face_slab,
    _halo,
    _neighbor_field,
    _roll_nbr,
    _slab,
)

Array = jax.Array
BlockVec = tuple

__all__ = [
    "cross_coefficients",
    "apply_matrix_terms",
    "deferred_rhs",
    "deferred_rhs_flux",
]

# corner types at a FIXED tf face
_VALUE, _GRAD = "value", "grad"

# field descriptors: bctype_fn(btopo, face) -> BCType or None (pressure)
def _vel_bct(btopo, f):
    return btopo.faces[f].vel_type


def _scalar_bct(channel):
    def fn(btopo, f):
        return btopo.faces[f].scalar_types[channel]

    return fn


def _pressure_bct(btopo, f):
    return None  # pressure corners are always gradient-type


def bctype_for(field: str, scalar_channel: int = 0):
    if field == "velocity":
        return _vel_bct
    if field == "scalar":
        return _scalar_bct(scalar_channel)
    if field == "pressure":
        return _pressure_bct
    raise ValueError(field)


def _corner_type(btopo, tf: int, bct_fn) -> str:
    bct = bct_fn(btopo, tf)
    return _VALUE if bct == BCType.DIRICHLET else _GRAD


def cross_coefficients(geom: BlockGeom, orthogonal: bool) -> Array | None:
    """``beta[a, t] (*s) = det * sum_i Minv[a,i] Minv[t,i]``; None if the
    block is orthogonal (all cross terms vanish)."""
    if orthogonal or geom.minv is None:
        return None
    beta = jnp.einsum("...ai,...ti->at...", geom.minv, geom.minv)
    return beta * geom.det


def _betas(geoms, topo) -> tuple[Array | None, ...]:
    return tuple(
        cross_coefficients(g, bt.orthogonal) for g, bt in zip(geoms, topo.blocks)
    )


def _face_alpha(betas, ras, topo: DomainTopo, b: int, f: int, t: int) -> Array:
    """Face-interpolated cross coefficient ``0.5*(beta_P ra_P + beta_N ra_N)``
    for face f (axis a), tangential axis t, of block b."""
    a = face_axis(f)
    prod = betas[b][a, t] * ras[b]
    beta_n = _roll_nbr(prod, f)
    spec = topo.blocks[b].faces[f]
    if spec.kind == BoundKind.CONNECTED:
        nb = spec.connected_block
        if betas[nb] is not None:
            nd = topo.ndims
            a_n = spec.axes[0] >> 1
            t_n = spec.axes[(t - a) % nd] >> 1
            # inverted mapped axes flip the sign of the cross term
            sign = 1.0
            if (spec.axes[0] & 1) == (f & 1):
                sign = -sign
            if spec.axes[(t - a) % nd] & 1:
                sign = -sign
            halo = _halo(betas[nb][a_n, t_n] * ras[nb], spec, f, nd) * sign
            beta_n = beta_n.at[_face_slab(beta_n.ndim, f)].set(halo)
        else:
            beta_n = beta_n.at[_face_slab(beta_n.ndim, f)].set(0.0)
    elif spec.kind == BoundKind.FIXED:
        beta_n = beta_n.at[_face_slab(beta_n.ndim, f)].set(0.0)
    return 0.5 * (prod + beta_n)


def apply_matrix_terms(
    ops: tuple[StencilOp, ...],
    geoms,
    topo: DomainTopo,
    ras: BlockVec,
    det_divide: bool,
    field: str,
    scalar_channel: int = 0,
) -> tuple[StencilOp, ...]:
    """Add NON_ORTHO_DIRECT_MATRIX | NON_ORTHO_CENTER_MATRIX contributions.

    ``ras``: per-block per-cell factor inside the interpolated coefficient
    (velocity: nu; scalar: diffusivity; pressure: 1/A).  ``det_divide``: True
    for the advection matrix (the whole row is /det), False for pressure.
    """
    betas = _betas(geoms, topo)
    bct_fn = bctype_for(field, scalar_channel)
    nd = topo.ndims
    out = []
    for b, (op, geom, btopo) in enumerate(zip(ops, geoms, topo.blocks)):
        if betas[b] is None:
            out.append(op)
            continue
        diag = op.diag
        offs = [op.off[f] for f in range(2 * nd)]
        det = geom.det if det_divide else jnp.ones_like(geom.det)
        for f in range(2 * nd):
            a = face_axis(f)
            f_fixed = btopo.faces[f].kind == BoundKind.FIXED
            for i in range(1, nd):
                t = (a + i) % nd
                fa = _face_alpha(betas, ras, topo, b, f, t) / det
                for tu in (0, 1):
                    tf = 2 * t + tu
                    tf_other = tf ^ 1
                    cno = (face_sign(f) * face_sign(tf) * 0.25) * fa
                    if f_fixed:
                        # face-f terms skipped at the prescribed slab
                        cno = cno.at[_face_slab(cno.ndim, f)].set(0.0)
                    d_diag = -cno
                    d_off_f = -cno
                    d_off_tf = -cno
                    d_off_tfo = jnp.zeros_like(cno)
                    if btopo.faces[tf].kind == BoundKind.FIXED:
                        slab = _face_slab(cno.ndim, tf)
                        if _corner_type(btopo, tf, bct_fn) == _VALUE:
                            # prescribed corner value -> RHS; nothing here
                            d_diag = d_diag.at[slab].set(0.0)
                            d_off_f = d_off_f.at[slab].set(0.0)
                            d_off_tf = d_off_tf.at[slab].set(0.0)
                        else:  # gradient corner: one-sided variant
                            d_diag = d_diag.at[slab].set(-3.0 * cno[slab])
                            d_off_f = d_off_f.at[slab].set(-3.0 * cno[slab])
                            d_off_tf = d_off_tf.at[slab].set(0.0)
                            d_off_tfo = d_off_tfo.at[slab].set(cno[slab])
                    diag = diag + d_diag
                    offs[f] = offs[f] + d_off_f
                    offs[tf] = offs[tf] + d_off_tf
                    offs[tf_other] = offs[tf_other] + d_off_tfo
        out.append(StencilOp(diag=diag, off=jnp.stack(offs, axis=0)))
    return tuple(out)


def _diagonal_value(xs: BlockVec, b: int, f: int, tf: int, topo: DomainTopo) -> Array:
    """Value of the diagonal neighbor across face f then face tf, with halo
    fixups along CONNECTED faces; ``xs`` holds per-block (*s) fields."""
    z = _neighbor_field(xs, b, f, topo)
    corner = _roll_nbr(z, tf)
    spec_tf = topo.blocks[b].faces[tf]
    if spec_tf.kind == BoundKind.CONNECTED:
        halo_tf = _halo(xs[spec_tf.connected_block], spec_tf, tf, topo.ndims)
        slab = _face_slab(corner.ndim, tf)
        corner = corner.at[slab].set(_roll_nbr(halo_tf, f)[slab])
    return corner


def _tangential_cd(xs: BlockVec, topo: DomainTopo, b: int, t: int) -> Array:
    """Cell-centered tangential central difference ``0.5*(x_T+ - x_T-)``
    along axis t, with CONNECTED/PERIODIC halos and one-sided differences at
    FIXED walls."""
    x = xs[b]
    btopo = topo.blocks[b]
    up = _neighbor_field(xs, b, 2 * t + 1, topo)
    lo = _neighbor_field(xs, b, 2 * t, topo)
    cd = 0.5 * (up - lo)
    if btopo.faces[2 * t + 1].kind == BoundKind.FIXED:
        slab = _face_slab(cd.ndim, 2 * t + 1)
        cd = cd.at[slab].set((x - lo)[slab])
    if btopo.faces[2 * t].kind == BoundKind.FIXED:
        slab = _face_slab(cd.ndim, 2 * t)
        cd = cd.at[slab].set((up - x)[slab])
    return cd


def deferred_rhs_flux(
    xs: BlockVec,
    geoms,
    topo: DomainTopo,
    ras: BlockVec,
) -> BlockVec:
    """Fully-deferred non-orthogonal correction in FLUX form (pressure).

    Algebraically identical to ``deferred_rhs(include_direct=True)`` in the
    interior (the corner sums reduce to the face-averaged tangential central
    difference), but constructed as per-face fluxes
    ``F_f = faceAlpha_f * 0.5*(CD_P + CD_N)`` differenced per cell, so the
    correction telescopes EXACTLY: interior/seam faces cancel pairwise and
    wall faces carry no flux.  The per-cell corner formulas of
    ``deferred_rhs`` leave O(1) non-telescoping residue at wall-adjacent
    slabs, which for the singular all-Neumann pressure system acts as a large
    spurious low-frequency source -- fully converged solves then produce
    unbounded pressure dipoles (observed as a t~0.1 cylinder blow-up once the
    solver actually converges).  Flux form keeps the RHS in the solvable
    range space by construction.
    """
    betas = _betas(geoms, topo)
    nd = topo.ndims
    nblocks = len(geoms)
    cds = [tuple(_tangential_cd(xs, topo, b, t) for t in range(nd))
           for b in range(nblocks)]
    out = []
    for b, (geom, btopo) in enumerate(zip(geoms, topo.blocks)):
        if betas[b] is None:
            out.append(jnp.zeros(btopo.shape, geom.det.dtype))
            continue
        S = jnp.zeros(btopo.shape, geom.det.dtype)
        for f in range(2 * nd):
            a = face_axis(f)
            spec = btopo.faces[f]
            for i in range(1, nd):
                t = (a + i) % nd
                fa = _face_alpha(betas, ras, topo, b, f, t)
                cd = cds[b][t]
                cd_n = _roll_nbr(cd, f)
                if spec.kind == BoundKind.CONNECTED:
                    nb = spec.connected_block
                    t_idx = spec.axes[(t - a) % nd]
                    halo = _halo(cds[nb][t_idx >> 1], spec, f, nd)
                    if t_idx & 1:  # inverted t mapping flips the derivative
                        halo = -halo
                    cd_n = cd_n.at[_face_slab(cd_n.ndim, f)].set(halo)
                g = 0.5 * (cd + cd_n)
                F = fa * g
                if spec.kind == BoundKind.FIXED:
                    F = F.at[_face_slab(F.ndim, f)].set(0.0)
                S = S - face_sign(f) * F
        out.append(S)
    return tuple(out)


def deferred_rhs(
    xs: BlockVec,
    geoms,
    topo: DomainTopo,
    ras: BlockVec,
    field: str,
    bval_fn: Callable[[int, int], Array] | None = None,
    scalar_channel: int = 0,
    boundary_visc: Array | float = 1.0,
    include_direct: bool = False,
) -> BlockVec:
    """Deferred non-orthogonal correction ``S`` per block
    (getNonOrthoLaplaceRHS_v2).

    ``include_direct=False`` -> NON_ORTHO_DIAGONAL_RHS only (diagonal corner
    cells; used together with the DIRECT/CENTER matrix terms).
    ``include_direct=True`` -> DIRECT_RHS | DIAGONAL_RHS: the FULL cross
    coupling is deferred (corner value = (nbr_f + nbr_tf + diag)/4,
    includeDepth1=True in getCornerValue) and the matrix stays purely
    orthogonal -- this keeps the pressure system exactly SPD for CG (the
    OpenFOAM-style non-orthogonal corrector; the reference's matrix variant
    makes the system mildly non-symmetric, which fp32 CG cannot digest).

    ``xs``: per-block (*s) previous-iterate field (one component).
    ``bval_fn(b, f) -> (*slab)`` prescribed boundary values (None for
    pressure).  Reference usage: velocity RHS ``-= S`` (nu inside via ras),
    scalar RHS ``-= S * kappa`` (ras = 1), pressure RHSdiv ``+= S``
    (ras = 1/A).
    """
    betas = _betas(geoms, topo)
    bct_fn = bctype_for(field, scalar_channel)
    nd = topo.ndims
    out = []
    for b, (geom, btopo) in enumerate(zip(geoms, topo.blocks)):
        if betas[b] is None:
            out.append(jnp.zeros(btopo.shape, geom.det.dtype))
            continue
        S = jnp.zeros(btopo.shape, geom.det.dtype)
        for f in range(2 * nd):
            a = face_axis(f)
            f_fixed = btopo.faces[f].kind == BoundKind.FIXED
            for i in range(1, nd):
                t = (a + i) % nd
                fa = _face_alpha(betas, ras, topo, b, f, t)
                tgrad = jnp.zeros(btopo.shape, geom.det.dtype)
                for tu in (0, 1):
                    tf = 2 * t + tu
                    tf_other = tf ^ 1
                    corner = 0.25 * _diagonal_value(xs, b, f, tf, topo)
                    if include_direct:
                        corner = corner + 0.25 * (
                            _neighbor_field(xs, b, f, topo)
                            + _neighbor_field(xs, b, tf, topo)
                        )
                    if btopo.faces[tf].kind == BoundKind.FIXED:
                        slab = _face_slab(corner.ndim, tf)
                        if (
                            _corner_type(btopo, tf, bct_fn) == _VALUE
                            and bval_fn is not None
                        ):
                            bval = bval_fn(b, tf)  # (*slab), slab along tf
                            # 0.5*(bval(pos) + bval(pos + sign_f along f));
                            # one-sided at the f extreme (kernel.cu:2798-2812)
                            shifted = _roll_nbr(bval, f)
                            cv = 0.5 * (bval + shifted)
                            end = _face_slab(bval.ndim, f)
                            cv = cv.at[end].set(bval[end])
                            corner = corner.at[slab].set(0.0)
                            tgrad = tgrad.at[slab].add(face_sign(tf) * cv[slab])
                        else:
                            # gradient corner: one-sided treatment
                            # (kernel.cu:3180-3196)
                            repl = jnp.zeros_like(tgrad)
                            diag_o = 0.25 * _diagonal_value(xs, b, f, tf_other, topo)
                            repl = repl + face_sign(tf_other) * diag_o
                            if include_direct:
                                nbr_f = _neighbor_field(xs, b, f, topo)
                                nbr_to = _neighbor_field(xs, b, tf_other, topo)
                                repl = repl + face_sign(tf) * 0.75 * nbr_f
                                repl = repl + face_sign(tf_other) * 0.25 * nbr_to
                            corner = corner.at[slab].set(0.0)
                            tgrad = tgrad.at[slab].add(repl[slab])
                    tgrad = tgrad + face_sign(tf) * corner
                contrib = face_sign(f) * fa * tgrad
                if f_fixed:
                    contrib = contrib.at[_face_slab(contrib.ndim, f)].set(0.0)
                S = S - contrib

            # prescribed-face tangential-gradient source (kernel.cu:3076-3135)
            if (
                f_fixed
                and field != "pressure"
                and bval_fn is not None
                and bct_fn(btopo, f) == BCType.DIRICHLET
            ):
                bval = bval_fn(b, f)  # (*slab) along f
                for i in range(1, nd):
                    t = (a + i) % nd
                    beta_slab = _slab(betas[b][a, t], f)
                    up = _roll_nbr(bval, 2 * t + 1)
                    lo = _roll_nbr(bval, 2 * t)
                    g = 0.5 * (up - lo)
                    lo_end = _face_slab(bval.ndim, 2 * t)
                    hi_end = _face_slab(bval.ndim, 2 * t + 1)
                    g = g.at[lo_end].set((up - bval)[lo_end])
                    g = g.at[hi_end].set((bval - lo)[hi_end])
                    term = face_sign(f) * beta_slab * _slab(g, f) * boundary_visc
                    S = S.at[_face_slab(S.ndim, f)].add(-term)
        out.append(S)
    return tuple(out)
