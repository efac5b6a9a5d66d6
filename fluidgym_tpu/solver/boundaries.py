"""Boundary-update hooks: convective outflow and flux balancing.

TPU-native re-expression of the reference's pre-step boundary utilities
(``PISOtorch_simulation.py``):

* ``update_advective_boundaries`` (:228-393): advect the prescribed values of
  designated outflow faces toward the adjacent interior values with the
  interpolation weight ``t = 1 - 1/(1 + 2*dt*u_adv)`` where ``u_adv`` is the
  contravariant component of a characteristic velocity at the face
  (get_advective_velocity, :146-185);
* ``balance_boundary_fluxes`` (:188-224): rescale the outflow boundary
  velocity so the net volumetric flux through all FIXED boundaries vanishes
  (the incompressibility solvability condition); applied whenever the
  imbalance exceeds ``0.01 * tol``.

Both are pure ``DomainState -> DomainState`` functions meant to be used as
"PRE" hooks of the PISO driver.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from fluidgym_tpu.core.domain import BoundKind, DomainState, DomainTopo, face_axis, face_sign
from fluidgym_tpu.solver.stencil import _boundary_flux, _slab, _slab_trailing

Array = jax.Array

__all__ = ["update_advective_boundaries", "balance_boundary_fluxes",
           "make_convective_outflow_hook"]


def update_advective_boundaries(
    state: DomainState,
    geoms,
    topo: DomainTopo,
    out_faces: tuple[tuple[int, int], ...],
    char_vel: tuple[float, ...],
    dt: Array,
) -> DomainState:
    """Advect outflow-face velocity (and scalar) toward the interior values
    (reference update_advective_boundaries, PISOtorch_simulation.py:228-393).
    ``out_faces``: (block, face) pairs; ``char_vel``: characteristic velocity.
    """
    cv = jnp.asarray(char_vel, state.blocks[0].velocity.dtype)
    for b, f in out_faces:
        blk = state.blocks[b]
        geom = geoms[b]
        btopo = topo.blocks[b]
        d = face_axis(f)
        # contravariant component of the characteristic velocity at the face
        # (get_advective_velocity: J * (Minv row_d . v); boundary transform
        # equals the adjacent cell metric for these grids)
        if btopo.orthogonal:
            adv = _slab(geom.det * geom.minv_diag[d], f) * cv[d]
        else:
            minv_row = _slab_trailing(geom.minv, f, 2)[..., d, :]
            adv = _slab(geom.det, f) * jnp.einsum("...i,i->...", minv_row, cv)
        # outward-positive: on a LOWER face an outflow has negative
        # contravariant velocity; without the sign the interpolation weight
        # goes negative (anti-advection) and can divide by zero at alpha=-1
        adv = face_sign(f) * adv
        alpha = dt * 2.0 * adv
        t = 1.0 - 1.0 / (1.0 + alpha)  # interpolation weight (:354)

        faces = list(blk.faces)
        fd = faces[f]
        vel_slice = _slab(blk.velocity, f)
        new_vel = fd.velocity - t * (fd.velocity - vel_slice)
        new_scal = fd.scalar
        if fd.scalar is not None and blk.scalar is not None:
            scal_slice = _slab(blk.scalar, f)
            new_scal = fd.scalar - t * (fd.scalar - scal_slice)
        faces[f] = replace(fd, velocity=new_vel, scalar=new_scal)
        state = state.replace_block(b, replace(blk, faces=tuple(faces)))
    return state


def _signed_face_flux(blk, geom, btopo, f: int) -> Array:
    """Total signed volumetric flux through FIXED face f (outward positive on
    upper faces; reference get_fixed_boundary_fluxes sign convention,
    PISOtorch_simulation.py:84-101)."""
    flux = _boundary_flux(blk, geom, btopo, f)
    return face_sign(f) * jnp.sum(flux)


def balance_boundary_fluxes(
    state: DomainState,
    geoms,
    topo: DomainTopo,
    free_faces: tuple[tuple[int, int], ...],
    tol: float = 1e-5,
) -> DomainState:
    """Scale the velocity of ``free_faces`` so the net FIXED-boundary flux is
    zero (reference balance_boundary_fluxes, PISOtorch_simulation.py:188-224;
    scale_all=True branch)."""
    dtype = state.blocks[0].velocity.dtype
    fixed_flux = jnp.zeros((), dtype)
    var_flux = jnp.zeros((), dtype)
    free = set(free_faces)
    for b, btopo in enumerate(topo.blocks):
        for f, spec in enumerate(btopo.faces):
            if spec.kind != BoundKind.FIXED:
                continue
            if state.blocks[b].faces[f].velocity is None:
                continue
            flux = _signed_face_flux(state.blocks[b], geoms[b], topo.blocks[b], f)
            if (b, f) in free:
                var_flux = var_flux + flux
            else:
                fixed_flux = fixed_flux + flux

    # only faces that actually contributed to var_flux may be scaled:
    # non-FIXED faces or faces without a velocity array were excluded from
    # the accumulation, so scaling them would not achieve the balance (and
    # velocity=None would crash)
    eligible = tuple(
        (b, f) for b, f in free_faces
        if topo.blocks[b].faces[f].kind == BoundKind.FIXED
        and state.blocks[b].faces[f].velocity is not None
    )

    imbalance = fixed_flux + var_flux
    needs = jnp.abs(imbalance) > (tol * 0.01)
    scale = -fixed_flux / jnp.where(var_flux == 0, 1.0, var_flux)
    scale = jnp.where(needs & (var_flux != 0), scale, 1.0)

    for b, f in eligible:
        blk = state.blocks[b]
        faces = list(blk.faces)
        fd = faces[f]
        faces[f] = replace(fd, velocity=fd.velocity * scale)
        state = state.replace_block(b, replace(blk, faces=tuple(faces)))
    return state


def make_convective_outflow_hook(
    geoms,
    topo: DomainTopo,
    out_faces: tuple[tuple[int, int], ...],
    char_vel: tuple[float, ...],
    tol: float = 5e-6,
):
    """Build a PRE hook combining outflow advection + flux balancing
    (reference cylinder pre_fn, cylinder_env_base.py:289-301)."""

    def hook(state: DomainState, *, time_step, **kw) -> DomainState:
        state = update_advective_boundaries(
            state, geoms, topo, out_faces, char_vel, time_step
        )
        return balance_boundary_fluxes(state, geoms, topo, out_faces, tol)

    return hook
