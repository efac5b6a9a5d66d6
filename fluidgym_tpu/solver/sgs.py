"""Subgrid-scale turbulence models and velocity-gradient operators.

TPU-native re-expression of the reference's Smagorinsky SGS kernel
(``SGSviscosityIncompressibleSmagorinsky``, PISO_multiblock_cuda.h:163) and
spatial velocity gradients (``ComputeSpatialVelocityGradients``,
PISO_multiblock_cuda.h:138): central differences in index space mapped to
physical space with ``M^-1``; one-sided at prescribed boundaries; CONNECTED/
PERIODIC neighbors resolved by halo/roll.

``nu_t = (C_s)^2 * det^(2/ndims) * |S|`` with ``|S| = sqrt(2 S:S)`` --
the filter width Delta is the cell volume^(1/ndims) (= det^(1/ndims)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidgym_tpu.core.domain import (
    BoundKind,
    DomainState,
    DomainTopo,
)
from fluidgym_tpu.solver.stencil import _face_slab, _neighbor_field

Array = jax.Array

__all__ = ["velocity_gradients", "smagorinsky_viscosity", "make_smagorinsky_hook"]


def velocity_gradients(
    state: DomainState, geoms, topo: DomainTopo
) -> tuple[Array, ...]:
    """Physical velocity gradient tensors ``G[i, j] = du_i/dx_j`` per block,
    shape ``(ndims, ndims, *s)``."""
    nd = topo.ndims
    us = tuple(b.velocity for b in state.blocks)
    out = []
    for b, (geom, btopo) in enumerate(zip(geoms, topo.blocks)):
        u = us[b]
        grads_idx = []
        for d in range(nd):
            f_lo, f_hi = 2 * d, 2 * d + 1
            val_n = _neighbor_field(us, b, f_lo, topo)
            val_p = _neighbor_field(us, b, f_hi, topo)
            fac = jnp.full_like(u, 0.5)
            if btopo.faces[f_lo].kind == BoundKind.FIXED:
                slab = (slice(None),) + _face_slab(u.ndim - 1, f_lo)
                # one-sided toward the wall value (half-cell distance)
                bval = state.blocks[b].faces[f_lo].velocity
                val_n = val_n.at[slab].set(2 * bval - u[slab])
            if btopo.faces[f_hi].kind == BoundKind.FIXED:
                slab = (slice(None),) + _face_slab(u.ndim - 1, f_hi)
                bval = state.blocks[b].faces[f_hi].velocity
                val_p = val_p.at[slab].set(2 * bval - u[slab])
            grads_idx.append((val_p - val_n) * fac)  # du/dxi_d, (ndims, *s)
        g_idx = jnp.stack(grads_idx, axis=1)  # (i, d, *s)
        if btopo.orthogonal:
            G = g_idx * geom.minv_diag[None]  # du_i/dx_d = du_i/dxi_d * 1/h_d
        else:
            # du_i/dx_j = sum_k Minv[k, j] du_i/dxi_k
            G = jnp.einsum("...kj,ik...->ij...", geom.minv, g_idx)
        out.append(G)
    return tuple(out)


def smagorinsky_viscosity(
    state: DomainState, geoms, topo: DomainTopo, c_smag: float
) -> tuple[Array, ...]:
    """Per-block Smagorinsky eddy viscosity ``(C_s Delta)^2 |S|``."""
    nd = topo.ndims
    Gs = velocity_gradients(state, geoms, topo)
    out = []
    for geom, G in zip(geoms, Gs):
        S = 0.5 * (G + jnp.swapaxes(G, 0, 1))
        S_mag = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(0, 1)))
        delta2 = geom.det ** (2.0 / nd)
        out.append((c_smag**2) * delta2 * S_mag)
    return tuple(out)


def make_smagorinsky_hook(geoms, topo: DomainTopo, c_smag: float,
                          van_driest_sqr: tuple[Array, ...] | None = None):
    """PRE hook setting per-block viscosity = nu_base + nu_SGS [* VanDriest^2]
    (reference add_block_SGS_viscosity, tcf_env.py:453-476)."""
    from dataclasses import replace

    def hook(state: DomainState, **kw) -> DomainState:
        nu_t = smagorinsky_viscosity(state, geoms, topo, c_smag)
        for b in range(len(topo.blocks)):
            visc = nu_t[b]
            if van_driest_sqr is not None:
                visc = visc * van_driest_sqr[b]
            visc = visc + state.viscosity
            state = state.replace_block(
                b, replace(state.blocks[b], viscosity=visc))
        return state

    return hook
