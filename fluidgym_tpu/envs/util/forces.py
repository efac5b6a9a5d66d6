"""Wall-force computation (drag/lift from viscous + pressure stress).

Re-implements the reference force utilities
(``/root/reference/src/fluidgym/envs/util/forces.py:12-377``) in JAX:
wall distances/normals from boundary vertex segments, boundary field
collection across the blocks surrounding a body, and stress-integration
``F = sum (2 nu S - p I) n dA`` with normal derivatives from the
wall-adjacent cells and tangential derivatives from neighboring wall cells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = [
    "wall_distance_from_vertices",
    "compute_forces_2d",
    "compute_forces_3d",
]


def wall_distance_from_vertices(vc: np.ndarray, centers: np.ndarray):
    """Distances of wall-adjacent cell centers to the wall and inward unit
    normals (reference forces.py:12-39).  ``vc (2, N+1)`` wall vertex line,
    ``centers (2, N)`` adjacent cell centers.  Host-side (static geometry)."""
    v0, v1 = vc[:, :-1], vc[:, 1:]
    e = v1 - v0
    eps = 1e-20
    t = e / (np.linalg.norm(e, axis=0, keepdims=True) + eps)
    n = np.stack([t[1], -t[0]], axis=0)
    m = 0.5 * (v0 + v1)
    d = np.abs(((centers - m) * n).sum(axis=0))
    d = np.maximum(d, eps)
    return d, -n  # normals flipped to point into the fluid


def compute_forces_2d(
    u_cell: Array,
    u_boundary: Array,
    p_cell: Array,
    wall_normals: Array,
    tangent_lengths: Array,
    wall_distances: Array,
    wall_face_lengths: Array,
    viscosity: Array,
) -> Array:
    """Total (Fx, Fy) on a closed 2D wall (reference forces.py:193-276).

    All per-wall-cell arrays are laid out along one closed loop of N cells.
    """
    wall_tangents = jnp.stack([wall_normals[1], -wall_normals[0]], axis=0)
    u_left = jnp.roll(u_cell, -1, axis=1)
    u_right = jnp.roll(u_cell, 1, axis=1)

    du_dn = (u_cell[0] - u_boundary[0]) / wall_distances
    dv_dn = (u_cell[1] - u_boundary[1]) / wall_distances
    du_dt = (u_right[0] - u_left[0]) / (2 * tangent_lengths)
    dv_dt = (u_right[1] - u_left[1]) / (2 * tangent_lengths)

    du_dx = du_dn * wall_normals[0] + du_dt * wall_tangents[0]
    du_dy = du_dn * wall_normals[1] + du_dt * wall_tangents[1]
    dv_dx = dv_dn * wall_normals[0] + dv_dt * wall_tangents[0]
    dv_dy = dv_dn * wall_normals[1] + dv_dt * wall_tangents[1]

    G = jnp.stack(
        [jnp.stack([du_dx, du_dy], axis=-1), jnp.stack([dv_dx, dv_dy], axis=-1)],
        axis=-2,
    )  # (N, 2, 2)
    S = 0.5 * (G + jnp.swapaxes(G, -1, -2))
    stress = 2 * viscosity * S - p_cell[:, None, None] * jnp.eye(2, dtype=S.dtype)
    traction = jnp.einsum("nij,jn->ni", stress, wall_normals)  # (N, 2)
    force = traction * wall_face_lengths[:, None]
    return jnp.sum(force, axis=0)


def compute_forces_3d(
    u_cell: Array,
    u_boundary: Array,
    p_cell: Array,
    wall_normals: Array,
    tangent_lengths: Array,
    wall_distances: Array,
    wall_face_areas: Array,
    viscosity: Array,
) -> Array:
    """Per-z-slice (Fx, Fy) on an extruded wall (reference forces.py:278-377).

    ``u_cell (3, Z, N)``, ``u_boundary (3, Z, N)``, ``p_cell (Z, N)``;
    normals/distances/lengths per wall cell ``(N,)``; returns ``(2, Z)``.
    """
    wall_tangents = jnp.stack([wall_normals[1], -wall_normals[0]], axis=0)
    u_left = jnp.roll(u_cell, -1, axis=-1)
    u_right = jnp.roll(u_cell, 1, axis=-1)

    du_dn = (u_cell[0] - u_boundary[0]) / wall_distances
    dv_dn = (u_cell[1] - u_boundary[1]) / wall_distances
    du_dt = (u_right[0] - u_left[0]) / (2 * tangent_lengths)
    dv_dt = (u_right[1] - u_left[1]) / (2 * tangent_lengths)

    du_dx = du_dn * wall_normals[0] + du_dt * wall_tangents[0]
    du_dy = du_dn * wall_normals[1] + du_dt * wall_tangents[1]
    dv_dx = dv_dn * wall_normals[0] + dv_dt * wall_tangents[0]
    dv_dy = dv_dn * wall_normals[1] + dv_dt * wall_tangents[1]

    G = jnp.stack(
        [jnp.stack([du_dx, du_dy], axis=-1), jnp.stack([dv_dx, dv_dy], axis=-1)],
        axis=-2,
    )  # (Z, N, 2, 2)
    S = 0.5 * (G + jnp.swapaxes(G, -1, -2))
    stress = 2 * viscosity * S - p_cell[..., None, None] * jnp.eye(2, dtype=S.dtype)
    traction = jnp.einsum("znij,jn->zni", stress, wall_normals)  # (Z, N, 2)
    force = traction * wall_face_areas[None, :, None]
    return jnp.sum(force, axis=1).T  # (2, Z)
