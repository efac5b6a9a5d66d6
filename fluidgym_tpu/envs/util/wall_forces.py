"""Shared wall-force machinery for body-fitted envs (cylinder, airfoil).

Mirrors the reference's ``collect_boundary_coords`` /
``collect_boundary_fields`` + force-integration pattern
(``/root/reference/src/fluidgym/envs/util/forces.py:42-190``): a body's wall
is described as an ordered loop of ``(block, face, cell_slice, flip)``
segments; static geometry (normals, distances, segment lengths) is prepared
host-side once, and per-step fields are gathered with pure JAX ops so the
drag/lift computation can live inside the jitted env step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.util.forces import (
    compute_forces_2d,
    compute_forces_3d,
    wall_distance_from_vertices,
)

Array = jax.Array

__all__ = ["WallForcesMixin"]


class WallForcesMixin:
    """Drag/lift from wall-stress integration around a closed body contour.

    Hosts expect: ``_wall_loop_spec()`` -> list of (block, face, cell_slice,
    flip); attributes ``_blocks_vertex_coords``, ``_geoms``, ``_ndims``,
    ``_dtype``, ``_viscosity``; and the properties ``_wall_dz`` (z extent per
    wall face, 3D only) and ``_force_scale`` (dynamic-pressure normalizer).
    """

    def _wall_loop_spec(self):  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def _wall_dz(self) -> float:  # pragma: no cover - abstract (3D only)
        raise NotImplementedError

    @property
    def _force_scale(self) -> float:  # pragma: no cover - abstract
        raise NotImplementedError

    def _prepare_drag_and_lift(self) -> None:
        """Static wall geometry: inward normals, wall distances, tangent and
        face lengths (reference collect_boundary_coords + preparation,
        cylinder_env_base.py:608-655 / airfoil_env_base.py:402-441)."""
        spec = self._wall_loop_spec()
        coords_list, centers_list = [], []
        for i, (b, f, sl, flip) in enumerate(spec):
            vc = np.asarray(self._blocks_vertex_coords[b])
            cc = np.asarray(jax.device_get(self._geoms[b].centers))
            if self._ndims == 3:  # take one z-slice of the wall line
                vc = vc[:2, 0]
                cc_line = cc[:2, 0]
            else:
                cc_line = cc
            bc = vc[sl] if self._ndims == 2 else vc[(slice(None),) + sl[1:]]
            cl = cc_line[sl] if self._ndims == 2 else cc_line[(slice(None),) + sl[1:]]
            if flip:
                bc = bc[..., ::-1]
                cl = cl[..., ::-1]
            if i != len(spec) - 1:
                bc = bc[..., :-1]
            coords_list.append(bc)
            centers_list.append(cl)
        cell_coords = np.concatenate(coords_list, axis=-1)   # (2, N+1)
        cell_centers = np.concatenate(centers_list, axis=-1)  # (2, N)

        cc_left = np.roll(cell_centers, -1, axis=-1)
        cc_right = np.roll(cell_centers, 1, axis=-1)
        self._tangent_lengths = jnp.asarray(
            np.sqrt(((cc_left - cc_right) ** 2).sum(axis=0)), self._dtype)

        d, n = wall_distance_from_vertices(cell_coords, cell_centers)
        self._wall_distances = jnp.asarray(d, self._dtype)
        self._wall_normals = jnp.asarray(n, self._dtype)
        xw, yw = cell_coords[0], cell_coords[1]
        self._wall_face_lengths = jnp.asarray(
            np.sqrt((xw[1:] - xw[:-1]) ** 2 + (yw[1:] - yw[:-1]) ** 2), self._dtype)

    def _collect_wall_fields(self, state: DomainState):
        """Per-wall-cell (u_cell, u_boundary, p_cell) around the body."""
        spec = self._wall_loop_spec()
        u_list, ub_list, p_list = [], [], []
        for b, f, sl, flip in spec:
            blk = state.blocks[b]
            u = blk.velocity[sl]          # (ndims, [Z,] N)
            p = blk.pressure[sl]
            ub = blk.faces[f].velocity
            # squeeze the face axis to match the wall line layout
            ub = jnp.squeeze(ub, axis=-1 if f // 2 == 0 else (-2 if f // 2 == 1 else -3))
            if flip:
                u = jnp.flip(u, axis=-1)
                p = jnp.flip(p, axis=-1)
                ub = jnp.flip(ub, axis=-1)
            u_list.append(u)
            ub_list.append(ub)
            p_list.append(p)
        return (jnp.concatenate(u_list, axis=-1),
                jnp.concatenate(ub_list, axis=-1),
                jnp.concatenate(p_list, axis=-1))

    def _pure_drag_lift(self, state: DomainState):
        """(cd, cl) per z-slice (scalars in 2D)."""
        u_cell, u_b, p_cell = self._collect_wall_fields(state)
        nu = jnp.asarray(self._viscosity, self._dtype)
        if self._ndims == 2:
            forces = compute_forces_2d(
                u_cell, u_b, p_cell, self._wall_normals, self._tangent_lengths,
                self._wall_distances, self._wall_face_lengths, nu)
        else:
            face_areas = self._wall_face_lengths * self._wall_dz
            forces = compute_forces_3d(
                u_cell, u_b, p_cell, self._wall_normals, self._tangent_lengths,
                self._wall_distances, face_areas, nu)
        scale = self._force_scale
        return forces[0] / scale, forces[1] / scale
