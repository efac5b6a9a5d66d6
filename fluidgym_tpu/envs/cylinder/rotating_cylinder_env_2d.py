"""2D cylinder flow with wall-rotation actuation.

Mirrors ``/root/reference/src/fluidgym/envs/cylinder/rotating_cylinder_env_2d.py``:
the action sets a tangential unit velocity on all four cylinder-wall faces,
scaled by the control (:130-177).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.cylinder.cylinder_env_base import CylinderEnvBase

Array = jax.Array

# reference rotating_cylinder_env_2d.py defaults (same schedule as jets)
CYLINDER_ROT_2D_DEFAULT_CONFIG = {
    "reynolds_number": 1e2,
    "resolution": 24,
    "dt": 1e-2,
    "adaptive_cfl": 0.8,
    "step_length": 0.25,
    "episode_length": 80,
    "lift_penalty": 1.0,
    "use_marl": False,
    "load_initial_domain": True,
    "load_domain_statistics": True,
    "randomize_initial_state": True,
    "enable_actions": True,
    "differentiable": False,
}


class CylinderRotEnv2D(CylinderEnvBase):
    """Flow around a rotating cylinder."""

    def __init__(self, **kwargs):
        super().__init__(ndims=2, **kwargs)

    def _additional_initialization(self) -> None:
        super()._additional_initialization()
        self._wall_velocities = self._get_boundary_velocities()

    def _get_boundary_velocities(self):
        """Tangential unit velocities on the four cylinder-wall faces
        (rotating_cylinder_env_2d.py:133-165)."""

        def coords_to_velocities(coords_boundary: np.ndarray):
            centers = 0.5 * (coords_boundary[:, :-1] + coords_boundary[:, 1:])
            theta = np.arctan2(centers[1], centers[0])
            return np.stack([np.sin(theta), -np.cos(theta)], axis=0)

        vcs = self._blocks_vertex_coords
        lines = {
            (self._left_block_idx, 1): np.asarray(vcs[self._left_block_idx])[:, :, -1],
            (self._top_block_idx, 2): np.asarray(vcs[self._top_block_idx])[:, 0, :],
            (self._right_block_idx, 0): np.asarray(vcs[self._right_block_idx])[:, :, 0],
            (self._bottom_block_idx, 3): np.asarray(vcs[self._bottom_block_idx])[:, -1, :],
        }
        out = {}
        for (b, f), line in lines.items():
            v = coords_to_velocities(line)
            if f // 2 == 0:  # x-face: slab (ndims, ny, 1)
                out[(b, f)] = jnp.asarray(v[:, :, None], self._dtype)
            else:            # y-face: slab (ndims, 1, nx)
                out[(b, f)] = jnp.asarray(v[:, None, :], self._dtype)
        return out

    def _pure_apply_action(self, state: DomainState, control: Array) -> DomainState:
        from dataclasses import replace

        c = jnp.reshape(control, ())
        for (b, f), base in self._wall_velocities.items():
            blk = state.blocks[b]
            faces = list(blk.faces)
            faces[f] = replace(faces[f], velocity=(base * c).astype(
                faces[f].velocity.dtype))
            state = state.replace_block(b, replace(blk, faces=tuple(faces)))
        return state

    @property
    def id(self) -> str:
        return f"RotatingCylinder{self._ndims}D_Re{self._reynolds_number}"
