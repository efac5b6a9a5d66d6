"""3D cylinder flow with segmented jet actuation (MARL).

Mirrors ``/root/reference/src/fluidgym/envs/cylinder/jet_cylinder_env_3d.py``:
``n_jets`` independent z-segments of the top/bottom wall jets (agent per
jet), per-agent z-sensor planes of the 151 wake sensors, optional
``local_2d_obs`` mode for transferring 2D policies, per-agent drag/lift
rewards from z-slice force integration, and flux balancing over the jet +
outflow boundaries (:395-417).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.cylinder.cylinder_env_base import CylinderEnvBase
from fluidgym_tpu.envs.util.profiles import get_jet_profile
from fluidgym_tpu.solver.boundaries import balance_boundary_fluxes

Array = jax.Array

# reference jet_cylinder_env_3d.py:22-41
CYLINDER_JET_3D_DEFAULT_CONFIG = {
    "n_jets": 8,
    "reynolds_number": 1e2,
    "resolution": 24,
    "dt": 1e-2,
    "adaptive_cfl": 0.8,
    "step_length": 0.25,
    "lift_penalty": 1.0,
    "episode_length": 80,
    "local_obs_window": 3,
    "local_reward_weight": 0.8,
    "local_2d_obs": False,
    "use_marl": False,
    "load_initial_domain": True,
    "load_domain_statistics": True,
    "randomize_initial_state": True,
    "enable_actions": True,
    "differentiable": False,
}


class CylinderJetEnv3D(CylinderEnvBase):
    """3D cylinder with n_jets independently-controlled jet segments."""

    _default_render_key: str = "x-y-vorticity"
    _jet_angle: float = 10.0
    _n_sensors_per_agent: int = 2
    _supports_marl = True

    def __init__(
        self,
        n_jets: int,
        local_obs_window: int,
        local_reward_weight: float | None,
        local_2d_obs: bool = False,
        **kwargs,
    ):
        resolution = kwargs.get("resolution")
        if n_jets < 1 or resolution % n_jets != 0:
            raise ValueError(
                "n_jets must be a positive integer that evenly divides the "
                "angular resolution."
            )
        if local_2d_obs and not kwargs.get("use_marl"):
            raise ValueError(
                "Local 2D observations are only supported in multi-agent mode."
            )
        self._local_2d_obs = bool(local_2d_obs)
        self._n_jets = int(n_jets)
        self._local_obs_window = int(local_obs_window)
        self._local_reward_weight = local_reward_weight
        if local_2d_obs:
            self._n_sensors_per_agent = 1
            self._local_obs_window = 1
        super().__init__(ndims=3, **kwargs)

    # ------------------------------------------------------------------
    @property
    def n_agents(self) -> int:
        return self._n_jets if self._use_marl else 1

    @property
    def _n_sensors_z(self) -> int:
        return self._n_jets * self._n_sensors_per_agent

    @property
    def _control_shape(self) -> tuple[int, ...]:
        return (self._n_jets, 1)

    def _get_action_space(self) -> spaces.Box:
        shape = (1,) if self._use_marl else (self._n_jets, 1)
        return spaces.Box(low=-1.0, high=1.0, shape=shape, dtype=np.float32)

    def _get_observation_space(self) -> spaces.Dict:
        if self._use_marl:
            if self._local_2d_obs:
                vel_shape = (self._n_sensors_x_y, 2)
                p_shape = (self._n_sensors_x_y,)
            else:
                vel_shape = (self._local_obs_window, self._n_sensors_per_agent,
                             self._ndims, self._n_sensors_x_y)
                p_shape = (self._local_obs_window, self._n_sensors_per_agent,
                           self._n_sensors_x_y)
        else:
            vel_shape = (self._n_jets, self._n_sensors_per_agent, self._ndims,
                         self._n_sensors_x_y)
            p_shape = (self._n_jets, self._n_sensors_per_agent,
                       self._n_sensors_x_y)
        return spaces.Dict({
            "velocity": spaces.Box(-np.inf, np.inf, vel_shape, np.float32),
            "pressure": spaces.Box(-np.inf, np.inf, p_shape, np.float32),
        })

    # ------------------------------------------------------------------
    # sensors (jet_cylinder_env_3d.py:277-305)
    # ------------------------------------------------------------------
    def _get_sensor_locations(self) -> np.ndarray:
        s2d = self._get_sensor_locations_2d()
        sz = (np.linspace(-self.H / 2, self.H / 2, self._n_sensors_z + 1)[:-1]
              + self.H / (2 * self._n_sensors_z))
        x = np.repeat(s2d[0][:, None], self._n_sensors_z, axis=1)
        y = np.repeat(s2d[1][:, None], self._n_sensors_z, axis=1)
        z = np.repeat(sz[None, :], s2d.shape[1], axis=0)
        phys = np.stack([x, y, z], axis=0)  # (3, n_xy, n_z)
        grid = self._sensor_locations_to_grid_coords(
            phys.reshape(3, -1)).reshape(3, -1, self._n_sensors_z)
        return np.stack([grid[0].T, grid[1].T, grid[2].T])  # (3, n_z, n_xy)

    def _pure_global_obs(self, state: DomainState):
        """(extract_global_3d_obs, obs_extraction.py:60-150)."""
        u = self._sensor_sample3(tuple(b.velocity for b in state.blocks))
        p = self._sensor_sample3(tuple(b.pressure for b in state.blocks))
        nspa = self._n_sensors_per_agent
        vd = 2 if self._local_2d_obs else 3
        uv = u[:vd]  # (vd, n) with n ordered (n_z, n_xy)
        uv = jnp.moveaxis(uv, 0, 1).reshape(self._n_sensors_z, vd, -1)
        uv = uv.reshape(self._n_jets, nspa, vd, -1)
        if self._local_2d_obs:
            uv = jnp.transpose(uv, (0, 1, 3, 2))
        pv = p.reshape(self._n_sensors_z, -1)
        pv = pv.reshape(self._n_jets, nspa, -1)
        return {"velocity": uv, "pressure": pv}

    def _pure_local_obs(self, state: DomainState):
        """Circular per-agent windows over the jets (jet_cylinder_env_3d.py:316)."""
        g = self._pure_global_obs(state)
        offset = self._local_obs_window // 2
        out = {}
        for k, v in g.items():
            shifted = jnp.roll(v, offset, axis=0)
            windows = []
            for i in range(self._n_jets):
                w = jnp.roll(shifted, -i, axis=0)[: self._local_obs_window]
                if self._local_2d_obs:
                    w = jnp.squeeze(w, axis=(0, 1))
                windows.append(w)
            out[k] = jnp.stack(windows, axis=0)
        return out

    def _get_local_obs(self):
        return self._pure_local_obs(self._state)

    # ------------------------------------------------------------------
    # jets (jet_cylinder_env_3d.py:341-417)
    # ------------------------------------------------------------------
    def _additional_initialization(self) -> None:
        super()._additional_initialization()
        self._top_velocity, self._bottom_velocity, self._nz_per_agent = (
            self._get_boundary_velocities())
        # 3D sensor point plan (z-stacked 2D sensor cloud), ordered like
        # _sensor_locations (n_z-major) so the downstream reshapes hold;
        # gathering points directly keeps the grid-sized resample plan out
        # of the jitted step (its 360 MB of index constants exceeded the
        # remote compiler's request limit at angular resolution 48)
        from fluidgym_tpu.envs.util.multiblock_resample import (
            make_multiblock_point_plan,
        )

        s2d = self._get_sensor_locations_2d()
        n_z = self._n_sensors_z
        sz = (np.linspace(-self.H / 2, self.H / 2, n_z + 1)[:-1]
              + self.H / (2 * n_z))
        xs = np.tile(s2d[0], (n_z, 1))
        ys = np.tile(s2d[1], (n_z, 1))
        zs = np.repeat(sz[:, None], s2d.shape[1], axis=1)
        pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
        self._sensor_sample3 = make_multiblock_point_plan(
            self._centers_np, pts)

    def _get_boundary_velocities(self):
        def coords_to_velocities(line: np.ndarray, direction: str):
            centers = 0.5 * (line[:, :-1] + line[:, 1:])
            if direction == "top":
                angles = np.pi / 2 - np.arctan2(centers[1], centers[0])
            else:
                angles = -np.pi / 2 - np.arctan2(centers[1], centers[0])
            deg = np.rad2deg(angles)
            deg_abs = np.abs(deg).copy()
            deg_abs[deg_abs > self._jet_angle] = 0.0
            nz = np.where(deg_abs > 0.0)[0]
            min_idx, max_idx = nz[0] - 1, nz[-1] + 1
            profile = get_jet_profile(int(max_idx - min_idx + 1))
            velocities = np.zeros((3, centers.shape[1]))
            for i, mag in zip(range(min_idx, max_idx + 1), profile):
                a = np.deg2rad(deg[i])
                velocities[0, i] = mag * np.sin(a)
                velocities[1, i] = mag * np.cos(a)
            return velocities

        vcs = self._blocks_vertex_coords
        # z=0 slice of the wall vertex line; coords (3, nz+1, ny+1, nx+1)
        top_line = np.asarray(vcs[self._top_block_idx])[:2, 0, 0, :]
        bottom_line = np.asarray(vcs[self._bottom_block_idx])[:2, 0, -1, :]
        top_v = coords_to_velocities(top_line, "top")
        bottom_v = coords_to_velocities(bottom_line, "bottom")
        n_z = np.asarray(vcs[self._top_block_idx]).shape[1] - 1
        # face slab layout (3, nz, 1, nx)
        top = jnp.asarray(np.repeat(top_v[:, None, None, :], n_z, axis=1),
                          self._dtype)
        bottom = jnp.asarray(np.repeat(bottom_v[:, None, None, :], n_z, axis=1),
                             self._dtype)
        return top, bottom, n_z // self._n_jets

    def _pure_apply_action(self, state: DomainState, control: Array) -> DomainState:
        """Scale per-jet segments and rebalance fluxes
        (jet_cylinder_env_3d.py:395-417)."""
        a = jnp.repeat(jnp.reshape(control, (-1,)), self._nz_per_agent)
        a = a[None, :, None, None]  # broadcast over (C, nz, 1, nx)
        for b, f, base in ((self._top_block_idx, 2, self._top_velocity),
                           (self._bottom_block_idx, 3, self._bottom_velocity)):
            blk = state.blocks[b]
            faces = list(blk.faces)
            faces[f] = replace(faces[f], velocity=(base * a).astype(
                faces[f].velocity.dtype))
            state = state.replace_block(b, replace(blk, faces=tuple(faces)))
        free = ((self._top_block_idx, 2), (self._bottom_block_idx, 3),
                (self._vortex_street_block_idx, 1))
        return balance_boundary_fluxes(state, self._geoms, self._topo, free,
                                       tol=1e-7)

    # ------------------------------------------------------------------
    # rewards (jet_cylinder_env_3d.py:423-504)
    # ------------------------------------------------------------------
    def _pure_step(self, carry, action: Array):
        (dstate, last_control), obs, _, info = super()._pure_step(carry, action)
        all_cds = info.pop("drag")   # per-z-slice (Z,)
        all_cls = info.pop("lift")
        cd = jnp.sum(all_cds) / self.D
        cl = jnp.sum(all_cls) / self.D
        reward = self._cd_ref - cd - self._lift_penalty * jnp.abs(cl)
        info["drag"] = cd
        info["lift"] = cl
        info["all_cds"] = all_cds
        info["all_cls"] = all_cls
        return (dstate, last_control), obs, reward, info

    def _pure_step_marl(self, carry, actions: Array):
        carry, _, global_reward, info = self._pure_step(carry, actions)
        local_obs = self._pure_local_obs(carry[0])
        all_cds = info.pop("all_cds")
        all_cls = info.pop("all_cls")
        seg = self.D / self._n_jets
        local_cd = all_cds.reshape(self._n_jets, -1).sum(axis=1) / seg
        local_cl = all_cls.reshape(self._n_jets, -1).sum(axis=1) / seg
        local_rewards = (self._cd_ref - local_cd
                         - self._lift_penalty * jnp.abs(local_cl))
        agent_rewards = (self._local_reward_weight * local_rewards
                         + (1 - self._local_reward_weight) * global_reward)
        info["global_reward"] = global_reward
        return carry, local_obs, agent_rewards, info

    def _jitted_marl_step(self):
        self._sync_jit_cache()
        if "marl_step" not in self._jit_cache:
            self._jit_cache["marl_step"] = jax.jit(self._pure_step_marl)
        return self._jit_cache["marl_step"]

    def _step_marl_impl(self, actions: Array):
        if self._local_reward_weight is None:
            raise ValueError("local_reward_weight must be set for multi-agent step.")
        fn = self._jitted_marl_step()
        (self._state, self._last_control), obs, rewards, info = fn(
            (self._state, self._last_control), actions)
        return obs, rewards, False, info

    def _get_render_data(self, render_3d: bool, output_path=None):
        """Mid-plane slice always; vorticity-magnitude iso-surface when
        ``render_3d`` (reference jet_cylinder_env_3d 3d_vorticity render)."""
        import numpy as np

        data = super()._get_render_data(render_3d, output_path)
        if render_3d:
            from fluidgym_tpu.envs.util.visualization import render_3d_iso

            u = np.asarray(jax.device_get(self.get_velocity()))
            vort = np.asarray(jax.device_get(self.get_vorticity()))
            curl = np.abs(vort).transpose(2, 1, 0)  # (X, Y, Z)
            umag = np.linalg.norm(u, axis=0).transpose(2, 1, 0)
            out = None
            if output_path is not None:
                out = output_path / f"vorticity_{self._n_episodes}_{self._n_steps}.png"
            data["3d_vorticity"] = render_3d_iso(
                iso_field=curl, iso=[2.0], color_field=umag,
                color_range=(0.0, float(umag.max()) or 1.0),
                output_path=out,
                extent=((-2.0, self.L - 2.0), (-self.H / 2, self.H / 2),
                        (-self.D / 2, self.D / 2)),
                view_kwargs={"elev": 10, "azim": 60},
            )
        return data

    @property
    def id(self) -> str:
        return f"JetCylinder3D_Re{self._reynolds_number}"
