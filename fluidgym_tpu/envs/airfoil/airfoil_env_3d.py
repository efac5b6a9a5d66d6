"""3D airfoil flow-separation control environment (MARL).

Mirrors ``/root/reference/src/fluidgym/envs/airfoil/airfoil_env_3d.py``:
``n_agents`` spanwise segments of the three upper-surface jets (agent per
segment), per-agent z-sensor planes, optional ``local_2d_obs`` policy-transfer
mode, per-slice lift-to-drag rewards (:409-458), zero-mean per-segment action
normalization (:383-407), and optional 3D initialization from a saved 2D
initial domain (:524-563).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.airfoil.airfoil_env_base import AirfoilEnvBase
from fluidgym_tpu.solver.boundaries import balance_boundary_fluxes
from fluidgym_tpu.types import EnvMode
from fluidgym_tpu.utils import data_utils

Array = jax.Array

# reference airfoil_env_3d.py:28-47
AIRFOIL_3D_DEFAULT_CONFIG = {
    "n_agents": 4,
    "reynolds_number": 3e3,
    "dt": 0.05,
    "adaptive_cfl": 0.8,
    "step_length": 0.25,
    "episode_length": 200,
    "attack_angle_deg": 10.0,
    "local_obs_window": 1,
    "use_marl": False,
    "local_reward_weight": 0.5,
    "local_2d_obs": False,
    "init_from_2d": True,
    "load_initial_domain": True,
    "load_domain_statistics": True,
    "randomize_initial_state": True,
    "enable_actions": True,
    "differentiable": False,
}


class AirfoilEnv3D(AirfoilEnvBase):
    """3D NACA 0012 with spanwise-segmented upper-surface jets."""

    _default_render_key: str = "x-y-vorticity"
    _n_sensors_per_agent: int = 1
    _supports_marl: bool = True

    def __init__(
        self,
        n_agents: int,
        local_obs_window: int,
        local_reward_weight: float | None,
        local_2d_obs: bool = False,
        init_from_2d: bool = True,
        **kwargs,
    ):
        if n_agents < 1 or self._res_z % n_agents != 0:
            raise ValueError(
                "n_agents must be a positive integer that evenly divides the "
                "spanwise resolution."
            )
        if local_2d_obs and not kwargs.get("use_marl"):
            raise ValueError(
                "Local 2D observations are only supported in multi-agent mode."
            )
        self._local_2d_obs = bool(local_2d_obs)
        self._n_agents = int(n_agents)
        self._local_obs_window = int(local_obs_window)
        self._local_reward_weight = local_reward_weight
        self._init_from_2d = bool(init_from_2d)
        if init_from_2d:
            self._initial_domain_steps //= 2  # airfoil_env_3d.py:173-176
        if local_2d_obs:
            self._n_sensors_per_agent = 1
            self._local_obs_window = 1
        super().__init__(ndims=3, **kwargs)

    # ------------------------------------------------------------------
    @property
    def n_agents(self) -> int:
        return self._n_agents

    @property
    def _n_sensors_z(self) -> int:
        return self._n_agents * self._n_sensors_per_agent

    @property
    def _nz_per_agent(self) -> int:
        return self._res_z // self._n_agents

    def _get_action_space(self) -> spaces.Box:
        shape = ((self._n_jets,) if self._use_marl
                 else (self._n_agents, self._n_jets))
        return spaces.Box(low=-1.0, high=1.0, shape=shape, dtype=np.float32)

    def _get_observation_space(self) -> spaces.Dict:
        n = self._sensor_locations.shape[-1]
        if self._use_marl:
            if self._local_2d_obs:
                vel_shape = (n, 2)
                p_shape = (n,)
            else:
                vel_shape = (self._local_obs_window, self._n_sensors_per_agent,
                             self._ndims, n)
                p_shape = (self._local_obs_window, self._n_sensors_per_agent, n)
        else:
            vel_shape = (self._n_agents, self._n_sensors_per_agent,
                         self._ndims, n)
            p_shape = (self._n_agents, self._n_sensors_per_agent, n)
        return spaces.Dict({
            "velocity": spaces.Box(-np.inf, np.inf, vel_shape, np.float32),
            "pressure": spaces.Box(-np.inf, np.inf, p_shape, np.float32),
        })

    # ------------------------------------------------------------------
    # sensors (airfoil_env_3d.py:303-344)
    # ------------------------------------------------------------------
    def _get_sensor_locations(self) -> np.ndarray:
        s2d = self._get_sensor_locations_2d()
        grid2d = self._physical_locations_to_grid_coords(s2d)
        mask2d = self._airfoil_mask[0] if self._airfoil_mask.ndim == 3 else self._airfoil_mask
        keep = ~mask2d[grid2d[1], grid2d[0]]
        s2d = s2d[:, keep]

        sz = (np.linspace(-self.H / 2, self.H / 2, self._n_sensors_z + 1)[:-1]
              + self.H / (2 * self._n_sensors_z))
        x = np.repeat(s2d[0][:, None], self._n_sensors_z, axis=1)
        y = np.repeat(s2d[1][:, None], self._n_sensors_z, axis=1)
        z = np.repeat(sz[None, :], s2d.shape[1], axis=0)
        phys = np.stack([x, y, z], axis=0)  # (3, n_xy, n_z)
        grid = self._physical_locations_to_grid_coords(
            phys.reshape(3, -1)).reshape(3, -1, self._n_sensors_z)
        return np.stack([grid[0].T, grid[1].T, grid[2].T])  # (3, n_z, n_xy)

    def _additional_initialization(self) -> None:
        super()._additional_initialization()
        # 3D sensor point plan (see jet_cylinder_env_3d): keeps the
        # grid-sized resample plan out of the jitted step
        from fluidgym_tpu.envs.util.multiblock_resample import (
            make_multiblock_point_plan,
        )

        s2d = self._get_sensor_locations_2d()
        grid2d = self._physical_locations_to_grid_coords(s2d)
        mask2d = (self._airfoil_mask[0] if self._airfoil_mask.ndim == 3
                  else self._airfoil_mask)
        keep = ~mask2d[grid2d[1], grid2d[0]]
        s2d = s2d[:, keep]
        n_z = self._n_sensors_z
        sz = (np.linspace(-self.D / 2, self.D / 2, n_z + 1)[:-1]
              + self.D / (2 * n_z))
        xs = np.tile(s2d[0], (n_z, 1))
        ys = np.tile(s2d[1], (n_z, 1))
        zs = np.repeat(sz[:, None], s2d.shape[1], axis=1)
        pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
        self._sensor_sample3 = make_multiblock_point_plan(
            self._centers_np, pts)

    def _pure_global_obs(self, state: DomainState):
        """(extract_global_3d_obs, obs_extraction.py:60-151; reference view
        semantics preserved, including the (n_z, C, n_xy) reinterpretation)."""
        u = self._sensor_sample3(tuple(b.velocity for b in state.blocks))
        p = self._sensor_sample3(tuple(b.pressure for b in state.blocks))
        nspa = self._n_sensors_per_agent
        vd = 2 if self._local_2d_obs else 3
        uv = u[:vd]  # (vd, n) with n ordered (n_z, n_xy)
        uv = jnp.moveaxis(uv, 0, 1).reshape(self._n_sensors_z, vd, -1)
        uv = uv.reshape(self._n_agents, nspa, vd, -1)
        if self._local_2d_obs:
            uv = jnp.transpose(uv, (0, 1, 3, 2))
        pv = p.reshape(self._n_sensors_z, -1)
        pv = pv.reshape(self._n_agents, nspa, -1)
        return {"velocity": uv, "pressure": pv}

    def _pure_local_obs(self, state: DomainState):
        """(transform_global_to_local_obs_3d, obs_extraction.py:154-210)."""
        g = self._pure_global_obs(state)
        offset = self._local_obs_window // 2
        out = {}
        for k, v in g.items():
            shifted = jnp.roll(v, offset, axis=0)
            windows = []
            for i in range(self._n_agents):
                w = jnp.roll(shifted, -i, axis=0)[: self._local_obs_window]
                if self._local_2d_obs:
                    w = jnp.squeeze(w, axis=(0, 1))
                windows.append(w)
            out[k] = jnp.stack(windows, axis=0)
        return out

    def _get_local_obs(self):
        return self._pure_local_obs(self._state)

    # ------------------------------------------------------------------
    # actions (airfoil_env_3d.py:383-407)
    # ------------------------------------------------------------------
    def _pure_apply_action(self, state: DomainState, control: Array) -> DomainState:
        a = jnp.reshape(control, (self._n_agents, self._n_jets))
        v = a - jnp.mean(a, axis=1, keepdims=True)
        max_v = jnp.max(jnp.abs(v), axis=1, keepdims=True)
        v = jnp.where(max_v > 1.0, v / max_v, v)
        v = jnp.repeat(v, self._nz_per_agent, axis=0)   # (res_z, n_jets)
        mult = v @ self._jet_masks                       # (res_z, nx)
        base = self._top_base_profile                    # (3, nz, 1, nx)
        profile = jnp.concatenate(
            [base[:2] * mult[None, :, None, :], base[2:]], axis=0)
        b, f = self._airfoil_top_block_idx, 2
        blk = state.blocks[b]
        faces = list(blk.faces)
        faces[f] = replace(faces[f], velocity=profile.astype(
            faces[f].velocity.dtype))
        state = state.replace_block(b, replace(blk, faces=tuple(faces)))
        free = self._out_faces + ((b, f),)
        return balance_boundary_fluxes(state, self._geoms, self._topo, free)

    @property
    def _control_shape(self) -> tuple[int, ...]:
        return (self._n_agents, self._n_jets)

    # ------------------------------------------------------------------
    # rewards (airfoil_env_3d.py:409-458)
    # ------------------------------------------------------------------
    def _pure_step(self, carry, action: Array):
        (dstate, last_control), obs, _, info = super()._pure_step(
            carry, jnp.reshape(action, (self._n_agents, self._n_jets)))
        all_cds = info.pop("drag")   # per-z-slice (Z,)
        all_cls = info.pop("lift")
        cd = jnp.sum(all_cds) / self.D
        cl = jnp.sum(all_cls) / self.D
        reward = (cl / cd) - self._cl_cd_ref
        info["drag"] = cd
        info["lift"] = cl
        info["all_cds"] = all_cds
        info["all_cls"] = all_cls
        return (dstate, last_control), obs, reward, info

    def _pure_step_marl(self, carry, actions: Array):
        a = jnp.broadcast_to(jnp.reshape(actions, (-1, self._n_jets)),
                             (self._n_agents, self._n_jets))
        carry, _, global_reward, info = self._pure_step(carry, a)
        local_obs = self._pure_local_obs(carry[0])
        all_cds = info.pop("all_cds")
        all_cls = info.pop("all_cls")
        seg = self.D / self._n_agents
        local_cd = all_cds.reshape(self._n_agents, -1).sum(axis=1) / seg
        local_cl = all_cls.reshape(self._n_agents, -1).sum(axis=1) / seg
        local_rewards = (local_cl / local_cd) - self._cl_cd_ref
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

    # ------------------------------------------------------------------
    # rendering (airfoil_env_3d.py:460-522)
    # ------------------------------------------------------------------
    # iso levels per Reynolds number (airfoil_env_3d.py:21-25)
    VORTICITY_RENDER_LEVELS = {1000: 2.0, 3000: 3.5, 5000: 4.5}

    def _get_render_data(self, render_3d: bool, output_path=None):
        data = super()._get_render_data(render_3d, output_path)
        if render_3d:
            from fluidgym_tpu.envs.util.visualization import render_3d_iso

            u = np.asarray(jax.device_get(self.get_velocity()))
            vort = np.asarray(jax.device_get(self.get_vorticity()))
            curl = np.abs(vort).transpose(2, 1, 0)
            umag = np.linalg.norm(u, axis=0).transpose(2, 1, 0)
            # clean top/bottom boundary noise (airfoil_env_3d.py:490-492)
            curl[:, :15, :] = 0.0
            curl[:, -15:, :] = 0.0
            out = None
            if output_path is not None:
                out = output_path / f"vorticity_{self._n_episodes}_{self._n_steps}.png"
            iso = self.VORTICITY_RENDER_LEVELS.get(
                int(self._reynolds_number), 3.5)
            data["3d_vorticity"] = render_3d_iso(
                iso_field=curl, iso=[iso], color_field=umag,
                color_range=(0.0, float(umag.max()) or 1.0),
                output_path=out,
                extent=((-1.5, self.L), (-self.H / 2, self.H / 2),
                        (-self.D / 2, self.D / 2)),
                view_kwargs={"elev": 10, "azim": 60},
            )
        return data

    # ------------------------------------------------------------------
    # 2D warm start (airfoil_env_3d.py:524-563)
    # ------------------------------------------------------------------
    def _get_domain(self):
        topo, geoms, state = super()._get_domain()
        if not self._init_from_2d:
            return topo, geoms, state
        try:
            state = self._apply_2d_initial_state(state)
        except FileNotFoundError:
            self._logger.warning(
                "2D initial domain not found on disk; starting the 3D flow "
                "from the uniform initial state instead."
            )
        return topo, geoms, state

    def _apply_2d_initial_state(self, state: DomainState) -> DomainState:
        """Broadcast a saved 2D initial domain's velocity over the span."""
        from fluidgym_tpu.core.domain_io import load_domain

        idx = int(self._np_rng.integers(0, 10)) if hasattr(self, "_np_rng") else 0
        # the reference reuses the Re3000 2D shedding states for all 3D
        # Reynolds numbers (airfoil_env_3d.py:581-585)
        two_d_id = f"airfoil_2D_Re{int(min(self._reynolds_number, 3000))}"
        path = (data_utils.initial_domain_dir(two_d_id)
                / f"{EnvMode.TRAIN.value}_{idx:02d}")
        _, _, state_2d = load_domain(path, dtype=self._dtype)
        for b in range(len(state.blocks)):
            blk = state.blocks[b]
            u2 = state_2d.blocks[b].velocity  # (2, ny, nx)
            if u2.shape != blk.velocity[:2, 0].shape:
                self._logger.warning(
                    "2D/3D shape mismatch for block %d; skipping 2D init.", b)
                return state
            u3 = jnp.zeros_like(blk.velocity)
            u3 = u3.at[:2].set(jnp.broadcast_to(
                u2[:, None], (2,) + blk.velocity.shape[1:]))
            state = state.replace_block(b, replace(blk, velocity=u3))
        return state
