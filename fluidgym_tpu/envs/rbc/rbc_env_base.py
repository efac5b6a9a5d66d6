"""Rayleigh-Benard Convection (RBC) environment base class.

TPU-native re-expression of the reference
(``/root/reference/src/fluidgym/envs/rbc/rbc_env_base.py:22-704``):

* single orthogonal block, wall-refined y-grid, periodic x (and z);
* temperature as passive scalar channel 0 with Dirichlet hot/cold plates;
* Boussinesq buoyancy via a PRE_VELOCITY_SETUP hook that sets the velocity
  source to ``T * buoyancy_factor`` in y (rbc_env_base.py:280-304);
* nu = sqrt(Pr/Ra), kappa = 1/sqrt(Ra*Pr) (rbc_env_base.py:181-186);
* orthogonal solver preset: adaptive substeps, 2 correctors, pressure tol
  1e-5, FD corrector, return-best-result (rbc_env_base.py:306-329);
* Nusselt number Nu = 1 + sqrt(Ra*Pr) <u_y T>_vol and reward nu_ref - Nu
  (rbc_env_base.py:491-595);
* domain randomization by symmetry ops (flip/translate/noise) plus a 1-2 time
  unit burn-in (rbc_env_base.py:336-397).

References: Vignon et al. 2023 (doi:10.1063/5.0153181), Vasanth et al. 2024
(doi:10.1007/s10494-024-00619-2).
"""

from __future__ import annotations

from abc import abstractmethod
from dataclasses import replace
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import DomainBuilder, DomainState
from fluidgym_tpu.envs.fluid_env import FluidEnv
from fluidgym_tpu.envs.util.resample import make_rectilinear_plan
from fluidgym_tpu.solver.piso import ADAPTIVE, Hooks, SimConfig

Array = jax.Array


class RBCEnvBase(FluidEnv):
    """Abstract base class for RBC environments (2D and 3D)."""

    _default_render_key: str = "temperature"
    _supports_marl = True

    _T_cold: float = 0.0
    _T_hot: float = 1.0
    _heater_limit: float = 0.75
    _n_sensors_y: int = 8
    _n_sensors_per_heater: int = 4
    _resolution_scale_y: float = 2.0
    _non_uniform_grid_base: float = 1.02
    _H: float = 1.0
    _buoyancy_factor: float = 1.0
    _action_range: tuple[float, float] = (-1.0, 1.0)
    _observation_range: tuple[float, float] = (-2.5, 2.5)
    _metrics: list[str] = ["nusselt"]
    _initial_domain_restart = True

    def __init__(
        self,
        rayleigh_number: float,
        prandtl_number: float,
        n_heaters: int,
        resolution: int,
        adaptive_cfl: float,
        dt: float,
        step_length: float,
        episode_length: int,
        local_obs_window: int,
        local_reward_weight: float | None,
        uniform_grid: bool,
        aspect_ratio: float,
        use_marl: bool,
        dtype=None,
        load_initial_domain: bool = True,
        load_domain_statistics: bool = True,
        randomize_initial_state: bool = True,
        enable_actions: bool = True,
        differentiable: bool = False,
    ):
        self._rayleigh_number = float(rayleigh_number)
        self._prandtl_number = float(prandtl_number)
        self._heater_width = int(resolution)
        self._n_heaters = int(n_heaters)
        self._local_reward_weight = local_reward_weight
        self._local_obs_window = int(local_obs_window)
        self._uniform_grid = bool(uniform_grid)

        self._aspect_ratio = float(aspect_ratio) * np.pi
        self._x = int(resolution * n_heaters)
        self._y = round(self._resolution_scale_y * self._x / self._aspect_ratio)
        self._L = self._H * self._aspect_ratio
        self._kinematic_viscosity = (prandtl_number / rayleigh_number) ** 0.5
        self._thermal_diffusivity = (rayleigh_number * prandtl_number) ** -0.5

        super().__init__(
            dt=dt,
            adaptive_cfl=adaptive_cfl,
            step_length=step_length,
            episode_length=episode_length,
            ndims=self._ndims,
            dtype=dtype,
            use_marl=use_marl,
            load_initial_domain=load_initial_domain,
            load_domain_statistics=load_domain_statistics,
            randomize_initial_state=randomize_initial_state,
            enable_actions=enable_actions,
            differentiable=differentiable,
        )

        self._sensor_locations = self._get_sensor_locations()

    # ------------------------------------------------------------------
    # domain construction (reference rbc_env_base.py:190-278)
    # ------------------------------------------------------------------
    def _make_vertex_grid(self) -> np.ndarray:
        grid = geo.make_wall_refined_ortho_grid(
            self._x,
            self._y,
            corner_lower=(0.0, -self._H / 2),
            corner_upper=(self._L, self._H / 2),
            wall_refinement=("-y", "+y"),
            base=1.0 if self._uniform_grid else self._non_uniform_grid_base,
        )
        if self._ndims == 3:
            grid = geo.extrude_grid_z(
                grid, res_z=self._x, start_z=0.0, end_z=self._L,
                weights_z=None, exp_base=1,
            )
        return grid

    def _get_domain(self):
        if self._np_rng is None:
            raise RuntimeError("Environment must be seeded before domain creation.")
        grid = self._make_vertex_grid()
        dom = DomainBuilder(
            ndims=self._ndims,
            viscosity=self._kinematic_viscosity,
            scalar_channels=1,
            name="RBCDomain",
            dtype=self._dtype,
        )
        dom.set_scalar_diffusivity(self._thermal_diffusivity)
        block = dom.create_block(grid, name="RBCBlock")
        self._vertex_coords_cache = [grid]

        # hot bottom / cold top plates; x (and z) periodic by default
        block.close_boundary("-y", scalar=self._T_hot)
        block.close_boundary("+y", scalar=self._T_cold)

        # linear conduction profile + perturbation (rbc_env_base.py:229-267)
        grad = np.linspace(self._T_hot, self._T_cold, self._y)
        if self._ndims == 2:
            T0 = np.broadcast_to(grad[:, None], (self._y, self._x))
        else:
            T0 = np.broadcast_to(grad[None, :, None], (self._x, self._y, self._x))
        T0 = T0 + self._np_rng.normal(0.0, 1.0, T0.shape) * 0.1 * (
            self._T_hot - self._T_cold
        )
        T0 = np.clip(T0, self._T_cold, self._T_hot)
        block.set_scalar(T0[None])

        u0 = self._np_rng.normal(0.0, 1.0, (self._ndims, *block.shape)) * 0.05
        block.set_velocity(u0)

        # buoyancy hook rewrites the source every substep; materialize it now
        # so the state pytree structure is loop-invariant
        block.set_velocity_source(np.zeros((self._ndims, *block.shape)))

        return dom.build()

    def _get_prep_fn(self) -> Hooks:
        """Boussinesq buoyancy hook (rbc_env_base.py:280-304)."""
        buoyancy = self._buoyancy_factor
        ndims = self._ndims

        def buoyancy_fn(state: DomainState, **kw) -> DomainState:
            blk = state.blocks[0]
            T = blk.scalar[0]
            zero = jnp.zeros_like(T)
            if ndims == 2:
                src = jnp.stack([zero, T * buoyancy], axis=0)
            else:
                src = jnp.stack([zero, T * buoyancy, zero], axis=0)
            return state.replace_block(0, replace(blk, velocity_source=src))

        return {"PRE_VELOCITY_SETUP": (buoyancy_fn,)}

    def _get_simulation(self) -> SimConfig:
        """Reference solver preset (rbc_env_base.py:306-329)."""
        return SimConfig(
            dt=self._dt,
            substeps=ADAPTIVE,
            adaptive_cfl=self._adaptive_cfl,
            corrector_steps=2,
            pressure_tol=1e-5,
            pressure_return_best_result=True,
            velocity_corrector="FD",
            non_orthogonal=False,
            differentiable=self._differentiable,
            # cold pressure starts: warm+deflated starts destabilized the
            # periodic single-block configs (RBC blow-ups within ~200 steps
            # on some seeds; see VALIDATION.md), and their measured win here
            # was within 5% anyway -- the multi-block curvilinear families
            # (cylinder/airfoil) keep the warm path where it is validated
            # and worth 3-4x
        )

    def _additional_initialization(self) -> None:
        # gather-based resampling plan to the render grid (replaces the
        # reference's scatter splat; exact for this rectilinear block) --
        # built from env params, not device-held centers (no host sync)
        self._resample_plan = make_rectilinear_plan(
            self._make_vertex_grid(), self.render_shape[: self._ndims]
        )

    # ------------------------------------------------------------------
    # randomization (rbc_env_base.py:336-397)
    # ------------------------------------------------------------------
    def _randomize_domain(self) -> None:
        blk = self._state.blocks[0]
        T = blk.scalar
        u = blk.velocity
        rng = self._np_rng

        if rng.uniform() > 0.5:  # flip x
            T = jnp.flip(T, axis=-1)
            u = jnp.flip(u, axis=-1)
            u = u.at[0].multiply(-1.0)
        if self._ndims == 3 and rng.uniform() > 0.5:  # flip z
            T = jnp.flip(T, axis=-3)
            u = jnp.flip(u, axis=-3)
            u = u.at[2].multiply(-1.0)

        x_shift = int(rng.integers(0, self._x))
        T = jnp.roll(T, x_shift, axis=-1)
        u = jnp.roll(u, x_shift, axis=-1)
        if self._ndims == 3:
            z_shift = int(rng.integers(0, self._x))
            T = jnp.roll(T, z_shift, axis=-3)
            u = jnp.roll(u, z_shift, axis=-3)

        T = T + jnp.asarray(rng.normal(0.0, 1.0, T.shape) * 0.05, T.dtype)
        T = jnp.clip(T, self._T_cold, self._T_hot)
        u = u + jnp.asarray(rng.normal(0.0, 1.0, u.shape) * 0.05, u.dtype)

        self._state = self._state.replace_block(0, replace(blk, scalar=T, velocity=u))

        sim_time = rng.uniform(1.0, 2.0)
        for _ in range(int(sim_time / self._dt)):
            self._run_single_step()

    # ------------------------------------------------------------------
    # field access / metrics
    # ------------------------------------------------------------------
    @property
    def render_shape(self) -> tuple[int, ...]:
        nx = self._n_heaters * 20
        height = round(nx / self._aspect_ratio)
        return (nx, height, nx)

    @property
    def nu_ref(self) -> float:
        """Reference Nusselt number for reward normalization
        (rbc_env_base.py:408-416)."""
        if "nusselt" in self._metrics_stats:
            s = self._metrics_stats["nusselt"]
            return s.p50 if self._ndims == 2 else s.mean
        return 0.0

    @property
    def n_agents(self) -> int:
        if self._use_marl:
            return self._n_heaters if self._ndims == 2 else self._n_heaters**2
        return 1

    @property
    def _n_sensors_x(self) -> int:
        return self._n_heaters * self._n_sensors_per_heater

    @abstractmethod
    def _get_sensor_locations(self) -> np.ndarray: ...

    @abstractmethod
    def _pure_apply_action(self, state: DomainState, action: Array) -> DomainState: ...

    @abstractmethod
    def _pure_global_obs(self, state: DomainState) -> dict[str, Array]: ...

    @abstractmethod
    def _pure_local_rewards(self, state: DomainState) -> Array: ...

    # stateful wrappers around the pure protocol -------------------------
    def _apply_action(self, action: Array) -> None:
        self._state = self._pure_apply_action(self._state, jnp.asarray(action, self._dtype))

    def _get_global_obs(self) -> dict[str, Array]:
        return self._pure_global_obs(self._state)

    def _get_local_obs(self) -> dict[str, Array]:
        return self._pure_local_obs(self._state)

    def _get_local_rewards(self) -> Array:
        return self._pure_local_rewards(self._state)

    def _get_sensor_locations_2d(self) -> np.ndarray:
        """Sensor pixel grid on the render image (rbc_env_base.py:445-470)."""
        nx, ny = self.render_shape[:-1]
        sx = np.linspace(0, nx, self._n_sensors_x + 1)[:-1] + nx / (2 * self._n_sensors_x)
        sy = np.linspace(0, ny, self._n_sensors_y + 1)[:-1] + ny / (2 * self._n_sensors_y)
        gx, gy = np.meshgrid(sx, sy, indexing="ij")
        return np.stack([gx, gy], axis=-1).reshape(-1, 2).T.round().astype(np.int32)

    def get_temperature(self) -> Array:
        """Temperature resampled to the render grid (rbc_env_base.py:472-489)."""
        return self._resample_plan(self._state.blocks[0].scalar[0])

    def get_velocity(self) -> Array:
        return self._resample_plan(self._state.blocks[0].velocity)

    def get_pressure(self) -> Array:
        return self._resample_plan(self._state.blocks[0].pressure)

    def _pure_nusselt(self, state: DomainState) -> Array:
        blk = state.blocks[0]
        return self._compute_nusselt(
            T=blk.scalar[0][None], u_y=blk.velocity[1][None],
            cell_size=self._geoms[0].det,
        )

    def _compute_nusselt(self, T: Array, u_y: Array, cell_size: Array) -> Array:
        """Nu = 1 + sqrt(Ra Pr) <u_y T>_vol (rbc_env_base.py:491-513)."""
        is_batched = T.ndim == self._ndims + 1
        dims = tuple(range(1, self._ndims + 1)) if is_batched else tuple(range(self._ndims))
        if is_batched:
            cell_size = cell_size[None]
        mean_uyT = jnp.sum(u_y * T * cell_size, axis=dims) / jnp.sum(cell_size, axis=dims)
        return 1.0 + jnp.sqrt(
            jnp.asarray(self._rayleigh_number * self._prandtl_number, T.dtype)
        ) * mean_uyT

    def compute_global_nusselt(self) -> Array:
        return self._pure_nusselt(self._state)

    # ------------------------------------------------------------------
    # stepping -- all device work happens in one fused, jitted pure step
    # ------------------------------------------------------------------
    def _pure_step(self, state: DomainState, action: Array):
        """Pure env step (rbc_env_base.py:579-595): apply control, run
        n_sim_steps of adaptive PISO, compute Nusselt, observations, reward."""
        from fluidgym_tpu.solver import piso

        if self._enable_actions:
            state = self._pure_apply_action(state, action)

        def body(s, _):
            s, si = piso.single_step_info(s, self._geoms, self._topo,
                                          self._cfg, self._hooks)
            return s, si

        state, sis = jax.lax.scan(body, state, None, length=self._n_sim_steps)
        nu = self._pure_nusselt(state)
        obs = self._pure_global_obs(state)
        reward = self.nu_ref - nu
        info = {"nusselt": nu[0]}
        info.update(piso.solver_info_dict(piso.combine_scan_infos(sis)))
        return state, obs, reward, info

    def _pure_step_marl(self, state: DomainState, actions: Array):
        """Pure MARL step (rbc_env_base.py:613-637).  The global observation
        of the inner step is unused and dead-code-eliminated by XLA."""
        state, _, global_reward, info = self._pure_step(state, actions)
        local_obs = self._pure_local_obs(state)
        if self._local_reward_weight > 0:
            local_rewards = self._pure_local_rewards(state)
        else:
            local_rewards = jnp.zeros((self.n_agents,), self._dtype)
        agent_rewards = (
            self._local_reward_weight * local_rewards
            + (1 - self._local_reward_weight) * global_reward
        )
        info["global_reward"] = global_reward
        return state, local_obs, agent_rewards, info

    def _jitted_marl_step(self):
        self._sync_jit_cache()
        if "marl_step" not in self._jit_cache:
            self._jit_cache["marl_step"] = jax.jit(self._pure_step_marl)
        return self._jit_cache["marl_step"]

    def _step_impl(self, action: Array):
        self._state, obs, reward, info = self._jitted_env_step()(self._state, action)
        return obs, reward, False, info

    def _step_marl_impl(self, actions: Array):
        if self._local_reward_weight is None:
            raise ValueError("local_reward_weight must be set for multi-agent step.")
        self._state, obs, rewards, info = self._jitted_marl_step()(
            self._state, actions
        )
        return obs, rewards, False, info

    # ------------------------------------------------------------------
    # rendering (rbc_env_base.py:541-577)
    # ------------------------------------------------------------------
    def _get_render_data(self, render_3d: bool, output_path: Path | None = None):
        T = np.asarray(jax.device_get(self.get_temperature()))
        lo, hi = self._T_cold, self._T_hot + self._heater_limit
        T = (T - lo) / (hi - lo)
        out: dict[str, np.ndarray] = {}
        if self._ndims == 2:
            img = self._format_render_data(T, v_min=0.0, v_max=1.0, cmap="rainbow")
            out["temperature"] = np.flipud(img)
        else:
            out["x-y-temperature"] = np.flipud(self._format_render_data(
                T[T.shape[0] // 2], 0.0, 1.0, "rainbow"))
            out["x-z-temperature"] = self._format_render_data(
                T[:, T.shape[1] // 2, :], 0.0, 1.0, "rainbow")
            out["y-z-temperature"] = self._format_render_data(
                T[:, :, T.shape[2] // 2], 0.0, 1.0, "rainbow").transpose(1, 0, 2)
        return out

    # ------------------------------------------------------------------
    # identifiers (rbc_env_base.py:597-611)
    # ------------------------------------------------------------------
    @property
    def id(self) -> str:
        return (
            f"RBC{self._ndims}d_Ra{self._rayleigh_number}_Pr{self._prandtl_number}"
            f"_NH{self._n_heaters}_HW{self._heater_width}"
        )

    @property
    def initial_domain_id(self) -> str:
        return (
            f"rbc_{self._ndims}d_Ra{self._rayleigh_number}_Pr{self._prandtl_number}"
            f"_NH{self._n_heaters}_HW{self._heater_width}"
        )

    # ------------------------------------------------------------------
    # action smoothing shared by 2D/3D (rbc_env_2d.py:210-250)
    # ------------------------------------------------------------------
    def _smooth_action_profile_1d(self, T_action: Array) -> Array:
        """Cubic blending across heater edges along the last axis; input is a
        per-heater value array (..., n_heaters) expanded to (..., x)."""
        hw = self._heater_width
        bw = round(hw * 0.1)

        def cubic(t, A, B):
            s = t * t * (3 - 2 * t)
            return (1 - s) * A + s * B

        T_left = jnp.roll(T_action, 1, axis=-1)
        T_right = jnp.roll(T_action, -1, axis=-1)
        x_idx = jnp.arange(self._x)
        seg = x_idx // hw
        pos = x_idx % hw
        T0 = jnp.take(T_left, seg, axis=-1)
        T1 = jnp.take(T_action, seg, axis=-1)
        T2 = jnp.take(T_right, seg, axis=-1)
        if bw == 0:
            return T1
        left = pos < bw
        right = pos >= hw - bw
        tL = jnp.clip(pos.astype(T_action.dtype) / bw + 0.5, 0.0, 1.0)
        tR = 1 - jnp.roll(tL, hw - bw + 1)
        TL = cubic(tL, T0, T1)
        TR = cubic(tR, T1, T2)
        return jnp.where(left, TL, jnp.where(right, TR, T1))

    @staticmethod
    def _with_bottom_plate_scalar(state: DomainState, control: Array) -> DomainState:
        """Return a state with the heater temperature profile written into the
        -y face data (pure; reference FixedBoundary.setPassiveScalar)."""
        blk = state.blocks[0]
        faces = list(blk.faces)
        f = 2  # "-y"
        fd = faces[f]
        faces[f] = replace(
            fd, scalar=jnp.reshape(control, fd.scalar.shape).astype(fd.scalar.dtype)
        )
        return state.replace_block(0, replace(blk, faces=tuple(faces)))
