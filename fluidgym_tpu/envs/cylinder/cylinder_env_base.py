"""Abstract base class for cylinder flow environments (von Karman vortex
street).

TPU-native re-expression of the reference
(``/root/reference/src/fluidgym/envs/cylinder/cylinder_env_base.py:36-869``):

* 5-block curvilinear O-grid + wake block (grid.py);
* parabolic inflow, convective outflow on the wake's +x face via the PRE hook
  (update_advective_boundaries + flux balancing, :277-301);
* solver preset: adaptive substeps, non-orthogonal corrections, pressure tol
  1e-5 (2D) / 5e-7 (3D), FD corrector, make_divergence_free at init
  (:303-332);
* 151 wake/ring sensors on the resampled uniform grid (:451-516);
* drag/lift from wall-stress integration around the cylinder (:616-698);
* reward ``cd_ref - cd - lift_penalty*|cl|`` with Rabault action smoothing
  ``c <- c + alpha*(a - c)`` per sim step (:741-776);
* domain randomization: field noise + a random number of uncontrolled steps
  to randomize the shedding phase (:364-404).

The env's pure step carries ``(DomainState, last_control)`` through a
``lax.scan`` over the sim steps, accumulating per-step drag/lift.
"""

from __future__ import annotations

from abc import abstractmethod
from dataclasses import replace
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.cylinder.grid import make_vortex_street_domain
from fluidgym_tpu.envs.fluid_env import FluidEnv, Stats
from fluidgym_tpu.envs.util.multiblock_resample import (
    make_multiblock_plan,
    make_multiblock_point_plan,
)
from fluidgym_tpu.envs.util.wall_forces import WallForcesMixin
from fluidgym_tpu.solver.boundaries import make_convective_outflow_hook
from fluidgym_tpu.solver import piso
from fluidgym_tpu.solver.piso import (
    ADAPTIVE,
    Hooks,
    SimConfig,
    jit_make_divergence_free,
    single_step,
)

Array = jax.Array

VORTICITY_RENDER_RANGE = (-10, 10)


class CylinderEnvBase(WallForcesMixin, FluidEnv):
    """Abstract base class for cylinder flow environments."""

    _default_render_key: str = "vorticity"
    _action_smoothing_alpha: float = 0.1

    H: float = 4.1
    L: float = 22.0
    D: float = 4.0  # z extent for 3D
    cylinder_diameter: float = 1.0
    _U_mean: float = 1.0
    cylinder_offset_y: float = 0.05
    _n_sensors_x_y: int = 151
    _vortex_street_refinement_base: float = 0.95
    _metrics: list[str] = ["drag", "lift"]
    _vorticity_stats: Stats | None = None
    _initial_domain_steps = 400
    _initial_domain_restart = False

    def __init__(
        self,
        reynolds_number: float,
        resolution: int,
        dt: float,
        adaptive_cfl: float,
        step_length: float,
        episode_length: int,
        ndims: int,
        lift_penalty: float,
        use_marl: bool,
        dtype=None,
        debug: bool = False,
        load_initial_domain: bool = True,
        load_domain_statistics: bool = True,
        randomize_initial_state: bool = True,
        enable_actions: bool = True,
        differentiable: bool = False,
    ):
        self._reynolds_number = float(reynolds_number)
        self._circle_resolution_angular = int(resolution)
        self._lift_penalty = float(lift_penalty)
        self._ndims = ndims
        self._viscosity = self._U_mean / self._reynolds_number

        super().__init__(
            dt=dt,
            adaptive_cfl=adaptive_cfl,
            step_length=step_length,
            episode_length=episode_length,
            ndims=ndims,
            use_marl=use_marl,
            dtype=dtype,
            load_initial_domain=load_initial_domain,
            load_domain_statistics=load_domain_statistics,
            randomize_initial_state=randomize_initial_state,
            enable_actions=enable_actions,
            differentiable=differentiable,
        )

        self._debug = debug
        (self._left_block_idx, self._top_block_idx, self._right_block_idx,
         self._bottom_block_idx, self._vortex_street_block_idx) = range(5)
        self._last_control = jnp.zeros(self._control_shape, self._dtype)
        self._sensor_locations = self._get_sensor_locations()
        self._cylinder_mask = self._get_cylinder_mask()

    # ------------------------------------------------------------------
    # spaces (cylinder_env_base.py:203-232)
    # ------------------------------------------------------------------
    def _get_action_space(self) -> spaces.Box:
        return spaces.Box(low=-1.0, high=1.0, shape=(1,), dtype=np.float32)

    def _get_observation_space(self) -> spaces.Dict:
        return spaces.Dict(
            {
                "velocity": spaces.Box(
                    low=-np.inf, high=np.inf,
                    shape=(self._n_sensors_x_y, self._ndims), dtype=np.float32),
                "pressure": spaces.Box(
                    low=-np.inf, high=np.inf,
                    shape=(self._n_sensors_x_y,), dtype=np.float32),
            }
        )

    @property
    def render_shape(self) -> tuple[int, int, int]:
        # cap the render/sensor grid: it scales like resolution^3 in 3D and
        # at angular resolution 48 the uncapped grid is 35M cells -- far
        # beyond what rendering needs and enough to exhaust HBM
        z_res = min(self._circle_resolution_angular * 4, 128)
        y_res = z_res
        x_res = int(z_res / self.H * self.L)
        return (x_res, y_res, z_res)

    @property
    def n_agents(self) -> int:
        return 1

    @property
    def _control_shape(self) -> tuple[int, ...]:
        """Shape of the smoothed control carried across sim steps (matches the
        full stacked action shape; overridden by multi-jet envs)."""
        return (1,)

    # ------------------------------------------------------------------
    # domain / simulation (cylinder_env_base.py:247-332)
    # ------------------------------------------------------------------
    def _build_domain(self):
        return make_vortex_street_domain(
            ndims=self._ndims,
            viscosity=self._viscosity,
            domain_height=self.H,
            domain_length=self.L,
            cylinder_radius=self.cylinder_diameter / 2,
            cylinder_offset_y=self.cylinder_offset_y,
            circle_thickness=self.cylinder_diameter / 2,
            quad_thickness_x=self.cylinder_diameter,
            circle_resolution_angular=self._circle_resolution_angular,
            vortex_street_refinement_base=self._vortex_street_refinement_base,
            vortex_street_refinement_axes=("+y", "-y"),
            dtype=self._dtype,
        )

    def _get_domain(self):
        dom, self._grid_info = self._build_domain()
        return dom.build()

    @property
    def _cd_ref(self) -> float:
        if "drag" in self._metrics_stats:
            return self._metrics_stats["drag"].mean
        return 0.0

    def _get_prep_fn(self) -> Hooks:
        char_vel = (self._U_mean,) + (0.0,) * (self._ndims - 1)
        hook = make_convective_outflow_hook(
            self._geoms, self._topo,
            out_faces=((self._vortex_street_block_idx, 1),),  # wake "+x"
            char_vel=char_vel, tol=5e-6,
        )
        return {"PRE": (hook,)}

    def _get_simulation(self) -> SimConfig:
        return SimConfig(
            dt=self._dt,
            substeps=ADAPTIVE,
            adaptive_cfl=self._adaptive_cfl,
            corrector_steps=2,
            pressure_tol=1e-5 if self._ndims == 2 else 5e-7,
            pressure_return_best_result=True,
            velocity_corrector="FD",
            non_orthogonal=True,
            differentiable=self._differentiable,
            # Warm-start pressure CG from the previous pressure with a
            # coarse-space (deflation) correction of the guess -- 3x measured
            # env-step throughput at matched shedding physics (St/cl_rms
            # unchanged, cd within 0.7%; solver/piso.py:_make_deflation_x0).
            # In differentiable mode the guess is stop_gradient-ed and
            # self-gated inside _solve (implicit-function property: the
            # solution is guess-independent); fp64 FD pinning measured
            # rel. err 6.0e-9 with warm+deflation on, 5.5x faster forward
            # (scripts/validate_gradients.py, VALIDATION.md round 2).
            pressure_warm_start=True,
            pressure_deflation=True,
            # Hard tier (Re >= 500): the central face interpolation is
            # unstable at this grid's cell Peclet number (impulsive-start
            # blow-up at t ~ 46-55 for EVERY pressure-side remedy; see
            # VALIDATION.md "Resolution (2026-08-18)").  An upwind blend of
            # the velocity advection matrix is long-run stable from the
            # impulsive start (gamma 0.2 and 0.3 both probed stable to
            # t = 130 at res 24; gamma 0.2-1.0 stable at res 32 from the
            # t = 42.5 snapshot); gamma = 0.3 ships for margin under
            # actuation.  Documented deviation: the reference is
            # central-only and leans on an fp64 solver fallback
            # (cylinder_env_base.py:327) unavailable to an fp32 TPU build.
            advection_upwind_blend=0.3
            if self._reynolds_number >= 500 else 0.0,
        )

    def _additional_initialization(self) -> None:
        # project the loaded/initial state to divergence free (reference
        # _get_simulation calls sim.make_divergence_free(), :330)
        self._state = jit_make_divergence_free(
            self._state, self._geoms, topo=self._topo, cfg=self._cfg)

        # resampling plan over all blocks to the uniform render grid
        gi = self._grid_info if hasattr(self, "_grid_info") else None
        if gi is None:
            _, gi = self._build_domain()
            self._grid_info = gi
        centers = [np.asarray(jax.device_get(g.centers)) for g in self._geoms]
        self._centers_np = centers  # reused by subclass sensor plans
        if self._ndims == 2:
            lower = (gi["x_min"], gi["y_min"])
            upper = (gi["x_max"], gi["y_max"])
        else:
            lower = (gi["x_min"], gi["y_min"], -2.0)
            upper = (gi["x_max"], gi["y_max"], 2.0)
        self._resample = make_multiblock_plan(
            centers, self.render_shape[: self._ndims], lower, upper)

        # sensor observations gather the 151 physical points directly
        # (tiny plan -> tiny constants in the jitted step; resampling the
        # full uniform grid first baked multi-hundred-MB index tensors into
        # the 3D step HLO)
        pts2d = self._get_sensor_locations_2d().T  # (n, 2) physical
        if self._ndims == 3:
            pts = np.concatenate(
                [pts2d, np.zeros((pts2d.shape[0], 1))], axis=1)  # mid z
        else:
            pts = pts2d
        self._sensor_sample = make_multiblock_point_plan(centers, pts)

        self._prepare_drag_and_lift()
        self._last_control = jnp.zeros(self._control_shape, self._dtype)

    # ------------------------------------------------------------------
    # wall geometry + forces (cylinder_env_base.py:548-698)
    # ------------------------------------------------------------------
    _WALL_FACES = None  # set in _prepare_drag_and_lift

    def _wall_loop_spec(self):
        """(block, face, cell_slice, flip) around the cylinder, counter-
        clockwise closed loop (cylinder_env_base.py:554-606)."""
        return [
            (self._left_block_idx, 1, (Ellipsis, slice(None), -1), False),
            (self._top_block_idx, 2, (Ellipsis, 0, slice(None)), False),
            (self._right_block_idx, 0, (Ellipsis, slice(None), 0), True),
            (self._bottom_block_idx, 3, (Ellipsis, -1, slice(None)), True),
        ]

    @property
    def _wall_dz(self) -> float:
        return self.D / self._circle_resolution_angular

    @property
    def _force_scale(self) -> float:
        return 0.5 * self._U_mean**2 * self.cylinder_diameter

    @property
    def _blocks_vertex_coords(self):
        """Vertex coordinate arrays per block (rebuilt from the static grid)."""
        if not hasattr(self, "_vertex_coords_cache"):
            dom, _ = self._build_domain()
            self._vertex_coords_cache = [b.coords for b in dom._blocks]
        return self._vertex_coords_cache

    # ------------------------------------------------------------------
    # observations (cylinder_env_base.py:436-546)
    # ------------------------------------------------------------------
    def _sensor_locations_to_grid_coords(self, phys: np.ndarray) -> np.ndarray:
        phys = phys.copy()
        phys[0] += 2.0
        phys[0] *= (self.render_shape[0] - 1) / (self.L - 2.0)
        phys[1] += self.H / 2
        phys[1] *= (self.render_shape[1] - 1) / self.H
        if self._ndims == 3:
            phys[2] += self.H / 2
            phys[2] *= (self.render_shape[1] - 1) / self.H
        return np.round(phys).astype(np.int32)

    def _get_sensor_locations(self) -> np.ndarray:
        return self._sensor_locations_to_grid_coords(self._get_sensor_locations_2d())

    def _get_sensor_locations_2d(self) -> np.ndarray:
        """151 wake/ring sensor positions (cylinder_env_base.py:457-516)."""
        x_idx = np.arange(1.0, 5.0, 0.5)
        y_idx = np.arange(-1.5, 1.75, 0.5)
        gx, gy = np.meshgrid(x_idx, y_idx, indexing="ij")
        sensors = np.stack([gx.ravel(), gy.ravel()], axis=0)

        x_1 = np.arange(-0.25, 1, 0.25)
        y_1a = np.full_like(x_1, -1.5)
        y_1b = np.full_like(x_1, 1.5)
        x_2 = np.concatenate([[-0.25], np.arange(0.25, 1.25, 0.25)])
        y_2a = np.full_like(x_2, self.cylinder_diameter)
        y_2b = np.full_like(x_2, -self.cylinder_diameter)
        x_3 = np.full(3, 0.75)
        y_3 = np.array([-0.5, 0, 0.5])
        additional = np.stack([
            np.concatenate([x_1, x_1, x_2, x_2, x_3]),
            np.concatenate([y_1a, y_1b, y_2a, y_2b, y_3]),
        ], axis=0)

        angles = np.linspace(0, 2 * np.pi, 36)
        c1 = np.stack([1.0 * np.cos(angles), 1.0 * np.sin(angles)], axis=0)
        c2 = np.stack([0.625 * np.cos(angles), 0.625 * np.sin(angles)], axis=0)
        return np.concatenate([sensors, c1, c2, additional], axis=1)

    def _get_cylinder_mask(self) -> np.ndarray:
        r = self.cylinder_diameter / 2 * (self.render_shape[1] - 1) / self.H
        cx = round((self.render_shape[0] - 1) / self.L * 2.0)
        cy = round((self.render_shape[1] - 1) / self.H * 2.0)
        Y, X = np.ogrid[: self.render_shape[1], : self.render_shape[0]]
        mask = np.sqrt((X - cx) ** 2 + (Y - cy) ** 2) <= r
        if self._ndims == 3:
            mask = np.repeat(mask[None], self.render_shape[2], axis=0)
        return mask

    def _pure_global_obs(self, state: DomainState) -> dict[str, Array]:
        """Velocity/pressure at the 151 sensors via a direct point-gather
        plan (extract_global_2d_obs, obs_extraction.py:10-57)."""
        u = self._sensor_sample(tuple(b.velocity for b in state.blocks))
        p = self._sensor_sample(tuple(b.pressure for b in state.blocks))
        vel = u[: self._ndims].T if self._ndims == 2 else u.T  # (n, ndims)
        if self._ndims == 3:
            vel = vel[:, : self._ndims]
        return {"velocity": vel, "pressure": p}

    def _get_global_obs(self) -> dict[str, Array]:
        return self._pure_global_obs(self._state)

    # ------------------------------------------------------------------
    # stepping (cylinder_env_base.py:741-776)
    # ------------------------------------------------------------------
    @abstractmethod
    def _pure_apply_action(self, state: DomainState, control: Array) -> DomainState: ...

    def _apply_action(self, action: Array) -> None:
        self._state = self._pure_apply_action(
            self._state, jnp.asarray(action, self._dtype))

    def _pure_step(self, carry, action: Array):
        """Pure env step over ``carry = (DomainState, last_control)``."""
        dstate, last_control = carry
        alpha = self._action_smoothing_alpha

        def body(c, _):
            s, ctrl = c
            ctrl = ctrl + alpha * (action - ctrl)
            if self._enable_actions:
                s = self._pure_apply_action(s, ctrl)
            s, si = piso.single_step_info(
                s, self._geoms, self._topo, self._cfg, self._hooks)
            cd, cl = self._pure_drag_lift(s)
            return (s, ctrl), (cd, cl, si)

        (dstate, last_control), (cds, cls, sis) = jax.lax.scan(
            body, (dstate, last_control), None, length=self._n_sim_steps)
        obs = self._pure_global_obs(dstate)
        cd_mean = jnp.mean(cds, axis=0)
        cl_mean = jnp.mean(cls, axis=0)
        cd = jnp.sum(cd_mean)
        cl = jnp.sum(cl_mean)
        reward = self._cd_ref - cd - self._lift_penalty * jnp.abs(cl)
        info = {"drag": cd_mean, "lift": cl_mean}
        info.update(piso.solver_info_dict(piso.combine_scan_infos(sis)))
        return (dstate, last_control), obs, reward, info

    def _step_impl(self, action: Array):
        fn = self._jitted_env_step()
        (self._state, self._last_control), obs, reward, info = fn(
            (self._state, self._last_control), action)
        return obs, reward, False, info

    def _get_drag_and_lift(self):
        return jax.jit(self._pure_drag_lift)(self._state)

    # ------------------------------------------------------------------
    # randomization (cylinder_env_base.py:364-404)
    # ------------------------------------------------------------------
    def _randomize_domain(self) -> None:
        strouhal = 0.3
        period = 1 / (strouhal * self._U_mean / self.cylinder_diameter)
        max_n = 2 * int(period / self._step_length) - 1
        n_steps = int(self._np_rng.integers(int(0.5 * max_n), max_n)) + 1

        for b in range(len(self._topo.blocks)):
            blk = self._state.blocks[b]
            u = blk.velocity + jnp.asarray(
                self._np_rng.normal(0, 1, blk.velocity.shape) * 0.025,
                blk.velocity.dtype)
            p = blk.pressure + jnp.asarray(
                self._np_rng.normal(0, 1, blk.pressure.shape) * 0.025,
                blk.pressure.dtype)
            self._state = self._state.replace_block(
                b, replace(blk, velocity=u, pressure=p))
        for _ in range(n_steps):
            self._run_single_step()

    # ------------------------------------------------------------------
    # rendering (cylinder_env_base.py:406-434, 700-739)
    # ------------------------------------------------------------------
    def get_velocity(self) -> Array:
        u = self._resample(tuple(b.velocity for b in self._state.blocks))
        return jnp.where(jnp.asarray(self._cylinder_mask), 0.0, u)

    def get_pressure(self) -> Array:
        return self._resample(tuple(b.pressure for b in self._state.blocks))

    def get_vorticity(self) -> Array:
        """z-vorticity on the render grid (from resampled velocity)."""
        u = self._resample(tuple(b.velocity for b in self._state.blocks))
        hx = (self.L - 2.0) / self.render_shape[0]
        hy = self.H / self.render_shape[1]
        if self._ndims == 2:
            dv_dx = jnp.gradient(u[1], hx, axis=-1)
            du_dy = jnp.gradient(u[0], hy, axis=-2)
            w = dv_dx - du_dy
            return jnp.where(jnp.asarray(self._cylinder_mask), 0.0, w)
        dv_dx = jnp.gradient(u[1], hx, axis=-1)
        du_dy = jnp.gradient(u[0], hy, axis=-2)
        w = dv_dx - du_dy
        return jnp.where(jnp.asarray(self._cylinder_mask), 0.0, w)

    def _get_render_data(self, render_3d: bool, output_path: Path | None = None):
        vort = np.asarray(jax.device_get(self.get_vorticity()))
        vmin, vmax = VORTICITY_RENDER_RANGE
        if self._ndims == 2:
            img = self._format_render_data(np.flip(vort, -1), v_min=vmin,
                                           v_max=vmax, cmap="coolwarm")
            img[self._cylinder_mask] = 0
            return {"vorticity": img}
        mid = vort.shape[0] // 2
        img = self._format_render_data(np.flip(vort[mid], -1), v_min=vmin,
                                       v_max=vmax, cmap="coolwarm")
        img[self._cylinder_mask[0]] = 0
        return {"x-y-vorticity": img}

    # ------------------------------------------------------------------
    # state / ids (cylinder_env_base.py:822-869)
    # ------------------------------------------------------------------
    @property
    def initial_domain_id(self) -> str:
        return (f"cylinder_{self._ndims}D_Re{int(self._reynolds_number)}"
                f"_Res{self._circle_resolution_angular}")

    def _get_additional_state_info(self) -> dict[str, Any]:
        return {"last_control": self._last_control}

    def _set_additional_state_info(self, info: dict[str, Any]) -> None:
        if "last_control" in info:
            self._last_control = info["last_control"]

    def _pure_carry(self):
        return (self._state, self._last_control)

    def _set_pure_carry(self, carry) -> None:
        self._state, self._last_control = carry

    def detach(self) -> None:
        super().detach()
        self._last_control = jax.lax.stop_gradient(self._last_control)
