"""Abstract base class for NACA 0012 airfoil flow environments.

TPU-native re-expression of the reference
(``/root/reference/src/fluidgym/envs/airfoil/airfoil_env_base.py:45-871``):

* 6-block C-grid around a NACA 0012 at 0-20 degrees attack angle (grid.py);
* parabolic inflow, advected outflow on the two tail blocks' +x faces
  (:235-258), flux balancing folded into the action application (:709-718);
* solver preset: adaptive substeps, non-orthogonal corrections,
  advection tol 1e-6, pressure tol 1e-7 (2D) / 1e-8 (3D), FD corrector,
  make_divergence_free at init (:260-289);
* wake + surface sensor cloud filtered by the airfoil mask (:587-656);
* three synthetic jets on the upper surface at chord 0.2/0.4/0.6, parabolic
  profiles rotated into the local wall normal, zero-mean action (:484-538);
* drag/lift from wall-stress integration around front/top/bottom surfaces;
  reward ``(cl/cd) - cl_cd_ref`` with Rabault action smoothing (:720-755).

Deviation noted: the reference balances fluxes only inside ``_apply_action``;
we additionally balance the two outflow faces in the PRE hook so the pressure
system stays solvable when actions are disabled.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.airfoil.grid import get_jet_locations, make_airfoil_domain, read_airfoil
from fluidgym_tpu.envs.fluid_env import FluidEnv, Stats
from fluidgym_tpu.envs.util.multiblock_resample import (
    make_multiblock_plan,
    make_multiblock_point_plan,
)
from fluidgym_tpu.envs.util.profiles import get_jet_profile
from fluidgym_tpu.envs.util.wall_forces import WallForcesMixin
from fluidgym_tpu.solver.boundaries import balance_boundary_fluxes, make_convective_outflow_hook
from fluidgym_tpu.solver import piso
from fluidgym_tpu.solver.piso import (
    ADAPTIVE,
    Hooks,
    SimConfig,
    jit_make_divergence_free,
    single_step,
)

Array = jax.Array

# reference airfoil_env_base.py:38-42
VORTICITY_RENDER_RANGE = {1000: (-10, 10), 3000: (-12.5, 12.5), 5000: (-15, 15)}


class AirfoilEnvBase(WallForcesMixin, FluidEnv):
    """Abstract base class for airfoil flow environments."""

    _default_render_key: str = "vorticity"
    _action_smoothing_alpha: float = 0.1

    _n_jets: int = 3
    _res_z: int = 96
    U_mean: float = 0.3
    airfoil_length: float = 1.0
    H: float = 1.4
    L: float = 4.5
    D: float = 1.4

    _metrics: list[str] = ["drag", "lift"]
    _vorticity_stats: Stats | None = None
    _initial_domain_steps = 400
    _initial_domain_restart = False

    def __init__(
        self,
        reynolds_number: float,
        adaptive_cfl: float,
        step_length: float,
        episode_length: int,
        dt: float,
        attack_angle_deg: float,
        ndims: int,
        use_marl: bool,
        dtype=None,
        debug: bool = False,
        load_initial_domain: bool = True,
        load_domain_statistics: bool = True,
        randomize_initial_state: bool = True,
        enable_actions: bool = True,
        differentiable: bool = False,
    ):
        if attack_angle_deg < 0.0 or attack_angle_deg > 20.0:
            raise ValueError("Attack angle must be between 0 and 20 degrees.")
        self._debug = debug
        self._reynolds_number = float(reynolds_number)
        self._attack_angle_deg = float(attack_angle_deg)
        self._ndims = ndims
        self._viscosity = (self.U_mean * self.airfoil_length) / self._reynolds_number
        self._airfoil_coords = read_airfoil(self._attack_angle_deg)
        self._airfoil_mask = self._get_airfoil_mask()
        self._sensor_locations = self._get_sensor_locations()

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

        (self._left_block_idx, self._airfoil_front_block_idx,
         self._airfoil_top_block_idx, self._airfoil_bot_block_idx,
         self._tail_upper_block_idx, self._tail_lower_block_idx) = range(6)
        self._last_control = jnp.zeros(self._control_shape, self._dtype)

    # ------------------------------------------------------------------
    # spaces / shapes
    # ------------------------------------------------------------------
    @property
    def render_shape(self) -> tuple[int, int, int]:
        return (600, 150, 150)  # airfoil_env_base.py:161-164

    @property
    def n_agents(self) -> int:
        return self._n_jets

    @property
    def _control_shape(self) -> tuple[int, ...]:
        return (self._n_jets,)

    @property
    def _cl_cd_ref(self) -> float:
        """Reference lift-to-drag ratio (airfoil_env_base.py:166-172)."""
        if "lift" in self._metrics_stats and "drag" in self._metrics_stats:
            return self._metrics_stats["lift"].mean / self._metrics_stats["drag"].mean
        return 0.0

    def _episode_physics_violations(self, rows: list[dict]) -> list[str]:
        """A stationary airfoil in uniform flow cannot produce sustained net
        thrust, and its lift stays within a small multiple of the median;
        rows outside these bounds mean the snapshot is not developed (or the
        simulation is unstable) — the failure mode behind the contaminated
        Re3000 test snapshots flagged in round 2."""
        out = []
        drag = np.asarray([float(r["drag"]) for r in rows if "drag" in r])
        lift = np.asarray([float(r["lift"]) for r in rows if "lift" in r])
        if drag.size:
            frac = float((drag <= 0.0).mean())
            if frac > 0.02:
                out.append(f"drag <= 0 (net thrust) on {frac:.0%} of steps")
        if lift.size:
            scale = max(float(np.median(np.abs(lift))), 1e-6)
            frac = float((np.abs(lift) > 10.0 * scale).mean())
            if frac > 0.02:
                out.append(
                    f"|lift| beyond 10x its median scale on {frac:.0%} of steps")
        return out

    # ------------------------------------------------------------------
    # domain / simulation
    # ------------------------------------------------------------------
    @property
    def _tail_grow_mul(self) -> float:
        # finer outflow spacing for the hard 3D case (airfoil_env_base.py:211-215)
        if self._ndims == 3 and self._reynolds_number >= 5000:
            return 1.001
        return 1.01

    def _build_domain(self):
        return make_airfoil_domain(
            ndims=self._ndims,
            res_z=self._res_z,
            H=self.H,
            L=self.L,
            vel_in=self.U_mean,
            attack_angle_deg=self._attack_angle_deg,
            viscosity=self._viscosity,
            tail_grow_mul=self._tail_grow_mul,
            dtype=self._dtype,
        )

    def _get_domain(self):
        dom, self._grid_info = self._build_domain()
        return dom.build()

    def _get_prep_fn(self) -> Hooks:
        char_vel = (self.U_mean,) + (0.0,) * (self._ndims - 1)
        hook = make_convective_outflow_hook(
            self._geoms, self._topo, out_faces=self._out_faces,
            char_vel=char_vel, tol=5e-6,
        )
        return {"PRE": (hook,)}

    @property
    def _out_faces(self):
        return ((self._tail_lower_block_idx, 1), (self._tail_upper_block_idx, 1))

    def _get_simulation(self) -> SimConfig:
        return SimConfig(
            dt=self._dt,
            substeps=ADAPTIVE,
            adaptive_cfl=self._adaptive_cfl,
            corrector_steps=2,
            advection_tol=1e-6,
            pressure_tol=1e-7 if self._ndims == 2 else 1e-8,
            pressure_return_best_result=True,
            velocity_corrector="FD",
            non_orthogonal=True,
            differentiable=self._differentiable,
            # see cylinder_env_base: warm+deflated pressure starts; in
            # differentiable mode the guess is stop_gradient-ed + self-gated
            # in _solve (gradients unchanged, fp64-FD-pinned)
            pressure_warm_start=True,
            pressure_deflation=True,
            # Re >= 3000: the central face interpolation develops a growing
            # advective instability on the C-grid (negative-drag bursts in
            # the Re3000 episode record that WORSEN with burn-in — an
            # underdeveloped-snapshot explanation is excluded; see
            # docs/data.md and VALIDATION.md round 4/5).  Same remedy as
            # the cylinder hard tier: gamma=0.3 upwind blend of the
            # velocity advection matrix (scripts/airfoil_blend_probe.py:
            # blend 0.0 reproduces the bursts from the bundled developed
            # snapshot, blend 0.3 is clean).  Documented deviation: the
            # reference is central-only with an fp64 solver fallback
            # (reference cylinder_env_base.py:327) unavailable to an fp32
            # TPU build.
            advection_upwind_blend=0.3
            if self._reynolds_number >= 3000 else 0.0,
            # The gamma=0.3 operator stalls plain Jacobi-PCG an order above
            # the 1e-7 tolerance (res ~1e-6, iterations exploding to 250k a
            # step); the aggregation coarse space restores FULL convergence
            # at ~2x the throughput (on-chip A/B, VALIDATION.md round 5:
            # plain conv 0% / 0.24 steps/s vs agg8 conv 100% / 0.45 and
            # rising).  Gated with the blend: on the central-scheme tiers
            # the developed warm-started solves already converge and agg8
            # measured 0.79x there (round 4).
            **({"pressure_coarse_tile": 8,
                "pressure_coarse_precondition": True}
               if self._reynolds_number >= 3000 else {}),
        )

    def _additional_initialization(self) -> None:
        self._state = jit_make_divergence_free(
            self._state, self._geoms, topo=self._topo, cfg=self._cfg)

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
            lower = (gi["x_min"], gi["y_min"], -self.D / 2)
            upper = (gi["x_max"], gi["y_max"], self.D / 2)
        self._resample = make_multiblock_plan(
            centers, self.render_shape[: self._ndims], lower, upper)

        # direct point-gather plan for the sensors (see cylinder_env_base:
        # keeps the jitted step free of grid-sized index constants)
        pts_all = self._get_sensor_locations_2d()          # physical (2, m)
        grid = self._physical_locations_to_grid_coords(pts_all)
        mask2d = (self._airfoil_mask if self._ndims == 2
                  else self._airfoil_mask[0])
        keep = ~mask2d[grid[1], grid[0]]
        pts2d = pts_all[:, keep].T                         # (n, 2)
        if self._ndims == 3:
            pts2d = np.concatenate(
                [pts2d, np.zeros((pts2d.shape[0], 1))], axis=1)
        self._sensor_sample = make_multiblock_point_plan(centers, pts2d)

        self._prepare_drag_and_lift()
        self._jet_locations_top = get_jet_locations(
            self._blocks_vertex_coords[self._airfoil_top_block_idx])
        self._top_base_profile, self._jet_masks = self._get_base_jet_profiles()
        self._last_control = jnp.zeros(self._control_shape, self._dtype)

    @property
    def _blocks_vertex_coords(self):
        if not hasattr(self, "_vertex_coords_cache"):
            dom, _ = self._build_domain()
            self._vertex_coords_cache = [b.coords for b in dom._blocks]
        return self._vertex_coords_cache

    # ------------------------------------------------------------------
    # wall forces (airfoil_env_base.py:341-482)
    # ------------------------------------------------------------------
    def _wall_loop_spec(self):
        """Closed contour around the airfoil: front (+x face, bottom-to-top
        nose arc) -> top surface (left-to-right) -> bottom surface flipped
        (right-to-left); airfoil_env_base.py:341-400."""
        return [
            (self._airfoil_front_block_idx, 1, (Ellipsis, slice(None), -1), False),
            (self._airfoil_top_block_idx, 2, (Ellipsis, 0, slice(None)), False),
            (self._airfoil_bot_block_idx, 3, (Ellipsis, -1, slice(None)), True),
        ]

    @property
    def _wall_dz(self) -> float:
        return self.D / self._res_z

    @property
    def _force_scale(self) -> float:
        return 0.5 * self.U_mean**2 * self.airfoil_length

    # ------------------------------------------------------------------
    # jets (airfoil_env_base.py:484-538)
    # ------------------------------------------------------------------
    def _get_base_jet_profiles(self):
        """Per-cell base jet velocity on the top block's wall face and static
        0/1 jet masks; profiles point along the local wall normal."""
        vc = np.asarray(self._blocks_vertex_coords[self._airfoil_top_block_idx])
        n_cells_top = (vc.shape[-1] - 1)
        base = np.zeros((2, n_cells_top))
        masks = np.zeros((self._n_jets, n_cells_top))

        # concatenated contour normals: offset of the top segment follows the
        # reference's front-block vertex count (airfoil_env_base.py:505-510)
        front_vc = np.asarray(
            self._blocks_vertex_coords[self._airfoil_front_block_idx])
        n_offset = front_vc.shape[-2]
        normals = np.asarray(jax.device_get(self._wall_normals))

        for i, (start, end) in enumerate(self._jet_locations_top):
            profile = get_jet_profile(end - start + 3)[1:-1]
            profile = profile / profile.sum()
            n = normals[:, n_offset + start: n_offset + end + 1]
            base[:, start:end + 1] = profile[None, :] * n
            masks[i, start:end + 1] = 1.0

        if self._ndims == 2:
            prof = jnp.asarray(base[:, None, :], self._dtype)  # (2, 1, nx)
        else:
            base3 = np.concatenate([base, np.zeros((1, n_cells_top))], axis=0)
            prof = jnp.asarray(
                np.repeat(base3[:, None, None, :], self._res_z, axis=1),
                self._dtype)  # (3, nz, 1, nx)
        return prof, jnp.asarray(masks, self._dtype)

    def _pure_action_multiplier(self, control: Array) -> Array:
        """Zero-mean, max-normalized action -> per-wall-cell multiplier
        (airfoil_env_2d.py:169-191)."""
        v = control - jnp.mean(control)
        max_v = jnp.max(jnp.abs(v))
        v = jnp.where(max_v > 1.0, v / max_v, v)
        return v @ self._jet_masks  # (nx,)

    def _pure_apply_action(self, state: DomainState, control: Array) -> DomainState:
        mult = self._pure_action_multiplier(control)
        if self._ndims == 2:
            profile = self._top_base_profile * mult[None, None, :]
        else:
            profile = self._top_base_profile * mult[None, None, None, :]
        b, f = self._airfoil_top_block_idx, 2  # "-y" face
        blk = state.blocks[b]
        faces = list(blk.faces)
        faces[f] = replace(faces[f], velocity=profile.astype(
            faces[f].velocity.dtype))
        state = state.replace_block(b, replace(blk, faces=tuple(faces)))
        free = self._out_faces + ((b, f),)
        return balance_boundary_fluxes(state, self._geoms, self._topo, free)

    def _apply_action(self, action: Array) -> None:
        self._state = self._pure_apply_action(
            self._state, jnp.asarray(action, self._dtype))

    # ------------------------------------------------------------------
    # sensors / observations (airfoil_env_base.py:570-662)
    # ------------------------------------------------------------------
    def _physical_locations_to_grid_coords(self, phys: np.ndarray) -> np.ndarray:
        """(airfoil_env_base.py:570-585; note the reference scales by the full
        render resolution, not resolution-1)."""
        phys = np.array(phys, dtype=np.float64, copy=True)
        phys[0] += 1.5
        phys[0] *= self.render_shape[0] / (self.L + 1.5)
        phys[1] += self.H / 2
        phys[1] *= self.render_shape[1] / self.H
        if phys.shape[0] == 3:
            phys[2] += self.D / 2
            phys[2] *= self.render_shape[1] / self.D
        out = np.round(phys).astype(np.int32)
        limits = (self.render_shape[0] - 1, self.render_shape[1] - 1,
                  self.render_shape[1] - 1)
        for d in range(phys.shape[0]):
            out[d] = np.clip(out[d], 0, limits[d])
        return out

    def _get_airfoil_mask(self) -> np.ndarray:
        from matplotlib.path import Path as MplPath

        coords = self._physical_locations_to_grid_coords(self._airfoil_coords)
        polygon = coords[:2].T
        nx, ny = self.render_shape[0], self.render_shape[1]
        xx, yy = np.meshgrid(np.arange(nx), np.arange(ny))
        pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
        mask = MplPath(polygon).contains_points(pts).reshape(ny, nx).copy()
        if self._ndims == 3:
            mask = np.repeat(mask[None], self.render_shape[2], axis=0)
        return mask

    def _get_sensor_locations_2d(self) -> np.ndarray:
        """Wake + near-surface sensor cloud (airfoil_env_base.py:607-656)."""
        def mesh(xs, ys):
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            return np.stack([gx.ravel(), gy.ravel()], axis=0)

        y_in = np.linspace(-self.H / 2, self.H / 2, 10)[1:-1]
        wake_coarse = mesh(np.arange(1.5, 2.6, 0.125), y_in)
        wake_fine = mesh(np.arange(1.05, 1.45, 0.05), y_in)
        surface = mesh(np.linspace(-0.125, self.airfoil_length, 10),
                       np.linspace(-0.5, 0.125, 8))
        return np.concatenate([wake_coarse, wake_fine, surface], axis=1)

    def _get_sensor_locations(self) -> np.ndarray:
        grid = self._physical_locations_to_grid_coords(
            self._get_sensor_locations_2d())
        mask2d = self._airfoil_mask if self._ndims == 2 else self._airfoil_mask[0]
        keep = ~mask2d[grid[1], grid[0]]
        return grid[:, keep]

    def _pure_global_obs(self, state: DomainState) -> dict[str, Array]:
        u = self._sensor_sample(tuple(b.velocity for b in state.blocks))
        p = self._sensor_sample(tuple(b.pressure for b in state.blocks))
        return {"velocity": u.T, "pressure": p}

    def _get_global_obs(self) -> dict[str, Array]:
        return self._pure_global_obs(self._state)

    # ------------------------------------------------------------------
    # stepping (airfoil_env_base.py:720-755)
    # ------------------------------------------------------------------
    def _pure_step(self, carry, action: Array):
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
        reward = (cl / cd) - self._cl_cd_ref
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
    # randomization (airfoil_env_base.py:302-339)
    # ------------------------------------------------------------------
    def _randomize_domain(self) -> None:
        max_n = int(0.05 * self._episode_length)
        n_steps = int(self._np_rng.integers(int(0.5 * max_n), max(max_n, 1))) + 1
        for b in range(len(self._topo.blocks)):
            blk = self._state.blocks[b]
            u = blk.velocity + jnp.asarray(
                self._np_rng.normal(0, 1, blk.velocity.shape) * 0.01,
                blk.velocity.dtype)
            p = blk.pressure + jnp.asarray(
                self._np_rng.normal(0, 1, blk.pressure.shape) * 0.01,
                blk.pressure.dtype)
            self._state = self._state.replace_block(
                b, replace(blk, velocity=u, pressure=p))
        for _ in range(n_steps):
            self._run_single_step()

    # ------------------------------------------------------------------
    # rendering (airfoil_env_base.py:540-568, 664-702)
    # ------------------------------------------------------------------
    def get_velocity(self) -> Array:
        u = self._resample(tuple(b.velocity for b in self._state.blocks))
        return jnp.where(jnp.asarray(self._airfoil_mask), 0.0, u)

    def get_pressure(self) -> Array:
        return self._resample(tuple(b.pressure for b in self._state.blocks))

    def get_vorticity(self) -> Array:
        u = self._resample(tuple(b.velocity for b in self._state.blocks))
        hx = (self.L + 1.5) / self.render_shape[0]
        hy = self.H / self.render_shape[1]
        dv_dx = jnp.gradient(u[1], hx, axis=-1)
        du_dy = jnp.gradient(u[0], hy, axis=-2)
        return jnp.where(jnp.asarray(self._airfoil_mask), 0.0, dv_dx - du_dy)

    def _get_render_data(self, render_3d: bool, output_path: Path | None = None):
        vort = np.asarray(jax.device_get(self.get_vorticity()))
        vmin, vmax = VORTICITY_RENDER_RANGE.get(
            int(self._reynolds_number), (-10, 10))
        if self._ndims == 2:
            img = self._format_render_data(np.flip(vort, (-2, -1)), v_min=vmin,
                                           v_max=vmax, cmap="coolwarm")
            return {"vorticity": img}
        mid = vort.shape[0] // 2
        img = self._format_render_data(np.flip(vort[mid], (-2, -1)), v_min=vmin,
                                       v_max=vmax, cmap="coolwarm")
        return {"x-y-vorticity": img}

    # ------------------------------------------------------------------
    # state / ids (airfoil_env_base.py:828-871)
    # ------------------------------------------------------------------
    @property
    def initial_domain_id(self) -> str:
        return f"airfoil_{self._ndims}D_Re{int(self._reynolds_number)}"

    @property
    def id(self) -> str:
        return f"Airfoil{self._ndims}D_Re{int(self._reynolds_number)}"

    def _get_additional_state_info(self) -> dict[str, Any]:
        return {"last_control": self._last_control}

    def _set_additional_state_info(self, info: dict[str, Any]) -> None:
        if "last_control" in info:
            self._last_control = info["last_control"]

    def _load_domain_statistics(self) -> None:
        super()._load_domain_statistics()
        if "vorticity_magnitude" in self._metrics_stats:
            self._vorticity_stats = self._metrics_stats["vorticity_magnitude"]

    def _pure_carry(self):
        return (self._state, self._last_control)

    def _set_pure_carry(self, carry) -> None:
        self._state, self._last_control = carry

    def detach(self) -> None:
        super().detach()
        self._last_control = jax.lax.stop_gradient(self._last_control)
