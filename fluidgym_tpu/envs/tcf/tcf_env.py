"""Turbulent channel flow (TCF) environments.

TPU-native re-expression of the reference
(``/root/reference/src/fluidgym/envs/tcf/tcf_env.py``):

* 3D channel at Re_tau in {180, 330, 550}; viscosity = delta/Re_cl with
  Re_cl from the empirical wall relation (tcf_env.py:246-250);
* dynamic bulk forcing from the measured mean wall stress (grid.py:128-163)
  plus optional Smagorinsky LES with Van Driest damping (tcf_env.py:438-476);
* Reichardt profile + divergence-free curl-noise initialization;
* actions: per-(x, z)-tile blowing/suction at the bottom (or both) wall(s)
  with zero-net-mass-flux scaling to |u_wall| (tcf_env.py:521-554);
* observations: fluctuation velocity (u, v) and pressure on the y+ = 15
  plane (tcf_env.py:646-677); MARL local obs are agent-mean windows shifted
  upstream (tcf_env.py:918-992);
* reward ``1 - tau_bottom / tau_ref`` (tcf_env.py:782-786);
* ``TCF3DBothEnv`` actuates and observes both walls with mirrored top-wall
  frames (tcf_env.py:1065-1194).
"""

from __future__ import annotations

from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.core.domain import DomainState
from fluidgym_tpu.envs.fluid_env import FluidEnv
from fluidgym_tpu.envs.tcf import tools as TCF_tools
from fluidgym_tpu.envs.tcf.grid import (
    make_channel_flow_domain,
    make_dynamic_forcing_hook,
    van_driest_sqr_from_centers,
)
from fluidgym_tpu.envs.util.obs_extraction import extract_moving_window_2d_x_z
from fluidgym_tpu.types import EnvMode
from fluidgym_tpu.solver import piso
from fluidgym_tpu.solver.piso import (
    ADAPTIVE,
    Hooks,
    SimConfig,
    jit_make_divergence_free,
    single_step,
)
from fluidgym_tpu.solver.sgs import make_smagorinsky_hook

Array = jax.Array

# reference tcf_env.py:62-91
SMALL_TCF_3D_DEFAULT_CONFIG = {
    "resolution_y": 65,
    "resolution_x_z": 64,
    "actor_size": 2,
    "L": np.pi,
    "D": np.pi / 2,
    "reynolds_number_wall": 180,
    "adaptive_cfl": 0.1,
    "step_length": 0.6,
    "episode_length": 1000,
    "local_obs_window": 1,
    "local_reward_weight": 0.0,
    "use_marl": True,
    "C_smag": 0.0,
    "use_van_driest": False,
    "init_with_noise": True,
    "load_initial_domain": True,
    "load_domain_statistics": True,
    "randomize_initial_state": True,
    "enable_actions": True,
    "differentiable": False,
}

LARGE_TCF_3D_DEFAULT_CONFIG = {
    **SMALL_TCF_3D_DEFAULT_CONFIG,
    "resolution_x_z": 128,
    "L": 2 * np.pi,
    "D": np.pi,
}


class TCF3DBottomEnv(FluidEnv):
    """Turbulent channel flow with bottom-wall blowing/suction control."""

    _default_render_key: str = "x-y-velocity"
    _actuation: str = "bottom"
    _supports_marl = True
    _scale_actions: bool = True
    _action_smoothing_alpha: float = 0.1
    _delta: float = 1.0
    _H: float = 2.0
    _y_obs_wall: float = 15.0
    _metrics: list[str] = ["wall_stress", "wall_stress_bottom", "wall_stress_top"]
    _initial_domain_ett: float = 50.0
    _initial_domain_restart: bool = False

    def __init__(
        self,
        resolution_y: int,
        resolution_x_z: int,
        L: float,
        D: float,
        actor_size: int,
        reynolds_number_wall: float,
        adaptive_cfl: float,
        step_length: float,
        episode_length: int,
        local_obs_window: int,
        local_reward_weight: float,
        use_marl: bool,
        C_smag: float = 0.0,
        use_van_driest: bool = False,
        init_with_noise: bool = True,
        dtype=None,
        debug: bool = False,
        load_initial_domain: bool = True,
        load_domain_statistics: bool = True,
        randomize_initial_state: bool = True,
        enable_actions: bool = True,
        differentiable: bool = False,
    ):
        self._L = float(L)
        self._D = float(D)
        self._debug = debug
        self._re_wall = float(reynolds_number_wall)
        self._re_center = TCF_tools.Re_wall_to_cl(self._re_wall)
        self._viscosity = self._delta / self._re_center
        self._u_wall = self._re_wall / self._re_center
        self._x = int(resolution_x_z)
        self._y = int(resolution_y)
        self._z = int(resolution_x_z)
        self._grid_refinement_strength = 2 if resolution_x_z < 64 else 1
        self._C_smag = float(C_smag)
        self._use_van_driest = bool(use_van_driest)
        self._init_with_noise = bool(init_with_noise)
        self._actor_size = int(actor_size)
        self._local_obs_window = int(local_obs_window)
        self._local_reward_weight = float(local_reward_weight)

        # step length given in wall units (tcf_env.py:260-265)
        step_length = step_length * TCF_tools.t_star(self._viscosity, self._u_wall)
        dt = step_length / 10

        super().__init__(
            dt=dt,
            adaptive_cfl=adaptive_cfl,
            step_length=step_length,
            episode_length=episode_length,
            ndims=3,
            use_marl=use_marl,
            dtype=dtype,
            load_initial_domain=load_initial_domain,
            load_domain_statistics=load_domain_statistics,
            randomize_initial_state=randomize_initial_state,
            enable_actions=enable_actions,
            differentiable=differentiable,
        )

        target_t = TCF_tools.ETT_to_t(self._initial_domain_ett, self._u_wall,
                                      self._delta)
        self._initial_domain_steps = round(target_t / self._step_length)
        if self._L < 3.0 and self._re_wall < 330:
            self._initial_domain_steps *= 2

    # ------------------------------------------------------------------
    @property
    def render_shape(self) -> tuple[int, ...]:
        xr = 2 * self._x
        return (xr, int(xr / self._L * self._H), int(xr / self._L * self._D))

    def _get_domain(self):
        dom, self._channel_info = make_channel_flow_domain(
            H=self._H, L=self._L, D=self._D, x=self._x, y=self._y, z=self._z,
            refinement_strength=self._grid_refinement_strength,
            n_dims=self._ndims, u_wall=self._u_wall, viscosity=self._viscosity,
            init_with_noise=self._init_with_noise, rng=self._np_rng,
            dtype=self._dtype,
        )
        self._vertex_coords_cache = [b.coords for b in dom._blocks]
        return dom.build()

    # wall-unit conversions (tcf_env.py:323-341)
    def _t_to_t_wall(self, t):
        return t / TCF_tools.t_star(self._viscosity, self._u_wall)

    def _t_wall_to_t(self, t_wall):
        return t_wall * TCF_tools.t_star(self._viscosity, self._u_wall)

    def _y_to_y_wall(self, pos):
        return (pos + self._delta) * self._u_wall / self._viscosity

    def _y_wall_to_y(self, pos_wall):
        return -self._delta + pos_wall * self._viscosity / self._u_wall

    def _get_y_obs_idx(self, y_wall: float) -> int:
        y_centers = self._channel_info["y_centers"]
        y_obs = self._y_wall_to_y(y_wall)
        return int(np.argmin(np.abs(y_centers - y_obs)))

    @property
    def _n_actors_x(self) -> int:
        return self._x // self._actor_size

    @property
    def _n_actors_z(self) -> int:
        return self._z // self._actor_size

    @property
    def n_agents(self) -> int:
        return self._n_actors_x * self._n_actors_z

    def _get_action_space(self) -> spaces.Box:
        shape = (1,) if self.use_marl else (self.n_agents, 1)
        return spaces.Box(low=-1.0, high=1.0, shape=shape, dtype=np.float32)

    def _get_observation_space(self) -> spaces.Dict:
        if self._use_marl:
            w = self._local_obs_window
            vel_shape = (w, w, 2)
            p_shape = (w, w)
        else:
            vel_shape = (2, self._z, self._x)
            p_shape = (self._z, self._x)
        return spaces.Dict({
            "velocity": spaces.Box(-np.inf, np.inf, vel_shape, np.float32),
            "pressure": spaces.Box(-np.inf, np.inf, p_shape, np.float32),
        })

    def _get_prep_fn(self) -> Hooks:
        self._ensure_channel_info()
        hooks = [make_dynamic_forcing_hook(self._geoms, self._topo,
                                           self._channel_info["d_y"])]
        if self._C_smag != 0:
            vd = None
            if self._use_van_driest:
                yc = self._channel_info["y_centers"]
                vd1d = van_driest_sqr_from_centers(yc, self._u_wall, self._viscosity)
                vd_field = jnp.asarray(
                    np.broadcast_to(vd1d[None, :, None],
                                    self._topo.blocks[0].shape), self._dtype)
                vd = (vd_field,)
            hooks.append(make_smagorinsky_hook(self._geoms, self._topo,
                                               self._C_smag, vd))
        return {"PRE": tuple(hooks)}

    def _get_simulation(self) -> SimConfig:
        """Reference preset (tcf_env.py:478-511)."""
        return SimConfig(
            dt=self._dt,
            substeps=ADAPTIVE,
            adaptive_cfl=self._adaptive_cfl,
            corrector_steps=2,
            advection_tol=1e-6,
            pressure_tol=1e-6,
            pressure_return_best_result=True,
            velocity_corrector="FD",
            non_orthogonal=False,  # rectilinear channel grid is orthogonal
            differentiable=self._differentiable,
            # cold pressure starts: warm+deflated starts destabilized the
            # periodic single-block configs (RBC blow-ups within ~200 steps
            # on some seeds; see VALIDATION.md), and their measured win here
            # was within 5% anyway -- the multi-block curvilinear families
            # (cylinder/airfoil) keep the warm path where it is validated
            # and worth 3-4x
        )

    def _ensure_channel_info(self) -> None:
        """Rebuild the static channel geometry info when the state came from
        disk (``_get_domain`` never ran).  Must be callable from
        ``_get_prep_fn``, which the base reset invokes BEFORE
        ``_additional_initialization`` (fluid_env.py:445-448)."""
        if not hasattr(self, "_channel_info"):
            _, self._channel_info = make_channel_flow_domain(
                H=self._H, L=self._L, D=self._D, x=self._x, y=self._y,
                z=self._z, refinement_strength=self._grid_refinement_strength,
                n_dims=self._ndims, u_wall=self._u_wall,
                viscosity=self._viscosity, init_with_noise=False,
                dtype=self._dtype)

    def _additional_initialization(self) -> None:
        self._ensure_channel_info()
        self._y_obs_bottom_idx = self._get_y_obs_idx(self._y_obs_wall)
        if self._C_smag != 0 and self._state.blocks[0].viscosity is None:
            # the SGS hook rewrites this every substep; materialize it so the
            # state pytree structure is loop-invariant
            blk = self._state.blocks[0]
            self._state = self._state.replace_block(0, replace(
                blk, viscosity=jnp.full(self._topo.blocks[0].shape,
                                        self._viscosity, self._dtype)))
        self._state = jit_make_divergence_free(
            self._state, self._geoms, topo=self._topo, cfg=self._cfg)

    # ------------------------------------------------------------------
    # actions (tcf_env.py:521-554)
    # ------------------------------------------------------------------
    def _action_to_control(self, action: Array) -> Array:
        """(n_actors_x, n_actors_z) action grid -> bottom-plate velocity
        slab (3, z, 1, x)."""
        if self._scale_actions:
            a = action - jnp.mean(action)
            a = self._u_wall * a / jnp.clip(jnp.abs(a), min=1.0)
            a = a - jnp.mean(a)
        else:
            a = action
        v = jnp.repeat(jnp.repeat(a, self._actor_size, axis=0),
                       self._actor_size, axis=1)  # (x, z)
        profile = jnp.zeros((3, self._z, 1, self._x), self._dtype)
        return profile.at[1, :, 0, :].set(v.T)

    def _pure_apply_action(self, state: DomainState, action: Array) -> DomainState:
        a = jnp.reshape(action, (self._n_actors_x, self._n_actors_z))
        control = self._action_to_control(a)
        blk = state.blocks[0]
        faces = list(blk.faces)
        faces[2] = replace(faces[2], velocity=control.astype(
            faces[2].velocity.dtype))  # "-y" bottom plate
        return state.replace_block(0, replace(blk, faces=tuple(faces)))

    def _apply_action(self, action: Array) -> None:
        self._state = self._pure_apply_action(
            self._state, jnp.asarray(action, self._dtype))

    # ------------------------------------------------------------------
    # metrics / obs (tcf_env.py:557-677)
    # ------------------------------------------------------------------
    @property
    def tau_ref(self) -> float:
        if "wall_stress_bottom" in self._metrics_stats:
            return self._metrics_stats["wall_stress_bottom"].mean
        return 1.0

    def _pure_wall_stress(self, state: DomainState):
        blk = state.blocks[0]
        nu = state.viscosity
        d_y = self._channel_info["d_y"]
        mean_u = jnp.mean(blk.velocity[0], axis=(0, 2))
        return nu * mean_u[0] / d_y[0], nu * mean_u[-1] / d_y[1]

    def _episode_physics_violations(self, rows: list[dict]) -> list[str]:
        """Relaminarization screen (round-5 finding): three bundled Re180
        snapshots had DECAYED to near-laminar states (v'/u_tau < 0.01,
        wall stress at ~0.4x the nominal u_tau^2) during their burn-in —
        the minimal-box Re_tau=180 channel laminarizes intermittently and
        a decayed state never recovers under deterministic replay.  A
        channel episode whose mean wall stress sits below 55% of nominal
        is not turbulent channel flow (the coarse-64^3 turbulent band
        realizes 0.6-0.9x nominal; laminarized states 0.35-0.47x)."""
        out = []
        tb = np.asarray([float(r["wall_stress_bottom"]) for r in rows
                         if "wall_stress_bottom" in r])
        if tb.size:
            nominal = float(self._u_wall) ** 2
            ratio = float(tb.mean()) / nominal
            if ratio < 0.55:
                out.append(
                    f"wall stress {ratio:.2f}x nominal u_tau^2 — "
                    f"relaminarized (turbulent band is 0.6-0.9x at 64^3)")
        return out

    def snapshot_turbulence_ratio(self, state: DomainState | None = None
                                  ) -> float:
        """``v'_rms / u_tau`` of (by default) the current state — the
        cheap relaminarization indicator used when saving burn-in
        snapshots (healthy developed channels measure 0.3-0.65 here; the
        decayed round-5 Re180 lanes measured <0.01)."""
        blk = (state or self._state).blocks[0]
        return float(jnp.std(blk.velocity[1])) / float(self._u_wall)

    def _pure_global_obs(self, state: DomainState, y_idx: int | None = None):
        if y_idx is None:
            y_idx = self._y_obs_bottom_idx
        blk = state.blocks[0]
        u = blk.velocity
        cell = self._geoms[0].det
        mean_u = jnp.sum(u * cell[None], axis=(1, 2, 3), keepdims=True) / jnp.sum(cell)
        u_prime = u - mean_u
        return {
            "velocity": u_prime[:2, :, y_idx, :],
            "pressure": blk.pressure[:, y_idx, :],
        }

    def _get_global_obs(self):
        return self._pure_global_obs(self._state)

    def _pure_local_obs(self, state: DomainState, y_idx: int | None = None,
                        flip_obs: bool = False):
        """Per-agent mean windows at y+=15 (tcf_env.py:918-992)."""
        if y_idx is None:
            y_idx = self._y_obs_bottom_idx
        blk = state.blocks[0]
        u_slice = blk.velocity[:2, :, y_idx, :]
        p_slice = blk.pressure[:, y_idx, :]
        mean_u = u_slice.mean(axis=(1, 2), keepdims=True)
        u_prime = u_slice - mean_u
        u_x, u_y = u_prime[0], u_prime[1]
        w = self._local_obs_window

        def win(field, pad_x):
            return extract_moving_window_2d_x_z(
                field, self._n_actors_x, self._n_actors_z, self._actor_size,
                w, w, pad_x=pad_x, pad_z=w // 2)

        lo_ux = win(u_x, pad_x=w - 1)
        lo_uy = win(u_y, pad_x=w)
        lo_p = win(p_slice, pad_x=w)
        if flip_obs:
            lo_ux = jnp.flip(lo_ux, axis=2)
            lo_uy = -jnp.flip(lo_uy, axis=2)
            lo_p = jnp.flip(lo_p, axis=1)
        return {"velocity": jnp.stack([lo_ux, lo_uy], axis=-1), "pressure": lo_p}

    def _get_local_obs(self):
        return self._pure_local_obs(self._state)

    # ------------------------------------------------------------------
    # stepping (tcf_env.py:782-824)
    # ------------------------------------------------------------------
    def _pure_reward(self, tau_total, tau_bottom):
        return 1.0 - tau_bottom / self.tau_ref

    def _pure_step(self, state: DomainState, action: Array):
        if self._enable_actions:
            state = self._pure_apply_action(state, action)

        def body(s, _):
            s, si = piso.single_step_info(
                s, self._geoms, self._topo, self._cfg, self._hooks)
            tb, tt = self._pure_wall_stress(s)
            return s, (tb, tt, si)

        state, (tbs, tts, sis) = jax.lax.scan(body, state, None,
                                              length=self._n_sim_steps)
        tau_bottom = jnp.mean(tbs)
        tau_top = jnp.mean(tts)
        tau_total = 0.5 * (tau_bottom + tau_top)
        reward = self._pure_reward(tau_total, tau_bottom)
        obs = self._pure_global_obs(state)
        info = {"wall_stress": tau_total, "wall_stress_bottom": tau_bottom,
                "wall_stress_top": tau_top}
        info.update(piso.solver_info_dict(piso.combine_scan_infos(sis)))
        return state, obs, reward, info

    def _pure_step_marl(self, state: DomainState, actions: Array):
        state, _, global_reward, info = self._pure_step(state, actions)
        local_obs = self._pure_local_obs(state)
        agent_rewards = global_reward * jnp.ones((self.n_agents,), self._dtype)
        info["global_reward"] = global_reward
        return state, local_obs, agent_rewards, info

    def _jitted_marl_step(self):
        self._sync_jit_cache()
        if "marl_step" not in self._jit_cache:
            self._jit_cache["marl_step"] = jax.jit(self._pure_step_marl)
        return self._jit_cache["marl_step"]

    def _step_impl(self, action: Array):
        action = jnp.reshape(action, (-1,))
        self._state, obs, reward, info = self._jitted_env_step()(
            self._state, action)
        return obs, reward, False, info

    def _step_marl_impl(self, actions: Array):
        actions = jnp.reshape(actions, (-1,))
        self._state, obs, rewards, info = self._jitted_marl_step()(
            self._state, actions)
        return obs, rewards, False, info

    # ------------------------------------------------------------------
    def _randomize_domain(self) -> None:
        """Noise + a few uncontrolled steps (tcf_env.py:879-916)."""
        max_n = int(0.01 * self._episode_length)
        n_steps = int(self._np_rng.integers(max(1, int(0.5 * max_n)),
                                            max(2, max_n))) + 1
        blk = self._state.blocks[0]
        u = blk.velocity + jnp.asarray(
            self._np_rng.normal(0, 1, blk.velocity.shape) * 0.01, self._dtype)
        p = blk.pressure + jnp.asarray(
            self._np_rng.normal(0, 1, blk.pressure.shape) * 0.01, self._dtype)
        self._state = self._state.replace_block(
            0, replace(blk, velocity=u, pressure=p))
        for _ in range(n_steps):
            self._run_single_step()

    def get_q_criterion(self) -> Array:
        """Q-criterion ``0.5*(|Omega|^2 - |S|^2)`` on the channel grid
        (reference _get_q_criterion, tcf_env.py:586-660; Jeong & Hussain
        1995)."""
        from fluidgym_tpu.solver.sgs import velocity_gradients

        G = velocity_gradients(self._state, self._geoms, self._topo)[0]
        Gt = jnp.swapaxes(G, 0, 1)
        S = 0.5 * (G + Gt)
        O = 0.5 * (G - Gt)
        return 0.5 * (jnp.sum(O**2, axis=(0, 1)) - jnp.sum(S**2, axis=(0, 1)))

    def _get_render_data(self, render_3d: bool, output_path: Path | None = None):
        blk = self._state.blocks[0]
        u_mag = np.asarray(jax.device_get(
            jnp.linalg.norm(blk.velocity, axis=0)))
        mid_z = u_mag.shape[0] // 2
        img = self._format_render_data(u_mag[mid_z], cmap="viridis")
        data = {"x-y-velocity": img}
        if render_3d:
            from fluidgym_tpu.envs.util.visualization import render_3d_iso

            q = np.asarray(jax.device_get(self.get_q_criterion()))
            q = q.transpose(2, 1, 0)            # (X=z-axis? -> (x, y, z))
            umag = u_mag.transpose(2, 1, 0)
            iso = float(np.percentile(np.abs(q), 98)) or 1.0
            out = None
            if output_path is not None:
                out = output_path / f"q_criterion_{self._n_episodes}_{self._n_steps}.png"
            data["3d_q_criterion"] = render_3d_iso(
                iso_field=q, iso=[iso], color_field=umag,
                color_range=(0.0, float(umag.max()) or 1.0),
                output_path=out,
                extent=((0.0, self._L), (-1.0, 1.0), (0.0, self._D)),
                view_kwargs={"elev": 20, "azim": 45},
            )
        return data

    # ------------------------------------------------------------------
    # opposition-control episode archival (reference tcf_env.py:1017-1062):
    # classical opposition control (Choi et al. 1994) episodes are recorded
    # next to the initial-domain dataset so learned policies can be compared
    # against the classical baseline per domain snapshot.
    # ------------------------------------------------------------------
    def _opposition_episode_path(self, mode: EnvMode, idx: int,
                                 write: bool = False) -> Path:
        from fluidgym_tpu.utils import data_utils

        root = data_utils.initial_domain_dir(self.initial_domain_id,
                                             write=write)
        return root / (f"{mode.value}_{idx:02d}_opposition_control_"
                       f"{self._actuation}_episode.csv")

    def save_opposition_control_episode(self, idx: int, mode: EnvMode,
                                        rows) -> None:
        """Archive per-step metrics of an opposition-control episode
        (reference save_opposition_control_episode, tcf_env.py:1017-1039).

        ``rows``: a pandas DataFrame or a list of per-step dicts."""
        import csv

        path = self._opposition_episode_path(mode, idx, write=True)
        path.parent.mkdir(parents=True, exist_ok=True)
        if hasattr(rows, "to_csv"):  # DataFrame
            rows.to_csv(path, index=False)
            return
        rows = list(rows)
        if not rows:
            return
        with open(path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)

    def load_opposition_control_episode(self, idx: int, mode: EnvMode):
        """Load an archived opposition-control episode as a DataFrame
        (reference load_opposition_control_episode, tcf_env.py:1041-1062)."""
        import pandas as pd

        path = self._opposition_episode_path(mode, idx)
        if not path.exists():
            raise FileNotFoundError(
                f"no opposition-control episode at {path}")
        return pd.read_csv(path)

    @property
    def initial_domain_id(self) -> str:
        return (f"channel_flow3D_L{self._L:.2f}_Re{int(self._re_wall)}"
                f"_Res{self._x}_Ref{self._grid_refinement_strength}")

    @property
    def id(self) -> str:
        return f"ChannelFlow3D_Re{int(self._re_wall)}_L{self._L:.2f}"


class TCF3DBothEnv(TCF3DBottomEnv):
    """Channel flow with blowing/suction at BOTH walls; top-wall agents see
    mirrored observations (tcf_env.py:1065-1194)."""

    _actuation = "both"

    @property
    def n_agents(self) -> int:
        return 2 * self._n_actors_x * self._n_actors_z

    @property
    def tau_ref(self) -> float:
        if "wall_stress" in self._metrics_stats:
            return self._metrics_stats["wall_stress"].mean
        return 1.0

    def _additional_initialization(self) -> None:
        super()._additional_initialization()
        self._y_obs_top_idx = self._topo.blocks[0].shape[-2] - 1 - self._y_obs_bottom_idx

    def _pure_reward(self, tau_total, tau_bottom):
        return 1.0 - tau_total / self.tau_ref

    def _pure_apply_action(self, state: DomainState, action: Array) -> DomainState:
        half = self._n_actors_x * self._n_actors_z
        a_bottom = jnp.reshape(action[:half],
                               (self._n_actors_x, self._n_actors_z))
        a_top = jnp.reshape(action[half:], (self._n_actors_x, self._n_actors_z))
        control_bottom = self._action_to_control(a_bottom)
        control_top = -1.0 * self._action_to_control(a_top)
        blk = state.blocks[0]
        faces = list(blk.faces)
        faces[2] = replace(faces[2], velocity=control_bottom.astype(
            faces[2].velocity.dtype))
        faces[3] = replace(faces[3], velocity=control_top.astype(
            faces[3].velocity.dtype))
        return state.replace_block(0, replace(blk, faces=tuple(faces)))

    def _pure_local_obs(self, state: DomainState, y_idx=None, flip_obs=False):
        if y_idx is not None:
            # honor the base-class contract instead of silently ignoring the
            # requested wall slice
            return super()._pure_local_obs(state, y_idx, flip_obs)
        bottom = super()._pure_local_obs(state, self._y_obs_bottom_idx, False)
        top = super()._pure_local_obs(state, self._y_obs_top_idx, True)
        return jax.tree.map(
            lambda b, t: jnp.concatenate([b, t], axis=0), bottom, top)
