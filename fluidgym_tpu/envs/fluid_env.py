"""Abstract base class for FluidGym-TPU environments.

API-compatible re-expression of the reference ``FluidEnv``
(``/root/reference/src/fluidgym/envs/fluid_env.py:64-1363``) around a purely
functional simulation core:

* the mutable C++ Domain becomes an immutable ``DomainState`` pytree held by
  the (host-side, stateful) env object;
* per-step simulation work is one jitted function (``lax.scan`` over
  ``n_sim_steps`` adaptive PISO steps) instead of a Python loop over CUDA
  launches;
* the torch/np RNG trio (fluid_env.py:844-860) becomes a ``jax.random`` key
  plus a numpy Generator for host-side decisions;
* ``get_state``/``set_state`` clone-free: pytrees are immutable values
  (fluid_env.py:1320-1363); ``detach`` maps to ``stop_gradient``
  (fluid_env.py:1280-1289).

Environment surface kept verbatim: ``reset/step/seed/init/render/save_gif/
train/val/test/sample_action/get_state/set_state/load_initial_domain``,
Dict observation spaces, SARL/MARL dispatch, truncation at episode_length,
metric statistics and uncontrolled-episode tracking.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from fluidgym_tpu.config import config as fluidgym_config
from fluidgym_tpu.core.domain import BlockGeom, DomainState, DomainTopo
from fluidgym_tpu.core.domain_io import load_domain, save_domain
from fluidgym_tpu.solver.piso import Hooks, SimConfig, single_step
from fluidgym_tpu.types import EnvMode, FluidEnvLike
from fluidgym_tpu.utils import data_utils

Array = jax.Array


class Stats(NamedTuple):
    """Statistical summary of a metric (reference fluid_env.py:33-43)."""

    mean: float
    min: float
    max: float
    p5: float
    p25: float
    p50: float
    p75: float
    p95: float

    @classmethod
    def from_values(cls, values: np.ndarray) -> "Stats":
        v = np.asarray(values, np.float64)
        p = np.percentile(v, [5, 25, 50, 75, 95])
        return cls(float(v.mean()), float(v.min()), float(v.max()),
                   float(p[0]), float(p[1]), float(p[2]), float(p[3]), float(p[4]))


@dataclass
class EnvState:
    """Snapshot of a FluidEnv for get_state/set_state (fluid_env.py:46-54)."""

    class_name: str
    domain: DomainState
    n_steps: int
    mode: EnvMode
    additional_info: dict[str, Any]


# Number of initial domains per mode and the per-mode generation seeds
# (reference fluid_env.py:58-61).
N_INITIAL_DOMAINS = 10
MODE_SEEDS = {EnvMode.TRAIN: 100, EnvMode.VAL: 200, EnvMode.TEST: 300}


class FluidEnv(ABC, FluidEnvLike):
    """Abstract base class for FluidGym-TPU environments."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 24}

    _default_render_key: str
    _ndims: int
    _supports_marl: bool = False
    _metrics: list[str] = []
    _initial_domain_steps: int = 0
    _initial_domain_restart: bool = True

    def __init__(
        self,
        adaptive_cfl: float,
        dt: float,
        step_length: float,
        episode_length: int,
        ndims: int,
        use_marl: bool,
        dtype=None,
        auto_render: bool = False,
        load_initial_domain: bool = True,
        load_domain_statistics: bool = True,
        randomize_initial_state: bool = True,
        enable_actions: bool = True,
        differentiable: bool = False,
    ):
        super().__init__()
        if ndims not in (2, 3):
            raise ValueError("ndims must be 2 or 3.")
        self._ndims = ndims
        self._dt = float(dt)
        self._adaptive_cfl = float(adaptive_cfl)
        self._step_length = float(step_length)
        self._episode_length = int(episode_length)
        self._use_marl = bool(use_marl)
        if self._use_marl and not self._supports_marl:
            raise ValueError("This env does not support multi-agent mode.")
        self._dtype = dtype or fluidgym_config.dtype
        self._auto_render = bool(auto_render)
        # solver-failure surfacing (reference LinsolveError; see
        # _check_solver_health)
        self._warn_solver_failure = True
        self._solver_warned = False
        self._load_domain_on_reset = bool(load_initial_domain)
        self._randomize_initial_state = bool(randomize_initial_state)
        self._enable_actions = bool(enable_actions)
        self._differentiable = bool(differentiable)

        self._seed_value: int | None = None
        self._key: Array | None = None
        self._np_rng: np.random.Generator | None = None
        self._reset_called = False
        self._n_episodes = 0
        self._n_steps = 0
        self._mode: EnvMode = EnvMode.TRAIN
        self._frames: dict[str, list] = defaultdict(list)
        self._metrics_stats: dict[str, Stats] = {}
        self._uncontrolled_episode: list[dict] | None = None

        # functional sim pieces, populated by _set_initial_state
        self._topo: DomainTopo | None = None
        self._geoms: tuple[BlockGeom, ...] | None = None
        self._state: DomainState | None = None
        self._cfg: SimConfig | None = None
        self._hooks: Hooks | None = None
        self._jit_cache: dict[str, Any] = {}

        if load_initial_domain or load_domain_statistics:
            data_utils.prepare_initial_domains(self.initial_domain_id)
        if load_domain_statistics:
            self._load_domain_statistics()
        else:
            self._logger.warning(
                "Domain statistics not loaded; reward normalization uses "
                "defaults. Only use this for debugging or development."
            )

        self._action_space = self._get_action_space()
        self._observation_space = self._get_observation_space()

        if self._use_marl:
            action_shape = (self.n_agents, *self._action_space.shape)
        else:
            action_shape = self._action_space.shape
        self._zero_action = jnp.zeros(action_shape, self._dtype)

    # ------------------------------------------------------------------
    # abstract hooks (same set as reference fluid_env.py)
    # ------------------------------------------------------------------
    @abstractmethod
    def _get_action_space(self) -> spaces.Box: ...

    @abstractmethod
    def _get_observation_space(self) -> spaces.Dict: ...

    @abstractmethod
    def _get_domain(self) -> tuple[DomainTopo, tuple[BlockGeom, ...], DomainState]: ...

    @abstractmethod
    def _get_prep_fn(self) -> Hooks: ...

    @abstractmethod
    def _get_simulation(self) -> SimConfig: ...

    def _additional_initialization(self) -> None:
        pass

    @abstractmethod
    def _apply_action(self, action: Array) -> None: ...

    @abstractmethod
    def _get_global_obs(self) -> dict[str, Array]: ...

    def _get_local_obs(self) -> dict[str, Array]:
        raise NotImplementedError

    @abstractmethod
    def _randomize_domain(self) -> None: ...

    @abstractmethod
    def _get_render_data(self, render_3d: bool, output_path: Path | None = None) -> dict[str, np.ndarray]: ...

    @abstractmethod
    def _step_impl(self, action: Array) -> tuple[dict[str, Array], Array, bool, dict[str, Array]]: ...

    def _step_marl_impl(self, action: Array) -> tuple[Array, Array, bool, dict[str, Array]]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------
    @property
    def _logger(self) -> logging.Logger:
        return logging.getLogger(self.__class__.__name__)

    @property
    def action_space(self) -> spaces.Box:
        return self._action_space

    @property
    def observation_space(self) -> spaces.Dict:
        return self._observation_space

    @property
    def use_marl(self) -> bool:
        return self._use_marl

    @property
    @abstractmethod
    def n_agents(self) -> int: ...

    @property
    def step_length(self) -> float:
        return self._step_length

    @property
    def episode_length(self) -> int:
        return self._episode_length

    @property
    def dt(self) -> float:
        return self._dt

    @property
    def ndims(self) -> int:
        return self._ndims

    @property
    @abstractmethod
    def render_shape(self) -> tuple[int, ...]: ...

    @property
    def metrics(self) -> list[str]:
        return self._metrics

    @property
    def time_passed(self) -> float:
        return self._n_steps * self._step_length

    @property
    def _n_sim_steps(self) -> int:
        """Simulation steps per env step (fluid_env.py:839-842)."""
        return max(1, int(self._step_length / self._dt))

    @property
    def n_sim_steps(self) -> int:
        return self._n_sim_steps

    @property
    def mode(self) -> EnvMode:
        return self._mode

    @mode.setter
    def mode(self, mode: EnvMode) -> None:
        if mode not in (EnvMode.TRAIN, EnvMode.VAL, EnvMode.TEST):
            raise ValueError("mode must be 'train', 'val', or 'test'.")
        self._mode = mode

    @property
    def differentiable(self) -> bool:
        return self._differentiable

    @property
    @abstractmethod
    def id(self) -> str: ...

    @property
    @abstractmethod
    def initial_domain_id(self) -> str: ...

    @property
    def unwrapped(self) -> "FluidEnv":
        return self

    def train(self) -> None:
        self.mode = EnvMode.TRAIN

    def val(self) -> None:
        self.mode = EnvMode.VAL

    def test(self) -> None:
        self.mode = EnvMode.TEST

    # ------------------------------------------------------------------
    # RNG
    # ------------------------------------------------------------------
    def seed(self, seed: int) -> None:
        """Seed the env RNGs (fluid_env.py:844-860)."""
        if seed is None:
            raise ValueError("Seed cannot be None.")
        self._seed_value = int(seed)
        self._key = jax.random.PRNGKey(int(seed))
        self._np_rng = np.random.default_rng(int(seed))

    def _next_key(self) -> Array:
        if self._key is None:
            raise RuntimeError("Environment must be seeded first.")
        self._key, sub = jax.random.split(self._key)
        return sub

    def sample_action(self) -> Array:
        """Uniform random action from the action space (fluid_env.py:360)."""
        if self._seed_value is None:
            raise RuntimeError("Environment must be seeded before sampling actions.")
        low = jnp.asarray(self._action_space.low, self._dtype)
        high = jnp.asarray(self._action_space.high, self._dtype)
        r = jax.random.uniform(self._next_key(), self._zero_action.shape,
                               self._dtype)
        return low + (high - low) * r

    # ------------------------------------------------------------------
    # sim plumbing
    # ------------------------------------------------------------------
    def _jitted_single_step(self):
        """Jitted one-dt simulation step (compiled once per env config)."""
        if "single_step" not in self._jit_cache:
            geoms, topo, cfg, hooks = self._geoms, self._topo, self._cfg, self._hooks

            @jax.jit
            def fn(state: DomainState) -> DomainState:
                return single_step(state, geoms, topo, cfg, hooks)

            self._jit_cache["single_step"] = fn
        return self._jit_cache["single_step"]

    def _jitted_sim_steps(self):
        """Jitted scan over n_sim_steps single steps (one env step of physics)."""
        if "sim_steps" not in self._jit_cache:
            geoms, topo, cfg, hooks = self._geoms, self._topo, self._cfg, self._hooks
            n = self._n_sim_steps

            @jax.jit
            def fn(state: DomainState) -> DomainState:
                def body(s, _):
                    return single_step(s, geoms, topo, cfg, hooks), None

                state2, _ = jax.lax.scan(body, state, None, length=n)
                return state2

            self._jit_cache["sim_steps"] = fn
        return self._jit_cache["sim_steps"]

    def _run_sim_steps(self) -> None:
        """Advance the held state by one env step of physical time."""
        self._state = self._jitted_sim_steps()(self._state)

    def _run_single_step(self) -> None:
        self._state = self._jitted_single_step()(self._state)

    # -- pure step protocol (enables vmap batching and fused jit) ----------
    def _pure_step(self, state: DomainState, action: Array):
        """Pure env step: ``(state, action) -> (state, obs, reward, info)``.

        Subclasses that implement this get (a) a single fused jit call per
        env step and (b) vmap batching via ``parallel.BatchedFluidEnv`` (the
        TPU-native replacement of the reference's process-per-GPU
        ParallelFluidEnv).  Must only close over static configuration.
        """
        raise NotImplementedError

    def _pure_local_obs(self, state: DomainState):
        """Pure MARL observation extraction from a domain state."""
        raise NotImplementedError

    def _trace_fingerprint(self) -> tuple:
        """Hashable snapshot of every MUTABLE attribute that gets baked into
        jitted-step traces as a compile-time constant (action gating, reward
        normalization references from the loaded statistics).  Part of the
        jit-cache key: without it, toggling ``_enable_actions`` (env.init())
        or loading statistics after the first trace would silently keep
        running the stale program."""
        stats = tuple(sorted(
            (k, tuple(v.__dict__.items()) if hasattr(v, "__dict__")
             else tuple(v))
            for k, v in self._metrics_stats.items()
        ))
        return (self._enable_actions, stats)

    def _sync_jit_cache(self) -> None:
        """Invalidate cached jitted programs when any trace-baked value
        changed (config, topology, or the mutable fingerprint)."""
        key = (self._topo, self._cfg, self._trace_fingerprint())
        if getattr(self, "_jit_key", None) != key:
            self._jit_cache.clear()
            self._jit_key = key

    def _jitted_env_step(self):
        self._sync_jit_cache()
        if "env_step" not in self._jit_cache:
            self._jit_cache["env_step"] = jax.jit(self._pure_step)
        return self._jit_cache["env_step"]

    # ------------------------------------------------------------------
    # initial state
    # ------------------------------------------------------------------
    def _initial_domain_path(self, mode: EnvMode, idx: int,
                             write: bool = False,
                             user_only: bool = False) -> Path:
        return (data_utils.initial_domain_dir(
                    self.initial_domain_id, write=write, user_only=user_only)
                / f"{mode.value}_{idx:02d}")

    def _load_initial_domain(self, mode: EnvMode, idx: int,
                             user_only: bool = False):
        return load_domain(
            self._initial_domain_path(mode, idx, user_only=user_only),
            dtype=self._dtype)

    def _save_initial_domain(self, mode: EnvMode, idx: int) -> None:
        save_domain(self._topo, self._geoms, self._state,
                    self._initial_domain_path(mode, idx, write=True))

    def _available_domain_indices(self, mode: EnvMode,
                                  user_only: bool = False) -> list[int]:
        """Indices of saved initial domains present for ``mode``.

        Bundled datasets may ship fewer than ``N_INITIAL_DOMAINS`` snapshots
        for the expensive 3D configs; loading picks among what exists rather
        than assuming the reference's fixed count of 10 (fluid_env.py:58)."""
        root = data_utils.initial_domain_dir(
            self.initial_domain_id, user_only=user_only)
        out = []
        for p in sorted(root.glob(f"{mode.value}_*.json")):
            stem = p.stem.rsplit("_", 1)[-1]
            if stem.isdigit() and p.with_suffix(".npz").exists():
                out.append(int(stem))
        return out

    def _check_initial_domains_exist(self, mode: EnvMode | None = None,
                                     idx: int | None = None,
                                     user_only: bool = False) -> bool:
        modes = list(MODE_SEEDS) if mode is None else [mode]
        idxs = range(N_INITIAL_DOMAINS) if idx is None else [idx]
        try:
            for i in idxs:
                for m in modes:
                    self._load_initial_domain(m, i, user_only=user_only)
            return True
        except FileNotFoundError:
            return False

    def _set_initial_state(self, randomize: bool | None = None) -> None:
        """(Re)build topo/geoms/state (+sim config) for a new episode
        (fluid_env.py:507-551)."""
        if randomize is None:
            randomize = self._randomize_initial_state

        if self._load_domain_on_reset:
            try:
                avail = self._available_domain_indices(self.mode)
                if not avail:
                    raise FileNotFoundError(
                        f"no initial domains for {self.initial_domain_id}")
                idx = (int(avail[self._np_rng.integers(0, len(avail))])
                       if randomize else avail[0])
                self._topo, self._geoms, self._state = self._load_initial_domain(
                    self.mode, idx
                )
                try:
                    self._uncontrolled_episode = data_utils.load_uncontrolled_episode(
                        self.initial_domain_id, self.mode.value, idx
                    )
                except FileNotFoundError:
                    self._uncontrolled_episode = None
            except FileNotFoundError as err:
                raise RuntimeError(
                    "Initial domain not found. Generate it with env.init() or "
                    "construct the env with load_initial_domain=False."
                ) from err
        else:
            self._topo, self._geoms, self._state = self._get_domain()

        self._hooks = self._get_prep_fn()
        new_cfg = self._get_simulation()
        # retain compiled steps across resets: hooks/geoms are rebuilt every
        # reset but are pure functions of the STATIC env config, so cached
        # jitted closures stay valid as long as (topo, cfg) are unchanged --
        # without this every reset (and every env slot of a BatchedFluidEnv
        # reset) recompiles the full PISO step
        key = (self._topo, new_cfg, self._trace_fingerprint())
        if getattr(self, "_jit_key", None) != key:
            self._jit_cache.clear()
            self._jit_key = key
        self._cfg = new_cfg
        self._additional_initialization()

        if getattr(self._cfg, "pressure_coarse_tile", 0):
            # host-side, once per operator key: the Galerkin aggregation
            # coarse matrix for the 2-level pressure preconditioner, baked
            # into the jitted step as constants (solver/piso.py:
            # ensure_agg_coarse_cache).  If the call REPLACED an existing
            # entry (viscosity changed, or a caller forced a rebuild), any
            # step traced earlier baked the old E — drop the compiled steps
            # so the next trace picks up the fresh constants.
            from fluidgym_tpu.solver import piso as _piso

            gen0 = _piso.agg_cache_generation()
            _piso.ensure_agg_coarse_cache(
                self._state, self._geoms, self._topo, self._cfg)
            if _piso.agg_cache_generation() != gen0:
                self._jit_cache.clear()

        if randomize:
            self._randomize_domain()

    # ------------------------------------------------------------------
    # core loop
    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None, randomize: bool | None = None):
        """Reset to an initial state (fluid_env.py:862-917)."""
        if self._auto_render and len(self._frames) > 0:
            self.save_gif(filename=f"episode_{self._n_episodes}")
        self._frames = defaultdict(list)

        if seed is None:
            if self._seed_value is None:
                raise ValueError(
                    "Seed must be provided either during reset or by calling seed()."
                )
        else:
            self.seed(seed)

        self._set_initial_state(randomize=randomize)
        self._reset_called = True
        self._n_steps = 0
        self._n_episodes += 1
        self._solver_warned = False

        self._apply_action(self._zero_action)
        obs = self._get_local_obs() if self._use_marl else self._get_global_obs()
        info: dict[str, Array] = {}
        return obs, info

    def step(self, action: Array):
        """One env step (fluid_env.py:749-800)."""
        if not self._reset_called:
            raise RuntimeError(
                "Environment must be reset before stepping. Call 'reset()' "
                "before 'step()'."
            )
        action = jnp.asarray(action, self._dtype)
        if action.shape != self._zero_action.shape:
            raise ValueError(
                f"Action shape {action.shape} does not match expected shape "
                f"{self._zero_action.shape}."
            )
        if self._n_steps >= self._episode_length:
            raise RuntimeError("Episode has already terminated. Call 'reset()' first.")

        if self._use_marl:
            obs, reward, terminated, info = self._step_marl_impl(action)
        else:
            obs, reward, terminated, info = self._step_impl(action)

        self._n_steps += 1
        truncated = self._n_steps >= self._episode_length
        if self._auto_render:
            self.render()
        info = {k: jax.lax.stop_gradient(v) for k, v in info.items()}
        self._check_solver_health(info)
        return obs, reward, terminated, truncated, info

    def _check_solver_health(self, info: dict) -> None:
        """Surface solver failure on the host stepping path (the reference
        raises LinsolveError and returns False from single_step,
        PISOtorch_diff.py:262-371, simulation.py:266-280; jitted programs
        cannot raise, so the flags come back as data in ``info``).  Warnings
        are throttled to once per episode per signal."""
        if not self._warn_solver_failure or "pressure_converged" not in info:
            return
        if not bool(np.asarray(info["pressure_converged"]).all()):
            if not self._solver_warned:
                self._solver_warned = True
                self._logger.warning(
                    "Pressure solve did not converge at env step %d "
                    "(max residual %.3e over the step's solves); the "
                    "best-so-far iterate was used. See info['pressure_*'].",
                    self._n_steps,
                    float(np.asarray(info["pressure_residual"]).max()),
                )
        res = np.asarray(info["pressure_residual"])
        if not np.isfinite(res).all():
            raise FloatingPointError(
                f"Pressure solve produced a non-finite residual at env step "
                f"{self._n_steps}: the simulation state has diverged (the "
                f"reference's LinsolveError). Reduce dt / check boundary "
                f"conditions, or reset the environment."
            )

    # ------------------------------------------------------------------
    # state management
    # ------------------------------------------------------------------
    def get_state(self) -> EnvState:
        """Snapshot env state (fluid_env.py:1320-1341)."""
        return EnvState(
            class_name=self.__class__.__name__,
            domain=self._state,
            n_steps=self._n_steps,
            mode=self._mode,
            additional_info=self._get_additional_state_info(),
        )

    def set_state(self, state: EnvState) -> None:
        """Restore a snapshot (fluid_env.py:1343-1363)."""
        if state.class_name != self.__class__.__name__:
            raise ValueError(
                f"EnvState is for {state.class_name}, not {self.__class__.__name__}"
            )
        if self._topo is None:
            if self._np_rng is None:
                # the placeholder build below needs RNG plumbing; its values
                # are overwritten by the snapshot, so the seed is irrelevant
                self.seed(0)
            # need the sim machinery first; build it from scratch (without
            # randomization) so subclass init hooks see a REAL domain state,
            # then overwrite with the restored snapshot below
            if self._load_domain_on_reset:
                self._set_initial_state(randomize=False)
            else:
                self._topo, self._geoms, self._state = self._get_domain()
                self._hooks = self._get_prep_fn()
                self._cfg = self._get_simulation()
                self._jit_cache.clear()
                self._jit_key = (self._topo, self._cfg,
                                 self._trace_fingerprint())
                self._additional_initialization()
        self._state = jax.lax.stop_gradient(state.domain)
        self._n_steps = state.n_steps
        self._mode = state.mode
        self._set_additional_state_info(state.additional_info)
        self._reset_called = True

    def _get_additional_state_info(self) -> dict[str, Any]:
        return {}

    def _set_additional_state_info(self, info: dict[str, Any]) -> None:
        pass

    @property
    def _blocks_vertex_coords(self):
        """Per-block vertex coordinate arrays (set by ``_get_domain``
        implementations; subclasses with a ``_build_domain`` override this)."""
        cache = getattr(self, "_vertex_coords_cache", None)
        if cache is None:
            raise AttributeError(
                "vertex coordinates are not available for this env")
        return cache

    def plot_grid(self, output_path=None, name: str | None = None,
                  linewidth: float = 0.5):
        """Plot the multi-block mesh wireframe (reference plot_grids,
        pict/util/output.py:178-360; fluid_env.py:1291-1306).  3D grids are
        plotted as their z=0 slice.  Returns (fig, ax)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        grids = [np.asarray(g) for g in self._blocks_vertex_coords]
        if self._ndims == 3:
            grids = [g[:2, 0] for g in grids]
        fig, ax = plt.subplots(figsize=(10, 4))
        colors = plt.cm.tab10.colors
        for i, g in enumerate(grids):
            c = colors[i % len(colors)]
            for r in range(g.shape[1]):
                ax.plot(g[0, r, :], g[1, r, :], color=c, linewidth=linewidth)
            for col in range(g.shape[2]):
                ax.plot(g[0, :, col], g[1, :, col], color=c, linewidth=linewidth)
        ax.set_aspect("equal")
        if output_path is not None:
            p = Path(output_path)
            p.mkdir(parents=True, exist_ok=True)
            fig.savefig(p / f"{name or self.id}_grid.pdf")
            plt.close(fig)
        return fig, ax

    def _pure_carry(self):
        """The pytree threaded through ``_pure_step`` (DomainState by
        default; envs with auxiliary carried state override)."""
        return self._state

    def _set_pure_carry(self, carry) -> None:
        self._state = carry

    def save_field_images(self, output_path, prefix: str | None = None,
                          cmap: str = "viridis") -> list:
        """Dump every available resampled field (velocity / pressure /
        vorticity / temperature) as per-channel PNGs plus a lossless float32
        npz -- the reference's ``save_*_image`` field-output suite
        (pict/util/output.py:412-1111; EXR replaced by npz, see
        utils/field_io.py).  Returns the written paths."""
        from fluidgym_tpu.utils.field_io import save_field_images

        fields = {}
        for name, getter in (
            ("velocity", "get_velocity"),
            ("pressure", "get_pressure"),
            ("vorticity", "get_vorticity"),
            ("temperature", "get_temperature"),
        ):
            fn = getattr(self, getter, None)
            if fn is not None:
                fields[name] = np.asarray(jax.device_get(fn()))
        if not fields:
            raise NotImplementedError(
                f"{self.__class__.__name__} exposes no resampled field "
                "getters (get_velocity/get_pressure/...)")
        return save_field_images(
            fields, output_path,
            prefix=prefix or f"{self.id}_e{self._n_episodes}_s{self._n_steps}",
            cmap=cmap,
            # env getters pre-select scalar channels; only velocity keeps a
            # component axis
            channel_fields=("velocity",))

    def get_uncontrolled_episode_metrics(self):
        """Per-step metrics of the uncontrolled episode matching the loaded
        (non-randomized) initial domain, as a DataFrame, or None if absent
        (reference fluid_env.py:1266-1278)."""
        ep = getattr(self, "_uncontrolled_episode", None)
        if ep is None:
            return None
        import pandas as pd

        return pd.DataFrame(ep)

    def detach(self) -> None:
        """Sever gradient flow between horizons (fluid_env.py:1280-1289);
        pytree equivalent of Domain.Detach()."""
        self._state = jax.lax.stop_gradient(self._state)

    def load_initial_domain(self, mode: EnvMode, idx: int,
                            user_only: bool = False) -> None:
        """Load a specific initial domain snapshot (fluid_env.py:1088-1112)."""
        self._topo, self._geoms, self._state = self._load_initial_domain(
            mode, idx, user_only=user_only)
        self._hooks = self._get_prep_fn()
        new_cfg = self._get_simulation()
        key = (self._topo, new_cfg, self._trace_fingerprint())
        if getattr(self, "_jit_key", None) != key:
            self._jit_cache.clear()
            self._jit_key = key
        self._cfg = new_cfg
        self._additional_initialization()
        self._reset_called = True
        self._n_steps = 0

    # ------------------------------------------------------------------
    # statistics
    # ------------------------------------------------------------------
    def _load_domain_statistics(self) -> None:
        try:
            raw = data_utils.load_statistics(self.initial_domain_id)
            self._metrics_stats = {k: Stats(**v) for k, v in raw.items()}
        except FileNotFoundError:
            self._logger.warning(
                "Domain statistics not found for %s; metrics will use defaults.",
                self.initial_domain_id,
            )
            self._metrics_stats = {}

    def _save_domain_statistics(self, values: dict[str, np.ndarray]) -> None:
        stats = {k: Stats.from_values(v)._asdict() for k, v in values.items()}
        data_utils.save_statistics(self.initial_domain_id, stats)
        self._metrics_stats = {k: Stats(**v) for k, v in stats.items()}

    # -- episode-trace sanity -------------------------------------------
    #
    # Domain statistics normalize every reward in training, so a handful of
    # non-converged or transient-contaminated steps in one snapshot's
    # uncontrolled episode shifts the reward zero-point of every run on that
    # config.  Rows are screened before pooling, and whole episodes are
    # screened before a snapshot is considered developed.

    #: pooled rows whose solver did not converge are always dropped
    _STATS_MAD_CLIP = 8.0   # row outlier: any metric beyond median +- k*MAD
    _EPISODE_MAX_BAD_FRACTION = 0.10

    @staticmethod
    def _episode_row_masks(rows: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        """Per-row screening masks for an uncontrolled-episode trace.

        Returns ``(converged, inlier)`` boolean arrays: ``converged`` is
        False where any solver stage (pressure, advection, ...) reported
        failure; ``inlier`` is False where any metric deviates more than
        ``_STATS_MAD_CLIP`` robust sigmas (MAD-based) from that metric's
        median across the given rows."""
        n = len(rows)
        conv_keys = [k for k in rows[0] if k.endswith("_converged")] \
            or ["pressure_converged"]
        converged = np.array(
            [all(float(r.get(k, 1.0)) >= 0.5 for k in conv_keys)
             for r in rows])
        inlier = np.ones(n, bool)
        if n < 8:   # too short for robust statistics; keep everything
            return converged, inlier
        # Screen PHYSICS metrics only.  Solver diagnostics are excluded: the
        # iteration count is quantized by the restart chunk size, so its MAD
        # collapses to ~0 and the sigma floor turns the 8-sigma clip into a
        # few-iteration band that rejects perfectly healthy rows (measured:
        # up to 60% of RBC rows dropped, crushing the nusselt spread the
        # reward normalization depends on); the residual is tol-bounded by
        # construction and carries no physics.  ``*_converged`` flags are
        # near-constant binaries (MAD ~0, so any failed step would read as a
        # "metric outlier"); they belong in the converged mask above, not
        # the outlier screen.
        keys = [k for k in rows[0]
                if not k.startswith("pressure_")
                and not k.endswith("_converged")
                and all(k in r for r in rows)]
        for k in keys:
            v = np.asarray([float(r[k]) for r in rows])
            med = np.median(v)
            # 1.4826*MAD estimates sigma for a normal distribution; floor it
            # so near-constant metrics don't flag numeric noise
            sigma = max(1.4826 * np.median(np.abs(v - med)),
                        1e-9 + 1e-3 * abs(med))
            inlier &= np.abs(v - med) <= FluidEnv._STATS_MAD_CLIP * sigma
        return converged, inlier

    def episode_sanity_violations(self, rows: list[dict]) -> list[str]:
        """Physics sanity screen for one uncontrolled-episode trace; returns
        human-readable violations (empty = trace looks like a developed,
        stationary uncontrolled flow).  Families override
        ``_episode_physics_violations`` to add domain bounds (e.g. the
        airfoil requires positive drag on a stationary body)."""
        out = []
        if not rows:
            return ["episode trace is empty"]
        converged, inlier = self._episode_row_masks(rows)
        bad = 1.0 - float(converged.mean())
        if bad > 0.05:
            out.append(f"pressure solver failed on {bad:.0%} of steps")
        bad = 1.0 - float(inlier.mean())
        if bad > self._EPISODE_MAX_BAD_FRACTION:
            out.append(f"{bad:.0%} of steps are metric outliers "
                       f"(>{self._STATS_MAD_CLIP} robust sigma)")
        out.extend(self._episode_physics_violations(rows))
        return out

    def _episode_physics_violations(self, rows: list[dict]) -> list[str]:
        """Family-specific physics bounds on an episode trace (override)."""
        return []

    def _pool_statistics_rows(
            self, all_rows: list[dict]) -> dict[str, np.ndarray]:
        """Pool episode rows into per-metric value arrays for the domain
        statistics, dropping rows where the pressure solve failed and
        robust-sigma outlier rows so the normalization references reflect
        the stationary uncontrolled flow (the reference pools raw rows;
        screening here is a documented deviation — docs/data.md).

        The outlier mask is only trusted when it is SPARSE: row-level
        screening exists to drop a handful of contaminated steps, and a mask
        that flags more than ``_EPISODE_MAX_BAD_FRACTION`` of the pooled rows
        is reading distribution structure, not contamination (measured on the
        bundled RBC NH24 configs: nusselt is multi-modal across snapshots, so
        a MAD clip centered on the dominant mode rejected ~40% of healthy
        rows and collapsed the spread the reward normalization depends on).
        Mass-flagged pools keep every converged row; systemically bad
        episodes are handled upstream by the per-episode sanity screen."""
        converged, inlier = self._episode_row_masks(all_rows)
        out_frac = float((converged & ~inlier).mean()) if len(all_rows) else 0
        if out_frac > self._EPISODE_MAX_BAD_FRACTION:
            self._logger.warning(
                "domain statistics: outlier screen flagged %.0f%% of pooled "
                "rows — treating as multi-modal physics, keeping all "
                "converged rows", 100 * out_frac)
            inlier = np.ones(len(all_rows), bool)
        keep = converged & inlier
        n_drop = int((~keep).sum())
        if n_drop:
            self._logger.warning(
                "domain statistics: dropped %d/%d pooled steps "
                "(%d non-converged, %d outliers)", n_drop, len(all_rows),
                int((~converged).sum()), int((converged & ~inlier).sum()))
        if not keep.any():   # pathological: keep raw rather than nothing
            keep = np.ones(len(all_rows), bool)
        kept = [r for r, k in zip(all_rows, keep) if k]
        keys = [k for k in kept[0] if all(k in r for r in kept)]
        return {k: np.asarray([float(r[k]) for r in kept]) for k in keys}

    # ------------------------------------------------------------------
    # initial-domain generation (offline; fluid_env.py:1114-1190)
    # ------------------------------------------------------------------
    def init(self, n_domains: int = N_INITIAL_DOMAINS, verbose: bool = True,
             episode_steps: int | None = None, amortize: bool = False,
             amortize_gap: int | None = None) -> None:
        """Generate the initial-domain dataset, uncontrolled-episode
        baselines, and metric statistics (reference init,
        fluid_env.py:1114-1190).

        Stage 1 -- domains: burn in from the train seed and snapshot; when
        ``_initial_domain_restart`` is False the SAME simulation continues
        ~10% further for the val and test snapshots (reference :1173-1187),
        otherwise each mode burns in from its own seed.  Already-existing
        domains are skipped, so an interrupted run resumes.

        Stage 2 -- baselines: a zero-action EPISODE (``episode_steps``,
        default ``episode_length``) is run FROM each saved domain; its
        per-step metrics become the uncontrolled-episode CSV (what
        ``get_uncontrolled_episode_metrics`` pairs with the loaded domain)
        and are pooled into the domain statistics.  Episodes whose CSV
        already exists with enough rows are reused, so interrupted runs
        resume cheaply.

        ``amortize=True`` (non-restart configs only) replaces the
        reference's independent burn-in per snapshot (fluid_env.py:1156-1166)
        with ONE stationary run: a full burn-in for the first snapshot, then
        a decorrelation gap of ``amortize_gap`` steps (default 10% of the
        burn-in) between subsequent snapshots.  For statistically stationary
        turbulence (TCF, developed wakes) the snapshots are equally
        independent at a fraction of the cost -- the difference from the
        reference is documented here because the generated datasets are
        otherwise drop-in compatible.
        """
        was_loading = self._load_domain_on_reset
        was_actions = self._enable_actions
        self._load_domain_on_reset = False
        self._enable_actions = False
        episode_steps = int(episode_steps or self.episode_length)
        try:
            # ---- stage 1: domain snapshots ------------------------------
            amortize = amortize and not self._initial_domain_restart
            gen_modes = (list(MODE_SEEDS) if self._initial_domain_restart
                         else [EnvMode.TRAIN])
            running = False  # amortized: a stationary run is in progress
            for idx in range(n_domains):
                if self._check_initial_domains_exist(idx=idx, user_only=True):
                    if verbose:
                        self._logger.info(
                            "init: domains for idx=%d exist; skipping", idx)
                    continue
                for mode in gen_modes:
                    self.mode = mode
                    steps = self._initial_domain_steps
                    jitter = int(round(steps * 0.15))
                    gap = (int(amortize_gap) if amortize_gap
                           else max(1, int(steps * 0.1)))
                    if amortize and not running and idx > 0:
                        # resume the stationary run from the latest snapshot
                        self.reset(seed=MODE_SEEDS[mode] + idx, randomize=False)
                        self.load_initial_domain(EnvMode.TEST, idx - 1,
                                                 user_only=True)
                        running = True
                    if amortize and running:
                        steps = gap + (int(self._np_rng.integers(
                            -gap // 4, gap // 4 + 1)) if gap >= 4 else 0)
                    else:
                        self.reset(seed=MODE_SEEDS[mode] + idx, randomize=False)
                        if jitter:
                            steps = int(steps + self._np_rng.integers(
                                -jitter, jitter + 1))
                    if verbose:
                        self._logger.info(
                            "init: mode=%s idx=%d burn-in %d env steps",
                            mode.value, idx, steps)
                    for _ in range(steps):
                        self.step(self._zero_action)
                        self._n_steps = 0  # burn-in never truncates
                    self._save_initial_domain(mode, idx)
                    if not self._initial_domain_restart:
                        # continue the same run for the val/test snapshots
                        extra = gap if amortize else max(1, int(steps * 0.1))
                        for extra_mode in (EnvMode.VAL, EnvMode.TEST):
                            for _ in range(extra):
                                self.step(self._zero_action)
                                self._n_steps = 0
                            self._save_initial_domain(extra_mode, idx)
                        running = amortize

            # ---- stage 2: uncontrolled episodes + statistics ------------
            all_rows: list[dict] = []
            for mode in MODE_SEEDS:
                self.mode = mode
                for idx in range(n_domains):
                    try:  # resume: reuse an already-recorded episode --
                        # but only if it passes the same sanity screen new
                        # recordings get, so a contaminated pre-screening
                        # trace is repaired instead of pooled verbatim
                        rows = [
                            {k: float(v) for k, v in r.items()}
                            for r in data_utils.load_uncontrolled_episode(
                                self.initial_domain_id, mode.value, idx)
                        ]
                        if len(rows) >= episode_steps:
                            violations = self.episode_sanity_violations(rows)
                            if not violations:
                                all_rows.extend(rows)
                                continue
                            self._logger.warning(
                                "init: recorded episode mode=%s idx=%d fails "
                                "sanity (%s); re-recording",
                                mode.value, idx, "; ".join(violations))
                    except FileNotFoundError:
                        pass
                    rows = self._record_uncontrolled_episode(
                        mode, idx, episode_steps, verbose)
                    all_rows.extend(rows)
            if all_rows:
                self._save_domain_statistics(
                    self._pool_statistics_rows(all_rows))
        finally:
            self._load_domain_on_reset = was_loading
            self._enable_actions = was_actions
            self.mode = EnvMode.TRAIN

    def _record_uncontrolled_episode(self, mode: EnvMode, idx: int,
                                     episode_steps: int,
                                     verbose: bool) -> list[dict]:
        """Roll one zero-action episode from the saved (mode, idx) snapshot
        and persist its per-step metrics CSV.

        The trace is screened by ``episode_sanity_violations``; a snapshot
        whose uncontrolled episode is non-stationary (solver failures,
        metric outliers, family physics bounds) is treated as UNDERDEVELOPED:
        its burn-in is extended in place by 50% of ``_initial_domain_steps``,
        the snapshot is re-saved, and the episode re-recorded (two repair
        attempts, then the best trace ships with a loud warning)."""
        best_rows: list[dict] | None = None
        best_score: tuple[int, float] = (2, float("inf"))
        for attempt in range(3):
            self.load_initial_domain(mode, idx, user_only=True)
            self.seed(MODE_SEEDS[mode] + idx)
            if verbose:
                self._logger.info(
                    "init: uncontrolled episode mode=%s idx=%d (%d steps)%s",
                    mode.value, idx, episode_steps,
                    f" [repair attempt {attempt}]" if attempt else "")
            rows = []
            for _ in range(episode_steps):
                _, _, _, _, info = self.step(self._zero_action)
                self._n_steps = 0
                rows.append({
                    k: float(np.asarray(v)) for k, v in info.items()
                    if np.asarray(v).size == 1})
            violations = self.episode_sanity_violations(rows)
            # track the best attempt (clean beats violating, then fewest
            # bad rows) so a repair that makes things WORSE never ships
            converged, inlier = self._episode_row_masks(rows)
            bad_frac = 1.0 - float((converged & inlier).mean()) if len(rows) \
                else 1.0
            score = (1 if violations else 0, bad_frac)
            if score < best_score:
                best_rows, best_score = rows, score
            if not violations:
                break
            if attempt == 2:
                self._logger.warning(
                    "init: episode mode=%s idx=%d STILL fails sanity after "
                    "repairs (%s); shipping the best attempt "
                    "(%.0f%% bad rows) — inspect this snapshot",
                    mode.value, idx, "; ".join(violations),
                    100.0 * best_score[1])
                break
            extra = max(1, self._initial_domain_steps // 2)
            self._logger.warning(
                "init: episode mode=%s idx=%d fails sanity (%s); extending "
                "burn-in by %d steps and re-recording",
                mode.value, idx, "; ".join(violations), extra)
            # the episode above already advanced the state past the snapshot;
            # keep marching from here so the extension builds on it
            for _ in range(extra):
                self.step(self._zero_action)
                self._n_steps = 0
            self._save_initial_domain(mode, idx)
        rows = best_rows if best_rows is not None else rows
        data_utils.save_uncontrolled_episode(
            self.initial_domain_id, mode.value, idx, rows)
        return rows

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------
    @staticmethod
    def _format_render_data(data: np.ndarray, v_min=None, v_max=None,
                            cmap: str = "viridis") -> np.ndarray:
        """Normalize + colormap to uint8 RGB (fluid_env.py:710-747)."""
        import matplotlib

        _v_min = np.min(data) if v_min is None else v_min
        _v_max = np.max(data) if v_max is None else v_max
        data = np.flip(data, axis=1)
        data = np.clip((data - _v_min) / (_v_max - _v_min + 1e-30), 0.0, 1.0)
        return (matplotlib.colormaps[cmap](data)[..., :3] * 255).astype(np.uint8)

    def render(self, save: bool = False, render_3d: bool = False,
               filename: str | None = None, output_path: Path | None = None) -> np.ndarray:
        """Render the current state; returns the default-key frame
        (fluid_env.py:919-1018)."""
        output_path = Path(output_path) if output_path else Path(".")
        render_data = self._get_render_data(
            render_3d=render_3d, output_path=output_path if save else None
        )
        for name, frame in render_data.items():
            self._frames[name].append(frame)
            if save:
                from PIL import Image

                output_path.mkdir(parents=True, exist_ok=True)
                fname = filename or f"frame_{self._n_steps:04d}"
                Image.fromarray(frame).save(output_path / f"{fname}_{name}.png")
        return render_data[self._default_render_key]

    def save_gif(self, filename: str = "episode", output_path: Path | None = None,
                 fps: int | None = None) -> None:
        """Write accumulated frames as GIF(s) (fluid_env.py:1020-1045)."""
        from PIL import Image

        output_path = Path(output_path) if output_path else Path(".")
        output_path.mkdir(parents=True, exist_ok=True)
        fps = fps or self.metadata["render_fps"]
        for name, frames in self._frames.items():
            if not frames:
                continue
            imgs = [Image.fromarray(f) for f in frames]
            imgs[0].save(
                output_path / f"{filename}_{name}.gif",
                save_all=True,
                append_images=imgs[1:],
                duration=int(1000 / fps),
                loop=0,
            )
        self._frames = defaultdict(list)
