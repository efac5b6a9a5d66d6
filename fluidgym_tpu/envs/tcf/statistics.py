"""Turbulent-channel velocity/pressure statistics recorder.

Functional re-expression of the reference ``VelocityStats`` and
``PISOTCFProfile`` (``/root/reference/src/fluidgym/simulation/pict/data/
TCF_tools.py:92-2239``): records running wall-normal profiles of the velocity
moments (mean, rms, Reynolds shear stress, skewness, flatness) and pressure
fluctuations averaged over x-z planes, tracks the instantaneous wall stress /
u_tau, converts to wall units, compares against reference DNS profiles (see
:mod:`fluidgym_tpu.envs.tcf.reference_profiles`), and saves / loads / plots.
The accumulation is a pure pytree update usable inside jitted rollouts (the
reference's is host-side torch).
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.envs.tcf import tools

Array = jax.Array

__all__ = ["VelocityStatsState", "velocity_stats_init", "velocity_stats_update",
           "velocity_stats_finalize", "VelocityStats", "SavedRunProfile"]

STAT_KEYS = ("U+", "V+", "W+", "u'+", "v'+", "w'+", "uv'+")
#: higher-order / pressure keys (PISOTCFProfile.Profiles, TCF_tools.py:97-110)
EXTRA_KEYS = ("p'", "Su'+", "Sv'+", "Sw'+", "Sp'+",
              "Fu'+", "Fv'+", "Fw'+", "Fp'+")


class VelocityStatsState(NamedTuple):
    """Running raw moments of plane-averaged quantities; profiles over y.
    Channel 0-2 = (u, v, w); channel 3 = pressure."""

    count: Array
    mean: Array      # (4, ny) running mean of (u, v, w, p)
    msq: Array       # (4, ny) running mean of squares
    m3: Array        # (4, ny) running mean of cubes (skewness)
    m4: Array        # (4, ny) running mean of 4th powers (flatness)
    uv: Array        # (ny,) running mean of u*v
    dudy_wall: Array  # (2,) running mean of |du/dy| at (bottom, top)


def velocity_stats_init(ny: int, dtype=jnp.float32) -> VelocityStatsState:
    return VelocityStatsState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((4, ny), dtype),
        msq=jnp.zeros((4, ny), dtype),
        m3=jnp.zeros((4, ny), dtype),
        m4=jnp.zeros((4, ny), dtype),
        uv=jnp.zeros((ny,), dtype),
        dudy_wall=jnp.zeros((2,), dtype),
    )


def velocity_stats_update(state: VelocityStatsState, velocity: Array,
                          d_wall: Array,
                          pressure: Array | None = None) -> VelocityStatsState:
    """Accumulate one snapshot.  ``velocity``: (3, nz, ny, nx); ``pressure``:
    (nz, ny, nx) or None; ``d_wall``: wall distance of the first cell layer
    (for du/dy)."""
    if pressure is None:
        fields = jnp.concatenate(
            [velocity, jnp.zeros_like(velocity[:1])], axis=0)
    else:
        fields = jnp.concatenate([velocity, pressure[None]], axis=0)
    prof = fields.mean(axis=(1, 3))                          # (4, ny)
    prof2 = (fields**2).mean(axis=(1, 3))
    prof3 = (fields**3).mean(axis=(1, 3))
    prof4 = (fields**4).mean(axis=(1, 3))
    uv_prof = (velocity[0] * velocity[1]).mean(axis=(0, 2))  # (ny,)

    n = state.count + 1.0
    u_mean = velocity[0].mean(axis=(0, 2))
    dudy = jnp.stack([jnp.abs(u_mean[0]) / d_wall, jnp.abs(u_mean[-1]) / d_wall])
    return VelocityStatsState(
        count=n,
        mean=state.mean + (prof - state.mean) / n,
        msq=state.msq + (prof2 - state.msq) / n,
        m3=state.m3 + (prof3 - state.m3) / n,
        m4=state.m4 + (prof4 - state.m4) / n,
        uv=state.uv + (uv_prof - state.uv) / n,
        dudy_wall=state.dudy_wall + (dudy - state.dudy_wall) / n,
    )


def velocity_stats_finalize(state: VelocityStatsState, viscosity: float):
    """(profiles dict in wall units, u_wall) from the accumulated moments.

    Central moments from raw moments; skewness/flatness are standardized
    (scale-invariant, so wall-unit conversion is the identity -- matching the
    reference's get_moment_standardized, online_statistics.py)."""
    var = jnp.maximum(state.msq - state.mean**2, 0.0)
    m = state.mean
    m3c = state.m3 - 3 * m * state.msq + 2 * m**3
    m4c = state.m4 - 4 * m * state.m3 + 6 * m**2 * state.msq - 3 * m**4
    sd = jnp.sqrt(var)
    tiny = jnp.asarray(1e-30, var.dtype)
    skew = m3c / jnp.maximum(sd**3, tiny)
    flat = m4c / jnp.maximum(var**2, tiny)
    cov_uv = state.uv - state.mean[0] * state.mean[1]
    u_wall = jnp.sqrt(viscosity * state.dudy_wall.mean())
    prof = {
        "U+": m[0] / u_wall,
        "V+": m[1] / u_wall,
        "W+": m[2] / u_wall,
        "u'+": sd[0] / u_wall,
        "v'+": sd[1] / u_wall,
        "w'+": sd[2] / u_wall,
        "uv'+": cov_uv / u_wall**2,
        "p'": sd[3] / u_wall**2,  # pressure scales with u_tau^2
        "Su'+": skew[0], "Sv'+": skew[1], "Sw'+": skew[2], "Sp'+": skew[3],
        "Fu'+": flat[0], "Fv'+": flat[1], "Fw'+": flat[2], "Fp'+": flat[3],
    }
    return prof, u_wall


class VelocityStats:
    """Host-side convenience wrapper: record / save / load / plot / compare.

    ``pos_y``: wall-normal cell-center positions in [-1, 1] (channel
    half-height units); ``viscosity``: kinematic viscosity.
    """

    def __init__(self, pos_y: np.ndarray, viscosity: float):
        self.pos_y = np.asarray(pos_y)
        self.viscosity = float(viscosity)
        d_wall = max(float(1.0 + self.pos_y[0]), 1e-12)  # first center to wall
        self._d_wall = d_wall
        self.state = velocity_stats_init(len(self.pos_y))
        self._update = jax.jit(velocity_stats_update)

    def record(self, velocity: Array, pressure: Array | None = None) -> None:
        self.state = self._update(self.state, velocity,
                                  jnp.asarray(self._d_wall), pressure)

    @property
    def u_wall(self) -> float:
        _, uw = velocity_stats_finalize(self.state, self.viscosity)
        return float(uw)

    @property
    def Re_wall(self) -> float:
        return self.u_wall / self.viscosity

    def profiles(self) -> dict[str, np.ndarray]:
        prof, _ = velocity_stats_finalize(self.state, self.viscosity)
        return {k: np.asarray(jax.device_get(v)) for k, v in prof.items()}

    def pos_y_wall(self) -> np.ndarray:
        """y+ of the lower half channel."""
        return tools.pos_to_pos_wall(1.0 + self.pos_y, self.viscosity,
                                     self.u_wall)

    def save(self, path) -> None:
        np.savez(path, pos_y=self.pos_y, viscosity=self.viscosity,
                 count=np.asarray(self.state.count),
                 mean=np.asarray(self.state.mean),
                 msq=np.asarray(self.state.msq),
                 m3=np.asarray(self.state.m3),
                 m4=np.asarray(self.state.m4),
                 uv=np.asarray(self.state.uv),
                 dudy_wall=np.asarray(self.state.dudy_wall))

    @classmethod
    def load(cls, path) -> "VelocityStats":
        with np.load(path) as f:
            vs = cls(f["pos_y"], float(f["viscosity"]))
            ny = len(vs.pos_y)
            mean = np.asarray(f["mean"])
            if mean.shape[0] == 3:  # pre-pressure save format
                pad = np.zeros((1, ny), mean.dtype)
                mean = np.concatenate([mean, pad], axis=0)
                msq = np.concatenate([np.asarray(f["msq"]), pad], axis=0)
                m3 = m4 = np.zeros((4, ny), mean.dtype)
            else:
                msq, m3, m4 = (np.asarray(f[k]) for k in ("msq", "m3", "m4"))
            vs.state = VelocityStatsState(
                count=jnp.asarray(f["count"]), mean=jnp.asarray(mean),
                msq=jnp.asarray(msq), m3=jnp.asarray(m3), m4=jnp.asarray(m4),
                uv=jnp.asarray(f["uv"]),
                dudy_wall=jnp.asarray(f["dudy_wall"]))
        return vs

    def errors_vs_reference(self, reference,
                            keys=("U+", "u'+", "v'+", "w'+", "uv'+")):
        """Area-weighted L1 error of each profile vs a reference DNS profile
        (reference log_stats_errors_half, TCF_tools.py:2112-2158)."""
        prof = self.profiles()
        ref = tools.interpolate_ref_statistics(reference, self.pos_y, keys)
        dy = np.gradient(self.pos_y)
        return {k: float(np.sum(np.abs(prof[k] - r) * dy) / np.sum(dy))
                for k, r in zip(keys, ref)}

    def plot(self, path, reference=None, file_type: str = "pdf") -> None:
        """Mean/rms/shear-stress profiles vs y+ with optional DNS overlay
        (reference plot_avg_vel_stats, TCF_tools.py:1621-1750)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        prof = self.profiles()
        keys = [k for k in STAT_KEYS if k not in ("V+", "W+")]
        fig, axs = plt.subplots(1, len(keys), figsize=(3.2 * len(keys), 2.6))
        for ax, k in zip(axs, keys):
            ax.plot(self.pos_y, prof[k], label="sim")
            if reference is not None:
                try:
                    (r,) = tools.interpolate_ref_statistics(
                        reference, self.pos_y, [k])
                    ax.plot(self.pos_y, r, "--", label="DNS")
                except (KeyError, NotImplementedError):
                    pass
            ax.set_xlabel("y/h")
            ax.set_ylabel(k)
            ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(Path(path).with_suffix(f".{file_type}"))
        plt.close(fig)


class _HalfProfiles:
    """Half-channel accessor (PISOTCFProfile.Profiles, TCF_tools.py:93-125):
    ``profiles[key]`` returns the wall-to-centerline half of the profile;
    ``"y+"`` / ``"y/h"`` return wall-unit / half-height positions."""

    def __init__(self, parent: "SavedRunProfile"):
        self._p = parent

    def __getitem__(self, key: str) -> np.ndarray:
        if key == "y+":
            data = self._p._vs.pos_y_wall()
        elif key == "y/h":
            data = 1.0 - np.abs(self._p.get_full_pos_y())
        else:
            data = self._p.get_full_data(key)
        return data[: (len(data) + 1) // 2]


class SavedRunProfile:
    """Reference-profile interface over a saved :class:`VelocityStats` run
    (the reference's PISOTCFProfile, TCF_tools.py:92-323): exposes
    ``get_full_pos_y`` / ``get_full_data`` / ``profiles`` so saved runs can
    be compared and interpolated exactly like DNS references."""

    has_vw = True  # provides V+/W+ (unlike the DNS readers)

    def __init__(self, stats: "VelocityStats"):
        self._vs = stats
        self.Re_wall = stats.Re_wall
        self.u_wall = stats.u_wall
        self.profiles = _HalfProfiles(self)

    @classmethod
    def load(cls, path) -> "SavedRunProfile":
        return cls(VelocityStats.load(path))

    def get_full_pos_y(self) -> np.ndarray:
        return np.asarray(self._vs.pos_y)

    def get_full_data(self, key: str) -> np.ndarray:
        prof = self._vs.profiles()
        if key not in prof:
            raise NotImplementedError(f"Unsupported profile: {key}")
        return prof[key]
