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
           "velocity_stats_finalize", "VelocityStats", "SavedRunProfile",
           "TCFAnalysis"]

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


class TCFAnalysis:
    """Full-run turbulence analyzer: velocity/pressure moments plus the
    reference ``VelocityStats``'s optional deep diagnostics — 2D x-z velocity
    spectra at selected y+ planes (TCF_tools.py:445-456, 1375-1456),
    per-component TKE budgets (online_statistics.py:790-1271,
    TCF_tools.py:1196-1374), and temporal two-point correlations of the
    velocity fluctuations (TCF_tools.py:1090-1195) — as one streaming
    recorder whose update runs jitted on device.

    ``pos_y``: wall-normal cell centers in [-1, 1]; ``lengths``: physical
    (Lz, Lx) of the homogeneous directions (for spectra wavelengths);
    ``psd_planes``: y cell indices (lower half) to accumulate spectra at.
    """

    def __init__(self, pos_y: np.ndarray, viscosity: float,
                 lengths: tuple[float, float] | None = None,
                 psd_planes: tuple[int, ...] = (),
                 budgets: bool = False, temporal_corr: bool = False):
        from fluidgym_tpu.utils import online_statistics as ost

        self._ost = ost
        self.stats = VelocityStats(pos_y, viscosity)
        self.lengths = lengths
        self.psd_planes = tuple(int(p) for p in psd_planes)
        self._spectra = None          # lazily shaped at first record
        self._budget = ost.budget_init(len(self.stats.pos_y)) if budgets \
            else None
        self._use_tcorr = bool(temporal_corr)
        self._tcorr_base = None
        self._tcorr_coeffs: list[np.ndarray] = []   # each (3, ny)
        self._tcorr_times: list[float] = []
        self._jit_update = jax.jit(self._update, static_argnames=("has_p",))

    # -- jitted pure update over all enabled accumulators --------------------
    def _update(self, vstate, sstate, tbase, velocity, pressure,
                d_wall, has_p: bool):
        ost = self._ost
        vstate = velocity_stats_update(
            vstate, velocity, d_wall, pressure if has_p else None)
        if sstate is not None:
            sstate = ost.spatial_spectra_update(
                sstate, velocity, jnp.asarray(self.psd_planes, jnp.int32))
        coeff = None
        if tbase is not None:
            fluct = velocity - velocity.mean(axis=(1, 3), keepdims=True)
            coeff = ost.two_point_corr(tbase, fluct, (1, 3))  # (3, ny)
        return vstate, sstate, coeff

    def record(self, velocity, pressure=None, gradients=None,
               time: float | None = None) -> None:
        """Accumulate one snapshot.  ``velocity`` (3, nz, ny, nx);
        ``pressure`` (nz, ny, nx); ``gradients`` (3, 3, nz, ny, nx) — required
        when budgets are enabled (``solver.sgs.velocity_gradients``)."""
        from fluidgym_tpu.utils import online_statistics as ost

        if self.psd_planes and self._spectra is None:
            nz, _, nx = velocity.shape[1:]
            self._spectra = ost.spatial_spectra_init(
                3, len(self.psd_planes), nz, nx)
        if self._use_tcorr and self._tcorr_base is None:
            fluct = velocity - velocity.mean(axis=(1, 3), keepdims=True)
            self._tcorr_base = ost.two_point_corr_init(fluct, (1, 3))
        vstate, sstate, coeff = self._jit_update(
            self.stats.state, self._spectra, self._tcorr_base,
            velocity, pressure if pressure is not None
            else jnp.zeros(velocity.shape[1:], velocity.dtype),
            jnp.asarray(self.stats._d_wall), has_p=pressure is not None)
        self.stats.state = vstate
        self._spectra = sstate
        if coeff is not None:
            self._tcorr_coeffs.append(np.asarray(jax.device_get(coeff)))
            self._tcorr_times.append(
                float(time) if time is not None else len(self._tcorr_times))
        if self._budget is not None:
            if gradients is None:
                raise ValueError("budgets enabled: pass gradients "
                                 "(solver.sgs.velocity_gradients)")
            if pressure is None:
                raise ValueError("budgets enabled: pass pressure")
            self._budget = self._ost.budget_update(
                self._budget, velocity, pressure, gradients)

    # -- finalized diagnostics ------------------------------------------------
    def spectra(self):
        """(lambdas, phi): premultiplied x-z spectra per channel/plane in
        wall units; requires ``lengths`` and at least one recorded frame."""
        if self._spectra is None or self.lengths is None:
            raise ValueError("spectra not enabled (psd_planes/lengths unset)")
        return self._ost.spatial_spectra_phi(
            self._spectra, self.lengths, self.stats.viscosity,
            self.stats.u_wall)

    def budgets(self):
        """TKE budget term profiles in wall units (dict of (3, ny))."""
        if self._budget is None:
            raise ValueError("budgets not enabled")
        out = self._ost.budget_finalize(
            self._budget, self.stats.pos_y, self.stats.viscosity,
            self.stats.u_wall)
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def temporal_correlation(self):
        """(ETT, R/R0): eddy-turnover-time lags and normalized correlation
        coefficients, shape (n_records, 3, ny)."""
        if not self._tcorr_coeffs:
            raise ValueError("temporal correlation not enabled / no records")
        coeffs = np.stack(self._tcorr_coeffs)
        base = np.where(np.abs(coeffs[0]) > 1e-12, coeffs[0], 1.0)
        t = np.asarray(self._tcorr_times)
        ett = tools.t_to_ETT(t - t[0], self.stats.u_wall)
        return ett, coeffs / base

    # -- persistence ----------------------------------------------------------
    def save(self, path) -> None:
        path = Path(path)
        self.stats.save(path.with_suffix(".moments.npz"))
        extra = {}
        if self._spectra is not None:
            extra["spectra_count"] = np.asarray(self._spectra.count)
            extra["spectra_amp"] = np.asarray(self._spectra.amp)
            extra["psd_planes"] = np.asarray(self.psd_planes)
        if self.lengths is not None:
            extra["lengths"] = np.asarray(self.lengths)
        if self._budget is not None:
            for f in self._budget._fields:
                extra[f"budget_{f}"] = np.asarray(getattr(self._budget, f))
        if self._tcorr_coeffs:
            extra["tcorr_coeffs"] = np.stack(self._tcorr_coeffs)
            extra["tcorr_times"] = np.asarray(self._tcorr_times)
        np.savez(path.with_suffix(".extra.npz"), **extra)

    @classmethod
    def load(cls, path) -> "TCFAnalysis":
        from fluidgym_tpu.utils import online_statistics as ost

        path = Path(path)
        vs = VelocityStats.load(path.with_suffix(".moments.npz"))
        with np.load(path.with_suffix(".extra.npz")) as f:
            lengths = tuple(f["lengths"]) if "lengths" in f else None
            planes = tuple(int(p) for p in f["psd_planes"]) \
                if "psd_planes" in f else ()
            self = cls(vs.pos_y, vs.viscosity, lengths=lengths,
                       psd_planes=planes,
                       budgets="budget_count" in f,
                       temporal_corr="tcorr_coeffs" in f)
            self.stats = vs
            if planes:
                self._spectra = ost.SpatialSpectraState(
                    jnp.asarray(f["spectra_count"]),
                    jnp.asarray(f["spectra_amp"]))
            if "budget_count" in f:
                self._budget = ost.BudgetState(*[
                    jnp.asarray(f[f"budget_{n}"])
                    for n in ost.BudgetState._fields])
            if "tcorr_coeffs" in f:
                self._tcorr_coeffs = list(f["tcorr_coeffs"])
                self._tcorr_times = list(f["tcorr_times"])
        return self

    # -- plots (reference _plot_PSD / _plot_energy_budgets /
    #    _plot_temporal_correlation) ------------------------------------------
    def plot_spectra(self, path, file_type: str = "svg") -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        lambdas, phi = self.spectra()
        names = [r"$\phi_{uu}$", r"$\phi_{vv}$", r"$\phi_{ww}$"]
        nrows, ncols = len(self.psd_planes), 3
        fig, axs = plt.subplots(nrows, ncols,
                                figsize=(4 * ncols, 4 * nrows), squeeze=False)
        ypw = self.stats.pos_y_wall()
        for row, plane in enumerate(self.psd_planes):
            for col in range(ncols):
                ax = axs[row][col]
                data = phi[col, row]
                data = data / max(data.max(), 1e-30)
                ax.contourf(lambdas[1], lambdas[0], data,
                            levels=[0.1, 0.5, 0.9, 1], cmap="Greys")
                ax.set(xscale="log", yscale="log")
                if col == 0:
                    ax.set_ylabel(r"$\lambda_z^+$")
                if row == nrows - 1:
                    ax.set_xlabel(r"$\lambda_x^+$")
                if row == 0:
                    ax.set_title(names[col])
                if col == ncols - 1:
                    ax.annotate(f"$y^+={ypw[plane]:.1f}$", xy=(1.02, 0.5),
                                xycoords="axes fraction", rotation="vertical",
                                va="center")
        fig.tight_layout()
        fig.savefig(Path(path).with_suffix(f".{file_type}"))
        plt.close(fig)

    def plot_budgets(self, path, file_type: str = "svg") -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        budgets = self.budgets()
        ypw = self.stats.pos_y_wall()
        half = (len(ypw) + 1) // 2   # lower half-channel only
        ypw = ypw[:half]
        comp = ("u'u'", "v'v'", "w'w'")
        fig, axs = plt.subplots(1, 3, figsize=(12, 3.2), squeeze=False)
        for i in range(3):
            ax = axs[0][i]
            for term, prof in budgets.items():
                ax.plot(ypw, prof[i][:half], label=term.replace("_", " "))
            ax.set_xscale("log")
            ax.set_xlabel("$y^+$")
            ax.set_title(comp[i])
            if i == 0:
                ax.set_ylabel("gain / loss (wall units)")
                ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(Path(path).with_suffix(f".{file_type}"))
        plt.close(fig)

    def plot_temporal_correlation(self, path, y_wall: float = 17.2,
                                  file_type: str = "pdf") -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ett, coeffs = self.temporal_correlation()
        ypw = self.stats.pos_y_wall()
        idx = int(np.argmin(np.abs(ypw - y_wall)))
        fig, ax = plt.subplots(figsize=(5, 3.75))
        for c, label in enumerate(("$u'u'$", "$v'v'$", "$w'w'$")):
            ax.plot(ett, coeffs[:, c, idx], label=label)
        ax.set_xlabel("ETT")
        ax.set_ylabel(r"$R(\mathrm{ETT}) / R(0)$")
        ax.set_title(f"$y^+={ypw[idx]:.2f}$")
        ax.grid()
        ax.legend()
        fig.tight_layout()
        fig.savefig(Path(path).with_suffix(f".{file_type}"))
        plt.close(fig)
