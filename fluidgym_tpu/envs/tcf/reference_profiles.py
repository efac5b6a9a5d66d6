"""Reference DNS channel-flow profile readers (Torroja / OpenFOAM).

Re-expression of ``/root/reference/src/fluidgym/simulation/pict/data/
torroja.py:21-131`` and ``OpenFOAM_profile.py:19-62``: parsers for the public
Torroja UPM channel-flow DNS profile files (https://torroja.dmt.upm.es/
channels/data/, ``Re%d.prof``) and for OpenFOAM-exported npz profiles, with a
common interface (``profiles`` dict, ``get_full_pos_y``, ``get_full_data``)
used for validating turbulent-channel statistics against DNS.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fluidgym_tpu.envs.tcf import tools as TCF_tools

__all__ = ["TorrojaProfile", "OpenFOAMProfile"]

_FULL_KEYS = ("U+", "u'+", "v'+", "w'+", "uv'+", "p'")


class TorrojaProfile:
    """Torroja ``Re%d.prof`` mean/rms profile file (half channel)."""

    def __init__(self, base_path, Re: int):
        path = Path(base_path) / f"Re{int(Re)}.prof"
        self.Re_wall = int(Re)
        with open(path) as fh:
            line = fh.readline()
            while "End of Header" not in line:
                line = fh.readline()
            fh.readline()                      # blank
            line = fh.readline()               # "... ny = <n>, Re ..."
            self.ny = int(line.split()[3][:-1])
            fh.readline()                      # blank
            self.field_names = fh.readline().split()[1:]
            fh.readline()                      # blank
            fh.readline()                      # ---- separator
            cols = [[] for _ in self.field_names]
            for line in fh:
                for i, v in enumerate(line.split()):
                    cols[i].append(float(v))
        self.profiles = {n: np.asarray(v)
                         for n, v in zip(self.field_names, cols)}

    def get_full_pos_y(self) -> np.ndarray:
        """Mirror the half-channel y/h to the full channel [-1, 1]."""
        y = self.profiles["y/h"]
        return np.concatenate((y - 1, 1 - y[::-1]))

    def get_full_data(self, key: str) -> np.ndarray:
        if key not in _FULL_KEYS:
            raise NotImplementedError(f"Unsupported profile: {key}")
        if key not in self.profiles:
            raise KeyError(f"{key} data not found.")
        p = self.profiles[key]
        if key == "uv'+":  # antisymmetric across the centerline
            return np.concatenate((-p, p[::-1]))
        return np.concatenate((p, p[::-1]))

    def plot_full_stats(self, path, file_type: str = "svg") -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = [k for k in _FULL_KEYS if k in self.profiles]
        fig, axs = plt.subplots(1, len(keys), figsize=(3.2 * len(keys), 2.4))
        y = self.get_full_pos_y()
        for ax, key in zip(np.atleast_1d(axs), keys):
            ax.plot(y, self.get_full_data(key))
            ax.set_xlabel("y/h")
            ax.set_ylabel(key)
        fig.tight_layout()
        fig.savefig(Path(path) /
                    f"Reference_profiles_full_Re{self.Re_wall}.{file_type}")
        plt.close(fig)


class OpenFOAMProfile:
    """OpenFOAM-exported npz channel profile, TorrojaProfile-compatible."""

    def __init__(self, data_path, viscosity: float = 2e-5,
                 u_wall: float = 0.010301294851713142):
        self.viscosity = viscosity
        self.u_wall = u_wall
        with np.load(data_path) as f:
            self.data = {k: v for k, v in f.items()}

        def wv(vel, order=1):
            return vel / (u_wall**order)

        self.Re_wall = self.data["ret"]
        self.profiles = {
            "U+": wv(self.data["U"]),
            "u'+": wv(np.sqrt(self.data["urms"])),
            "v'+": wv(np.sqrt(self.data["vrms"])),
            "w'+": wv(np.sqrt(self.data["wrms"])),
            "uv'+": wv(self.data["uv"], order=2),
            "y/h": self.data["y"],
            "y+": self.data["y"] * u_wall / viscosity,
        }

    get_full_pos_y = TorrojaProfile.get_full_pos_y

    def get_full_data(self, key: str) -> np.ndarray:
        if key not in ("U+", "u'+", "v'+", "w'+", "uv'+"):
            raise NotImplementedError(f"Unsupported profile: {key}")
        p = self.profiles[key]
        if key == "uv'+":
            return np.concatenate((-p, p[::-1]))
        return np.concatenate((p, p[::-1]))
