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

__all__ = ["TorrojaProfile", "OpenFOAMProfile", "TorrojaBalances", "TorrojaSpectra"]

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


class TorrojaBalances:
    """Torroja ``Re%d.bal.<ij>`` Reynolds-stress budget files
    (reference torroja.py:134-259); drop-in comparison source for the
    online TKE budgets."""

    class TorrojaBalance:
        _components = ("u", "v", "w")
        _KEYS = ("dissip", "produc", "p-strain", "p-diff", "t-diff",
                 "v-diff", "bal")

        def __init__(self, base_path, Re: int, i: int, j: int):
            path = (Path(base_path) /
                    f"Re{int(Re)}.bal.{self._components[i]}{self._components[j]}")
            self.Re_wall = int(Re)
            with open(path) as fh:
                line = fh.readline()
                while "End of Header" not in line:
                    line = fh.readline()
                fh.readline()
                self.ny = int(fh.readline().split()[3][:-1])
                fh.readline()
                self.field_names = fh.readline().split()[1:]
                fh.readline()  # ---- separator
                cols = [[] for _ in self.field_names]
                for line in fh:
                    for k, v in enumerate(line.split()):
                        cols[k].append(float(v))
            self.balances = {n: np.asarray(v)
                             for n, v in zip(self.field_names, cols)}

        def get_full_pos_y(self) -> np.ndarray:
            y = self.balances["y/h"]
            return np.concatenate((y - 1, 1 - y[::-1]))

        def get_full_data(self, key: str) -> np.ndarray:
            if key not in self._KEYS:
                raise NotImplementedError(f"Unsupported profile: {key}")
            p = self.balances[key]
            return np.concatenate((p, p[::-1]))

    def __init__(self, base_path, Re: int):
        self.Re_wall = int(Re)
        self.balances = {
            (i, j): TorrojaBalances.TorrojaBalance(base_path, Re, i, j)
            for (i, j) in ((0, 0), (1, 1), (2, 2), (0, 1))
        }

    def get_pos_y(self, i, j, as_wall: bool = False):
        b = self.balances[(i, j)]
        return b.balances["y+"] if as_wall else b.get_full_pos_y()

    def production(self, i, j):
        return self.balances[(i, j)].get_full_data("produc")

    def dissipation(self, i, j):
        return -self.balances[(i, j)].get_full_data("dissip")

    def turbulent_transport(self, i, j):
        return self.balances[(i, j)].get_full_data("t-diff")

    def viscous_diffusion(self, i, j):
        return self.balances[(i, j)].get_full_data("v-diff")

    def velocity_pressure_gradient(self, i, j):
        return self.balances[(i, j)].get_full_data("p-diff")


class TorrojaSpectra:
    """Torroja binary 2D spectra files ``spectra/re<Re>/2D/Re<Re>.spe.jNN``
    (reference torroja.py:260-449): premultiplied 2D energy spectra at
    ``nplan`` wall-normal planes for (uu, vv, ww, Re(u*v), Ox^2, Oy^2,
    Oz^2)."""

    def __init__(self, base_path, Re: int):
        if Re not in (180, 550, 950, 2000):
            raise ValueError("Torroja spectra exist for Re 180/550/950/2000")
        self.Re_wall = int(Re)
        base = Path(base_path) / f"spectra/re{Re}/2D"

        with open(base / f"Re{Re}.spe.j01", "rb") as fh:
            self._read_header(fh)
        self.data_types = ["uu", "vv", "ww", "Re(u*v)", "Ox*Ox", "Oy*Oy",
                           "Oz*Oz"]
        if Re == 2000:
            self.data_types.append("Im(u*v)")
        self.spectra = {t: [None] * self.nplan for t in self.data_types}
        for j in range(self.nplan):
            with open(base / f"Re{Re}.spe.j{j + 1:02d}", "rb") as fh:
                fh.seek(self._header_size)
                for t in self.data_types:
                    self._read_record(fh, j, t)

    def _read_header(self, fh) -> None:
        import struct as _s

        fh.read(4)
        (self.utau, self.re, self.alp, self.bet) = _s.unpack("<4f", fh.read(16))
        (self.mx, self.my, self.mz, self.nplan, self.nacum, self.jind,
         self.nvar) = _s.unpack("<7i", fh.read(28))
        fh.read(4)
        fh.read(4)
        import numpy as _np

        self.jsp = _np.frombuffer(fh.read(4 * self.nplan), "<i4").tolist()
        self.pos_y = _np.frombuffer(fh.read(4 * self.nplan), "<f4").tolist()
        self.pos_y_wall = [y * self.re * self.utau for y in self.pos_y]
        fh.read(4)
        self._header_size = 13 * 4 + 2 * 4 + 2 * 4 * self.nplan

    def _read_record(self, fh, j: int, data_type: str) -> None:
        n = (self.mx // 2) * self.mz
        fh.read(4)
        self.spectra[data_type][j] = np.frombuffer(
            fh.read(4 * n), "<f4").reshape(self.mx // 2, self.mz).copy()
        fh.read(4)
