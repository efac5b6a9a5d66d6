"""Turbulent-channel-flow reference tooling: wall-unit conversions.

Subset of the reference ``pict/data/TCF_tools.py:36-60`` used by the envs;
the online-statistics profile classes live in ``utils/online_statistics``.
"""

from __future__ import annotations

__all__ = ["Re_cl_to_wall", "Re_wall_to_cl", "t_to_ETT", "ETT_to_t",
           "t_star", "t_to_t_wall"]


def Re_cl_to_wall(Re_cl: float) -> float:
    return 0.116 * (Re_cl**0.88)


def Re_wall_to_cl(Re_wall: float) -> float:
    return (Re_wall / 0.116) ** (1 / 0.88)


def t_to_ETT(t: float, u_wall: float, delta: float = 1.0) -> float:
    """Physical time -> eddy turnover times."""
    return t * u_wall / delta


def ETT_to_t(ETT: float, u_wall: float, delta: float = 1.0) -> float:
    return ETT * delta / u_wall


def t_star(visc: float, u_wall: float) -> float:
    """Wall time unit."""
    return visc / (u_wall**2)


def t_to_t_wall(t: float, visc: float, u_wall: float) -> float:
    return t / t_star(visc, u_wall)
