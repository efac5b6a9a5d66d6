"""Turbulent-channel-flow reference tooling: wall-unit conversions.

Subset of the reference ``pict/data/TCF_tools.py:36-60`` used by the envs;
the online-statistics profile classes live in ``utils/online_statistics``.
"""

from __future__ import annotations

__all__ = ["Re_cl_to_wall", "Re_wall_to_cl", "t_to_ETT", "ETT_to_t",
           "t_star", "t_to_t_wall", "t_wall_to_t", "vel_to_vel_wall",
           "pos_to_pos_wall", "get_closest_index",
           "interpolate_ref_statistics"]


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


def t_wall_to_t(t_wall: float, visc: float, u_wall: float) -> float:
    return t_wall * t_star(visc, u_wall)


def vel_to_vel_wall(vel, u_wall: float, order: int = 1):
    """Velocity (moment) -> wall units (reference TCF_tools.py:66-67)."""
    return vel * (1.0 / (u_wall**order))


def pos_to_pos_wall(pos, viscosity: float, u_wall: float):
    """Wall-normal position -> y+ (reference TCF_tools.py:70-71)."""
    return pos * (u_wall / viscosity)


def get_closest_index(data, value) -> int:
    import numpy as np

    return int(np.abs(np.asarray(data) - value).argmin())


def interpolate_ref_statistics(ref_statistics, pos_y, stat_keys=()):
    """Interpolate reference DNS profiles onto simulation y positions
    (reference TCF_tools.py:78-89)."""
    import numpy as np

    ref_pos_y = ref_statistics.get_full_pos_y()
    stats = []
    for key in stat_keys:
        if key in ("V+", "W+") and not hasattr(ref_statistics, "has_vw"):
            stats.append(np.zeros_like(pos_y))
        else:
            stats.append(np.interp(pos_y, ref_pos_y,
                                   ref_statistics.get_full_data(key)))
    return stats
