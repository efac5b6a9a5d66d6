"""Observation extraction: sensor gathers and per-agent moving windows.

Re-implements the reference obs utilities
(``/root/reference/src/fluidgym/envs/util/obs_extraction.py``) in JAX.  The
windows are built with static slicing (topology is static per env config), so
everything fuses under jit and is differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "extract_moving_window_2d",
    "extract_moving_window_2d_x_z",
    "gather_sensors_2d",
]


def extract_moving_window_2d(
    field: Array, n_agents: int, agent_width: int, n_agents_per_window: int
) -> Array:
    """Local windows for agents in a row (reference obs_extraction.py:206-253).

    ``field (Y, X)`` with ``X == n_agents * agent_width``; windows wrap
    circularly over agents.  Returns ``(n_agents, Y, n_agents_per_window *
    agent_width)``.
    """
    if field.ndim != 2:
        raise ValueError("field must be 2D (Y, X)")
    Y, X = field.shape
    if X != n_agents * agent_width:
        raise ValueError("X must equal n_agents * agent_width")
    blocks = field.reshape(Y, n_agents, agent_width)
    pad = n_agents_per_window // 2
    padded = jnp.pad(blocks, ((0, 0), (pad, pad), (0, 0)), mode="wrap") if pad else blocks
    windows = [
        padded[:, i : i + n_agents_per_window, :].reshape(
            Y, n_agents_per_window * agent_width
        )
        for i in range(n_agents)
    ]
    return jnp.stack(windows, axis=0)


def extract_moving_window_2d_x_z(
    field: Array,
    n_agents_x: int,
    n_agents_z: int,
    agent_width: int,
    n_agents_per_window_x: int,
    n_agents_per_window_z: int,
    pad_x: int = 0,
    pad_z: int = 0,
) -> Array:
    """Circular windows of PER-AGENT MEANS over a (z, x) agent tiling
    (reference obs_extraction.py:255-344): the field is reduced to one mean
    per agent block, rolled by (pad_z, pad_x) agents, and unfolded into
    [n_agents_x * n_agents_z, Wz, Wx] windows (x-major agent order).
    """
    Z, X = field.shape
    if X != n_agents_x * agent_width or Z != n_agents_z * agent_width:
        raise ValueError("field shape must match agent tiling")
    if not (0 <= pad_x <= n_agents_per_window_x):
        raise ValueError("pad_x must be in range [0, n_agents_per_window_x]")
    if not (0 <= pad_z <= n_agents_per_window_z):
        raise ValueError("pad_z must be in range [0, n_agents_per_window_z]")

    blocks = field.reshape(n_agents_z, agent_width, n_agents_x, agent_width)
    agent_means = blocks.mean(axis=(1, 3))  # (n_agents_z, n_agents_x)
    agent_means = jnp.roll(agent_means, (pad_z, pad_x), axis=(0, 1))

    Wz, Wx = n_agents_per_window_z, n_agents_per_window_x
    # vectorized circular unfold (x-major agent order)
    ixs = jnp.repeat(jnp.arange(n_agents_x), n_agents_z)
    izs = jnp.tile(jnp.arange(n_agents_z), n_agents_x)

    def window(iz, ix):
        z_idx = (iz + jnp.arange(Wz)) % n_agents_z
        x_idx = (ix + jnp.arange(Wx)) % n_agents_x
        return agent_means[z_idx][:, x_idx]

    return jax.vmap(window)(izs, ixs)


def extract_moving_window_3d(
    field: Array, n_agents: int, agent_width: int, n_agents_per_window: int
) -> Array:
    """Local 3D windows for agents tiled over (z, x) at full y extent
    (reference obs_extraction.py:346-411).

    ``field (Z, Y, X)`` with Z == X == n_agents * agent_width; returns
    ``(n_agents**2, window, Y, window)`` with agent order z-major.
    """
    if field.ndim != 3:
        raise ValueError("field must be 3D (Z, Y, X)")
    Z, Y, X = field.shape
    if Z != n_agents * agent_width or X != n_agents * agent_width:
        raise ValueError("Z and X must equal n_agents * agent_width")
    w = n_agents_per_window * agent_width
    pad = (n_agents_per_window // 2) * agent_width
    padded = jnp.pad(field, ((pad, pad), (0, 0), (pad, pad)), mode="wrap")
    out = []
    for iz in range(n_agents):
        for ix in range(n_agents):
            z0 = iz * agent_width
            x0 = ix * agent_width
            out.append(padded[z0 : z0 + w, :, x0 : x0 + w])
    return jnp.stack(out, axis=0)


def gather_sensors_2d(field: Array, sensor_xy: Array) -> Array:
    """Gather field values at integer sensor pixels; ``sensor_xy (2, n)`` as
    (x, y) indices into a ``(..., Y, X)`` field."""
    return field[..., sensor_xy[1], sensor_xy[0]]
