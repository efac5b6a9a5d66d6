"""Spatial domain decomposition over a device mesh (GSPMD).

TPU-native replacement for the reference's multi-GPU spatial story: the
reference couples blocks through CSR assembly on one GPU and has no spatial
multi-device decomposition at all (SURVEY.md section 2.5); large 3D domains
(e.g. TCFLarge at 128x65x128) simply must fit one device.  Here a
``DomainState`` is sharded along one spatial axis over a ``Mesh`` axis and
the PISO step is jitted with those shardings: XLA partitions every stencil
and Krylov iterate and inserts the halo collective-permutes and reduction
``psum``s automatically (the ``shard_map``-free GSPMD formulation — the same
mechanism the driver's ``dryrun_multichip`` validates on a dp x sp mesh).

Usage::

    mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "sp"))
    specs = domain_state_shardings(state, mesh, spatial_axis_name="sp")
    state = jax.device_put(state, specs)
    step = jax.jit(single_step_fn, in_shardings=(specs, ...), out_shardings=specs)

The same helper handles batched (leading env axis) states via
``batch_axis_name`` — batch over ``dp`` AND space over ``sp`` composes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluidgym_tpu.core.domain import DomainState

Array = jax.Array

__all__ = [
    "domain_state_shardings",
    "shard_domain_state",
    "make_mesh",
]


def make_mesh(n_dp: int | None = None, n_sp: int = 1,
              devices=None) -> Mesh:
    """A ``(dp, sp)`` mesh over ``devices`` (default: all devices).

    ``n_dp`` defaults to ``len(devices) // n_sp``.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_sp
    if n_dp < 1 or n_sp < 1 or n_dp * n_sp > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_sp} does not fit the {len(devices)} available "
            f"devices"
        )
    return Mesh(devices[: n_dp * n_sp].reshape(n_dp, n_sp), ("dp", "sp"))


def _leaf_spec(leaf: Array, dim_size: int, spatial_dim: int, n_shards: int,
               spatial_axis_name: str | None,
               batch_axis_name: str | None, batched: bool) -> P:
    """PartitionSpec for one DomainState leaf.

    Shard array axis ``-1 - spatial_dim`` iff its extent matches the block's
    extent on that spatial dimension and divides evenly over the mesh axis
    (face data perpendicular to the sharded dimension has extent 1 there and
    stays replicated; other face data keeps the dimension and is sharded)."""
    ndim = leaf.ndim - (1 if batched else 0)
    lead = (batch_axis_name,) if batched else ()
    axis = ndim - 1 - spatial_dim
    shard = (
        spatial_axis_name is not None
        and axis >= 0
        and leaf.shape[-1 - spatial_dim] == dim_size
        and dim_size % n_shards == 0
    )
    if shard:
        spec = [None] * ndim
        spec[axis] = spatial_axis_name
        return P(*lead, *spec)
    return P(*lead)


def domain_state_shardings(
    state: DomainState,
    mesh: Mesh,
    *,
    spatial_axis_name: str | None = "sp",
    batch_axis_name: str | None = None,
    spatial_dim: "int | str" = "x",
) -> DomainState:
    """A ``DomainState``-shaped pytree of ``NamedSharding``s for ``state``.

    Parameters
    ----------
    state : the (optionally batched) domain state to build shardings for.
    mesh : device mesh containing ``spatial_axis_name`` (and
        ``batch_axis_name`` if given).
    spatial_axis_name : mesh axis to shard one spatial dimension of every
        block field over; ``None`` disables spatial sharding.
    batch_axis_name : if the state has a leading env-batch axis on every
        leaf (``BatchedFluidEnv`` style), the mesh axis to shard it over.
    spatial_dim : which spatial dimension to decompose — ``"x"`` (trailing
        array axis, default), ``"y"``, or ``"z"``, or the equivalent offset
        from the trailing axis (0/1/2).  Lets large 3D channels (TCFLarge,
        128x65x128) shard whichever extent is largest.

    Blocks whose extent on the chosen dimension does not divide the mesh
    axis size are left replicated (the cylinder O-grid's small cap blocks,
    for example, while its wide wake block still shards).
    """
    if isinstance(spatial_dim, str):
        spatial_dim = {"x": 0, "y": 1, "z": 2}[spatial_dim]
    n_shards = (mesh.shape[spatial_axis_name]
                if spatial_axis_name is not None else 1)
    batched = batch_axis_name is not None

    def block_specs(blk):
        # cell-field layout is (C, [z,] y, x): dim offset from trailing axis
        dim_size = blk.pressure.shape[-1 - spatial_dim]
        return jax.tree.map(
            lambda leaf: NamedSharding(
                mesh,
                _leaf_spec(leaf, dim_size, spatial_dim, n_shards,
                           spatial_axis_name, batch_axis_name, batched),
            ),
            blk,
        )

    blocks = tuple(block_specs(b) for b in state.blocks)
    scalar_spec = NamedSharding(mesh, P(batch_axis_name) if batched else P())
    rest = jax.tree.map(
        lambda _: scalar_spec,
        (state.viscosity, state.scalar_diffusivity),
    )
    import dataclasses

    return dataclasses.replace(
        state, blocks=blocks, viscosity=rest[0], scalar_diffusivity=rest[1]
    )


def shard_domain_state(
    state: DomainState,
    mesh: Mesh,
    *,
    spatial_axis_name: str | None = "sp",
    batch_axis_name: str | None = None,
    spatial_dim: "int | str" = "x",
) -> tuple[DomainState, DomainState]:
    """``device_put`` ``state`` with spatial (and batch) shardings.

    Returns ``(sharded_state, shardings)`` — pass ``shardings`` as
    ``in_shardings``/``out_shardings`` when jitting the step function so the
    layout is stable across steps (avoids resharding every call).
    """
    specs = domain_state_shardings(
        state, mesh, spatial_axis_name=spatial_axis_name,
        batch_axis_name=batch_axis_name, spatial_dim=spatial_dim,
    )
    return jax.device_put(state, specs), specs
