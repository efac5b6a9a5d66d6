"""Domain / Block / Boundary data model.

TPU-native re-expression of the reference's mutable C++ domain graph
(``/root/reference/src/fluidgym/simulation/extensions/domain_structs.h:132-803``)
as immutable JAX pytrees:

* **static topology** (block shapes, boundary kinds, BC types, connectivity)
  lives in frozen, hashable dataclasses (``FaceSpec``/``BlockTopo``/
  ``DomainTopo``) so ``jit`` specializes once per env configuration;
* **geometry** (metric determinant, inverse metric, Laplace coefficients --
  the reference's per-cell ``transform`` tensors computed by
  ``CoordsToTransforms``, PISOtorch.cpp:256) lives in a ``BlockGeom`` pytree
  that is constant during simulation;
* **simulation state** (velocity/pressure/scalar/sources + boundary value
  arrays) lives in ``BlockState``/``DomainState`` pytrees that flow through
  the jitted step function.

A small host-side ``DomainBuilder`` mirrors the reference's imperative
``Domain.CreateBlock`` / ``Block.CloseBoundary`` / ``setVelocity`` API
(PISOtorch.cpp:314-420) and produces the three pieces above.

Layout: fields are channel-first ``(C, *spatial)`` with spatial axes ordered
``[z, ]y, x``; physical axis ``d`` (0=x,1=y,2=z) maps to array axis ``-(d+1)``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core import geometry as geo

Array = jax.Array

__all__ = [
    "BoundKind",
    "BCType",
    "FaceSpec",
    "BlockTopo",
    "DomainTopo",
    "FaceData",
    "BlockGeom",
    "BlockState",
    "DomainState",
    "DomainBuilder",
    "face_axis",
    "face_is_upper",
    "face_sign",
    "face_shape",
    "FACE_NAMES",
]

FACE_NAMES = ("-x", "+x", "-y", "+y", "-z", "+z")


def face_axis(f: int) -> int:
    """Physical axis of face index ``f`` (faces ordered -x,+x,-y,+y,-z,+z)."""
    return f // 2


def face_is_upper(f: int) -> bool:
    return bool(f % 2)


def face_sign(f: int) -> int:
    """-1 for lower faces, +1 for upper faces."""
    return -1 + 2 * (f % 2)


def face_shape(spatial: tuple[int, ...], f: int) -> tuple[int, ...]:
    """Spatial shape of a face slab: size 1 along the face axis."""
    d = face_axis(f)
    ax = len(spatial) - 1 - d
    s = list(spatial)
    s[ax] = 1
    return tuple(s)


class BoundKind(enum.IntEnum):
    """Boundary kinds (reference BoundaryType, domain_structs.h)."""

    FIXED = 0       # prescribed values (reference FixedBoundary)
    PERIODIC = 1    # wraps to the opposite face of the same block
    CONNECTED = 2   # inter-block connection (multi-block domains)


class BCType(enum.IntEnum):
    """Per-field boundary-condition type on a FIXED boundary."""

    DIRICHLET = 0
    NEUMANN = 1     # for velocity: free-slip; for scalars: prescribed gradient


# ---------------------------------------------------------------------------
# Static topology (hashable; jit aux data)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FaceSpec:
    """Static description of one block face.

    For CONNECTED faces, ``axes`` replicates the reference ConnectedBoundary
    axis table (domain_structs.cpp ConnectBlocks:1080-1114, kernel.cu
    computeConnectedPos:342): entry ``i`` corresponds to this block's axis
    ``(face_axis + i) % ndims`` and holds the neighbor's FACE INDEX for that
    axis (``neighbor_axis * 2 + inverted_bit``); ``axes[0]`` is the neighbor's
    connected face itself.
    """

    kind: BoundKind = BoundKind.PERIODIC
    vel_type: BCType = BCType.DIRICHLET
    scalar_types: tuple[BCType, ...] = ()
    connected_block: int = -1
    connected_face: int = -1
    axes: tuple[int, ...] = ()


@dataclass(frozen=True)
class BlockTopo:
    """Static description of one block."""

    shape: tuple[int, ...]  # spatial cell shape, ordered (z,)y,x
    faces: tuple[FaceSpec, ...]
    orthogonal: bool
    name: str = "block"

    @property
    def ndims(self) -> int:
        return len(self.shape)


@dataclass(frozen=True)
class DomainTopo:
    """Static description of the whole domain."""

    blocks: tuple[BlockTopo, ...]
    ndims: int
    scalar_channels: int = 0
    name: str = "domain"

    @property
    def has_scalar(self) -> bool:
        return self.scalar_channels > 0


# ---------------------------------------------------------------------------
# Runtime pytrees
# ---------------------------------------------------------------------------

@partial(
    jax.tree_util.register_dataclass,
    data_fields=("velocity", "scalar"),
    meta_fields=(),
)
@dataclass
class FaceData:
    """Boundary value arrays for a FIXED face (None otherwise).

    Shapes broadcast against block fields: ``velocity (ndims, *face_shape)``,
    ``scalar (channels, *face_shape)`` where face_shape has size 1 along the
    face axis.
    """

    velocity: Array | None = None
    scalar: Array | None = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("det", "minv_diag", "minv", "alpha", "centers"),
    meta_fields=(),
)
@dataclass
class BlockGeom:
    """Per-cell metric data (constant during simulation).

    ``det (*s)``; ``minv_diag (d, *s)`` for orthogonal grids (rows of M^-1
    collapse to their diagonal) else None; ``minv (*s, d, d)`` for curvilinear
    grids else None; ``alpha (d, *s) = det * |M^-1 row_d|^2`` -- the orthogonal
    Laplace coefficient (grid_gen/PISO kernels: getLaplaceCoefficientOrthogonal,
    PISO_multiblock_cuda_kernel.cu:1225); ``centers (d, *s)`` cell centers.
    """

    det: Array
    minv_diag: Array | None
    minv: Array | None
    alpha: Array
    centers: Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("velocity", "pressure", "scalar", "velocity_source",
                 "viscosity", "faces"),
    meta_fields=(),
)
@dataclass
class BlockState:
    """Dynamic per-block simulation state."""

    velocity: Array                   # (ndims, *s)
    pressure: Array                   # (*s)
    scalar: Array | None              # (channels, *s)
    velocity_source: Array | None     # (ndims, *s), acceleration units
    faces: tuple[FaceData, ...]       # len 2*ndims
    # optional per-cell kinematic viscosity (*s) overriding the domain scalar
    # (reference Block.setViscosity, used by the Smagorinsky SGS hook)
    viscosity: Array | None = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("blocks", "viscosity", "scalar_diffusivity"),
    meta_fields=(),
)
@dataclass
class DomainState:
    """Dynamic domain state: all blocks plus global material parameters."""

    blocks: tuple[BlockState, ...]
    viscosity: Array                      # () kinematic viscosity
    scalar_diffusivity: Array | None      # (channels,)

    def replace_block(self, i: int, block: BlockState) -> "DomainState":
        blocks = list(self.blocks)
        blocks[i] = block
        return replace(self, blocks=tuple(blocks))


# ---------------------------------------------------------------------------
# Host-side builder (API parity with reference Domain/Block)
# ---------------------------------------------------------------------------

class _BlockBuilder:
    def __init__(self, domain: "DomainBuilder", vertex_coords: np.ndarray, name: str):
        vertex_coords = np.asarray(vertex_coords, dtype=np.float64)
        if vertex_coords.ndim != vertex_coords.shape[0] + 1:
            raise ValueError(
                "vertex_coords must have shape (ndims, *vertex_shape); got "
                f"{vertex_coords.shape}"
            )
        self.domain = domain
        self.name = name
        self.coords = vertex_coords
        self.ndims = vertex_coords.shape[0]
        self.shape = tuple(n - 1 for n in vertex_coords.shape[1:])

        M, Minv, det = geo.coords_to_transforms(vertex_coords)
        self._M, self._Minv, self._det = M, Minv, det
        self.orthogonal = geo.is_orthogonal(M)
        # alpha_d = det * |Minv row d|^2
        self._alpha = np.stack(
            [det * np.sum(Minv[..., d, :] ** 2, axis=-1) for d in range(self.ndims)],
            axis=0,
        )
        self._centers = geo.cell_centers(vertex_coords)

        self.faces: list[FaceSpec] = [FaceSpec() for _ in range(2 * self.ndims)]
        self.face_data: list[FaceData] = [FaceData() for _ in range(2 * self.ndims)]

        self.velocity = np.zeros((self.ndims, *self.shape))
        self.pressure = np.zeros(self.shape)
        self.scalar = (
            np.zeros((domain.scalar_channels, *self.shape))
            if domain.scalar_channels
            else None
        )
        self.velocity_source: np.ndarray | None = None

    # -- face helpers --------------------------------------------------
    def _face_index(self, face: int | str) -> int:
        if isinstance(face, str):
            face = FACE_NAMES.index(face)
        if not 0 <= face < 2 * self.ndims:
            raise ValueError(f"invalid face {face} for {self.ndims}D block")
        return face

    def close_boundary(
        self,
        face: int | str,
        velocity: Any | None = None,
        scalar: Any | None = None,
        vel_type: BCType = BCType.DIRICHLET,
        scalar_types: tuple[BCType, ...] | None = None,
    ) -> None:
        """Make a face a FIXED (prescribed) boundary.

        Default: no-slip wall (zero Dirichlet velocity), zero Dirichlet scalar
        -- matching reference ``Block.CloseBoundary`` (domain_structs.cpp:1981).
        Closing one face of a PERIODIC pair also closes the partner face with
        a default wall (CloseConnectedBoudary, domain_structs.cpp:1811-1818).
        """
        f = self._face_index(face)
        # sever a CONNECTED seam symmetrically: the neighbor's reciprocal
        # face becomes a default wall too (reference CloseBoundary ->
        # CloseConnectedBoudary, domain_structs.cpp:1790-1818); leaving it
        # one-way would silently read this block's interior as halo
        if self.faces[f].kind == BoundKind.CONNECTED:
            nb = self.domain._blocks[self.faces[f].connected_block]
            nf = self.faces[f].connected_face
            my_index = self.domain._blocks.index(self)
            if (nb.faces[nf].kind == BoundKind.CONNECTED
                    and nb.faces[nf].connected_block == my_index
                    and nb.faces[nf].connected_face == f):
                c_n = self.domain.scalar_channels
                fs_n = face_shape(nb.shape, nf)
                nb.faces[nf] = FaceSpec(
                    kind=BoundKind.FIXED,
                    vel_type=BCType.DIRICHLET,
                    scalar_types=tuple(BCType.DIRICHLET for _ in range(c_n)),
                )
                nb.face_data[nf] = FaceData(
                    velocity=np.zeros((nb.ndims, *fs_n)),
                    scalar=np.zeros((c_n, *fs_n)) if c_n else None,
                )
        partner = f ^ 1
        if (
            self.faces[f].kind == BoundKind.PERIODIC
            and self.faces[partner].kind == BoundKind.PERIODIC
        ):
            c = self.domain.scalar_channels
            fs_p = face_shape(self.shape, partner)
            self.faces[partner] = FaceSpec(
                kind=BoundKind.FIXED,
                vel_type=BCType.DIRICHLET,
                scalar_types=tuple(BCType.DIRICHLET for _ in range(c)),
            )
            self.face_data[partner] = FaceData(
                velocity=np.zeros((self.ndims, *fs_p)),
                scalar=np.zeros((c, *fs_p)) if c else None,
            )
        fs = face_shape(self.shape, f)
        c = self.domain.scalar_channels
        if scalar_types is None:
            scalar_types = tuple(BCType.DIRICHLET for _ in range(c))
        vel = np.zeros((self.ndims, *fs)) if velocity is None else np.broadcast_to(
            np.asarray(velocity, dtype=np.float64), (self.ndims, *fs)
        ).copy()
        scal = None
        if c:
            scal = (
                np.zeros((c, *fs))
                if scalar is None
                else np.broadcast_to(np.asarray(scalar, dtype=np.float64), (c, *fs)).copy()
            )
        self.faces[f] = FaceSpec(
            kind=BoundKind.FIXED, vel_type=vel_type, scalar_types=tuple(scalar_types)
        )
        self.face_data[f] = FaceData(velocity=vel, scalar=scal)

    def set_boundary_velocity(self, face: int | str, velocity) -> None:
        f = self._face_index(face)
        if self.faces[f].kind != BoundKind.FIXED:
            raise ValueError("face is not a FIXED boundary")
        fs = face_shape(self.shape, f)
        vel = np.broadcast_to(np.asarray(velocity, np.float64), (self.ndims, *fs)).copy()
        self.face_data[f] = replace(self.face_data[f], velocity=vel)

    def set_boundary_scalar(self, face: int | str, scalar) -> None:
        f = self._face_index(face)
        if self.faces[f].kind != BoundKind.FIXED:
            raise ValueError("face is not a FIXED boundary")
        fs = face_shape(self.shape, f)
        c = self.domain.scalar_channels
        scal = np.broadcast_to(np.asarray(scalar, np.float64), (c, *fs)).copy()
        self.face_data[f] = replace(self.face_data[f], scalar=scal)

    # -- field setters ---------------------------------------------------
    def set_velocity(self, velocity) -> None:
        self.velocity = np.broadcast_to(
            np.asarray(velocity, np.float64), (self.ndims, *self.shape)
        ).copy()

    def set_pressure(self, pressure) -> None:
        self.pressure = np.broadcast_to(
            np.asarray(pressure, np.float64), self.shape
        ).copy()

    def set_scalar(self, scalar) -> None:
        c = self.domain.scalar_channels
        if not c:
            raise ValueError("domain has no passive scalar channels")
        self.scalar = np.broadcast_to(
            np.asarray(scalar, np.float64), (c, *self.shape)
        ).copy()

    def set_velocity_source(self, source) -> None:
        self.velocity_source = np.broadcast_to(
            np.asarray(source, np.float64), (self.ndims, *self.shape)
        ).copy()


class DomainBuilder:
    """Imperative builder producing (DomainTopo, geoms, DomainState).

    Mirrors the reference ``PISOtorch.Domain`` construction API so env code
    reads like the original (fluid framework users' muscle memory), while the
    output is a purely functional pytree triple.
    """

    def __init__(
        self,
        ndims: int,
        viscosity: float,
        scalar_channels: int = 0,
        name: str = "domain",
        dtype=None,
    ):
        from fluidgym_tpu.config import config

        self.ndims = int(ndims)
        self.viscosity = float(viscosity)
        self.scalar_channels = int(scalar_channels)
        self.scalar_diffusivity: np.ndarray | None = None
        self.name = name
        self.dtype = dtype or config.dtype
        self._blocks: list[_BlockBuilder] = []

    def create_block(self, vertex_coords, name: str | None = None) -> _BlockBuilder:
        b = _BlockBuilder(self, vertex_coords, name or f"block{len(self._blocks)}")
        if b.ndims != self.ndims:
            raise ValueError("block dimensionality must match domain")
        self._blocks.append(b)
        return b

    def set_scalar_diffusivity(self, diffusivity) -> None:
        self.scalar_diffusivity = np.broadcast_to(
            np.asarray(diffusivity, np.float64), (self.scalar_channels,)
        ).copy()

    def connect_blocks(
        self,
        block_a: int,
        face_a: int | str,
        block_b: int,
        face_b: int | str,
        connected_axis_a: int | str | None = None,
        connected_axis_b: int | str | None = None,
    ) -> None:
        """Connect two block faces with the reference's axis-mapping semantics
        (domain_structs.cpp ConnectBlocks:1080-1114).

        ``connected_axis_a``: face index (or name like "-y") on block_b that
        block_a's first tangential axis ``(face_axis+1) % ndims`` maps onto;
        ``connected_axis_b`` likewise for the second tangential axis in 3D.
        Defaults to the aligned (non-inverted, cyclic) mapping.
        """
        a = self._blocks[block_a]
        b = self._blocks[block_b]
        fa = a._face_index(face_a)
        fb = b._face_index(face_b)
        d = self.ndims
        fa_dim, fb_dim = fa // 2, fb // 2

        def _axidx(v, blk):
            return blk._face_index(v) if v is not None else None

        ca = _axidx(connected_axis_a, b)
        cb = _axidx(connected_axis_b, b)
        if d > 1 and ca is None:
            ca = (((fb_dim + 1) % d) << 1)
        if d > 2 and cb is None:
            cb = (((fb_dim + 2) % d) << 1)

        axes_a: list[int] = [fb]
        axes_b: list[int] = [fa]
        if d > 1:
            axes_a.append(ca)
            if d == 2 and (ca >> 1) != (fb_dim + 1) % d:
                # in 2D the single tangential axis MUST map onto the
                # neighbor's single tangential axis; anything else would
                # alias the face-normal axis and fail later as a cryptic
                # transpose error inside the first jitted halo exchange
                raise ValueError(
                    "invalid connection axis mapping: connected_axis_a must "
                    "be the neighbor's tangential axis in 2D"
                )
            if d == 2 or (ca >> 1) == (fb_dim + 1) % d:
                axes_b.append((((fa_dim + 1) % d) << 1) | (ca & 1))
                swapped = False
            else:
                if (cb >> 1) != (fb_dim + 1) % d:
                    raise ValueError("invalid connection axis mapping")
                axes_b.append((((fa_dim + 2) % d) << 1) | (cb & 1))
                swapped = True
            if d > 2:
                axes_a.append(cb)
                if not swapped:
                    axes_b.append((((fa_dim + 2) % d) << 1) | (cb & 1))
                else:
                    axes_b.append((((fa_dim + 1) % d) << 1) | (ca & 1))

        # tangential extents must agree cell-for-cell (the reference
        # requires matching connected face sizes; a mismatch would only
        # surface as a shape error deep inside the halo scatter)
        fs_a = face_shape(a.shape, fa)
        fs_b = face_shape(b.shape, fb)
        if sorted(fs_a) != sorted(fs_b):
            raise ValueError(
                f"connected faces have incompatible sizes: block {block_a} "
                f"face {fa} is {fs_a}, block {block_b} face {fb} is {fs_b}"
            )
        a.faces[fa] = FaceSpec(
            kind=BoundKind.CONNECTED, connected_block=block_b, connected_face=fb,
            axes=tuple(axes_a),
        )
        b.faces[fb] = FaceSpec(
            kind=BoundKind.CONNECTED, connected_block=block_a, connected_face=fa,
            axes=tuple(axes_b),
        )
        # drop stale prescribed-value arrays (a previously closed face being
        # reconnected, reference ConnectBlock over CloseBoundary)
        a.face_data[fa] = FaceData()
        b.face_data[fb] = FaceData()

    # -- finalize ----------------------------------------------------------
    def build(self):
        """Produce ``(topo, geoms, state)`` device pytrees."""
        dt = self.dtype
        topo_blocks = []
        geoms = []
        states = []
        for b in self._blocks:
            topo_blocks.append(
                BlockTopo(
                    shape=b.shape,
                    faces=tuple(b.faces),
                    orthogonal=b.orthogonal,
                    name=b.name,
                )
            )
            if b.orthogonal:
                minv_diag = np.stack(
                    [b._Minv[..., d, d] for d in range(self.ndims)], axis=0
                )
                minv = None
            else:
                minv_diag = None
                minv = b._Minv
            geoms.append(
                BlockGeom(
                    det=jnp.asarray(b._det, dt),
                    minv_diag=None if minv_diag is None else jnp.asarray(minv_diag, dt),
                    minv=None if minv is None else jnp.asarray(minv, dt),
                    alpha=jnp.asarray(b._alpha, dt),
                    centers=jnp.asarray(b._centers, dt),
                )
            )
            faces = tuple(
                FaceData(
                    velocity=None if fd.velocity is None else jnp.asarray(fd.velocity, dt),
                    scalar=None if fd.scalar is None else jnp.asarray(fd.scalar, dt),
                )
                for fd in b.face_data
            )
            states.append(
                BlockState(
                    velocity=jnp.asarray(b.velocity, dt),
                    pressure=jnp.asarray(b.pressure, dt),
                    scalar=None if b.scalar is None else jnp.asarray(b.scalar, dt),
                    velocity_source=(
                        None
                        if b.velocity_source is None
                        else jnp.asarray(b.velocity_source, dt)
                    ),
                    faces=faces,
                    viscosity=None,
                )
            )
        topo = DomainTopo(
            blocks=tuple(topo_blocks),
            ndims=self.ndims,
            scalar_channels=self.scalar_channels,
            name=self.name,
        )
        state = DomainState(
            blocks=tuple(states),
            viscosity=jnp.asarray(self.viscosity, dt),
            scalar_diffusivity=(
                None
                if self.scalar_diffusivity is None
                else jnp.asarray(self.scalar_diffusivity, dt)
            ),
        )
        return topo, tuple(geoms), state
