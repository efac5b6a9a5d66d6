"""Core state and geometry: pytree domain model, grid generation, metrics."""

from fluidgym_tpu.core import geometry
from fluidgym_tpu.core.domain import (
    BCType,
    BlockGeom,
    BlockState,
    BlockTopo,
    BoundKind,
    DomainBuilder,
    DomainState,
    DomainTopo,
    FaceData,
    FaceSpec,
)

__all__ = [
    "geometry",
    "BCType",
    "BlockGeom",
    "BlockState",
    "BlockTopo",
    "BoundKind",
    "DomainBuilder",
    "DomainState",
    "DomainTopo",
    "FaceData",
    "FaceSpec",
]
