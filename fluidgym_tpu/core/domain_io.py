"""Domain (de)serialization: JSON topology + compressed npz tensors.

Same two-file layout as the reference
(``/root/reference/src/fluidgym/simulation/pict/util/domain_io.py:64-327``):
``<name>.json`` holds the static topology/metadata, ``<name>.npz`` the arrays.
Used for the initial-domain datasets (10 domains x train/val/test per env
config, reference fluid_env.py:58,1114-1190) and for env checkpointing.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core.domain import (
    BCType,
    BlockGeom,
    BlockState,
    BlockTopo,
    BoundKind,
    DomainState,
    DomainTopo,
    FaceData,
    FaceSpec,
)

__all__ = ["save_domain", "load_domain"]

_FORMAT_VERSION = 1


def _spec_to_json(spec: FaceSpec) -> dict:
    return {
        "kind": spec.kind.name,
        "vel_type": spec.vel_type.name,
        "scalar_types": [t.name for t in spec.scalar_types],
        "connected_block": spec.connected_block,
        "connected_face": spec.connected_face,
        "axes": list(spec.axes),
    }


def _spec_from_json(d: dict) -> FaceSpec:
    return FaceSpec(
        kind=BoundKind[d["kind"]],
        vel_type=BCType[d["vel_type"]],
        scalar_types=tuple(BCType[t] for t in d["scalar_types"]),
        connected_block=d.get("connected_block", -1),
        connected_face=d.get("connected_face", -1),
        axes=tuple(d.get("axes", ())),
    )


def save_domain(
    topo: DomainTopo,
    geoms: tuple[BlockGeom, ...],
    state: DomainState,
    path: str | Path,
) -> None:
    """Write ``<path>.json`` + ``<path>.npz``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    arrays: dict[str, np.ndarray] = {}

    def put(key: str, arr) -> str | None:
        if arr is None:
            return None
        arrays[key] = np.asarray(arr)
        return key

    meta: dict = {
        "format_version": _FORMAT_VERSION,
        "name": topo.name,
        "ndims": topo.ndims,
        "scalar_channels": topo.scalar_channels,
        "viscosity": put("viscosity", state.viscosity),
        "scalar_diffusivity": put("scalar_diffusivity", state.scalar_diffusivity),
        "blocks": [],
    }
    for i, (btopo, geom, blk) in enumerate(zip(topo.blocks, geoms, state.blocks)):
        faces = []
        for f, (spec, fd) in enumerate(zip(btopo.faces, blk.faces)):
            faces.append(
                {
                    **_spec_to_json(spec),
                    "velocity": put(f"b{i}_f{f}_velocity", fd.velocity),
                    "scalar": put(f"b{i}_f{f}_scalar", fd.scalar),
                }
            )
        meta["blocks"].append(
            {
                "name": btopo.name,
                "shape": list(btopo.shape),
                "orthogonal": btopo.orthogonal,
                "faces": faces,
                "velocity": put(f"b{i}_velocity", blk.velocity),
                "pressure": put(f"b{i}_pressure", blk.pressure),
                "scalar": put(f"b{i}_scalar", blk.scalar),
                "velocity_source": put(f"b{i}_velocity_source", blk.velocity_source),
                "block_viscosity": put(f"b{i}_block_viscosity", blk.viscosity),
                "det": put(f"b{i}_det", geom.det),
                "minv_diag": put(f"b{i}_minv_diag", geom.minv_diag),
                "minv": put(f"b{i}_minv", geom.minv),
                "alpha": put(f"b{i}_alpha", geom.alpha),
                "centers": put(f"b{i}_centers", geom.centers),
            }
        )

    with open(path.with_suffix(".json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    np.savez_compressed(path.with_suffix(".npz"), **arrays)


def load_domain(path: str | Path, dtype=None):
    """Read a domain saved by :func:`save_domain`.

    Returns ``(topo, geoms, state)``.
    """
    from fluidgym_tpu.config import config

    dtype = dtype or config.dtype
    path = Path(path)
    json_path = path.with_suffix(".json")
    npz_path = path.with_suffix(".npz")
    if not json_path.exists() or not npz_path.exists():
        raise FileNotFoundError(f"domain files not found at {path}(.json/.npz)")
    with open(json_path) as fh:
        meta = json.load(fh)
    data = np.load(npz_path)

    def get(key, dt=dtype):
        if key is None:
            return None
        return jnp.asarray(data[key], dt)

    topo_blocks = []
    geoms = []
    states = []
    for b in meta["blocks"]:
        specs = tuple(_spec_from_json(f) for f in b["faces"])
        topo_blocks.append(
            BlockTopo(
                shape=tuple(b["shape"]),
                faces=specs,
                orthogonal=bool(b["orthogonal"]),
                name=b["name"],
            )
        )
        geoms.append(
            BlockGeom(
                det=get(b["det"]),
                minv_diag=get(b["minv_diag"]),
                minv=get(b["minv"]),
                alpha=get(b["alpha"]),
                centers=get(b["centers"]),
            )
        )
        faces = tuple(
            FaceData(velocity=get(f["velocity"]), scalar=get(f["scalar"]))
            for f in b["faces"]
        )
        states.append(
            BlockState(
                velocity=get(b["velocity"]),
                pressure=get(b["pressure"]),
                scalar=get(b["scalar"]),
                velocity_source=get(b["velocity_source"]),
                faces=faces,
                viscosity=get(b.get("block_viscosity")),
            )
        )
    topo = DomainTopo(
        blocks=tuple(topo_blocks),
        ndims=int(meta["ndims"]),
        scalar_channels=int(meta["scalar_channels"]),
        name=meta.get("name", "domain"),
    )
    state = DomainState(
        blocks=tuple(states),
        viscosity=get(meta["viscosity"]),
        scalar_diffusivity=get(meta["scalar_diffusivity"]),
    )
    return topo, tuple(geoms), state
