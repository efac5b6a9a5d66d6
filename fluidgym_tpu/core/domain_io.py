"""Domain (de)serialization: JSON topology + compressed npz tensors.

Same two-file layout as the reference
(``/root/reference/src/fluidgym/simulation/pict/util/domain_io.py:64-327``):
``<name>.json`` holds the static topology/metadata, ``<name>.npz`` the arrays.
Used for the initial-domain datasets (10 domains x train/val/test per env
config, reference fluid_env.py:58,1114-1190) and for env checkpointing.
"""

from __future__ import annotations

import json
from dataclasses import replace
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
    """Read a domain from ``<path>.json`` + ``<path>.npz``.

    Auto-detects the layout: files written by :func:`save_domain` (marked by
    ``format_version``) or the REFERENCE layout written by PICT's
    ``save_domain`` (marked by ``spatialDims``;
    ``/root/reference/src/fluidgym/simulation/pict/util/domain_io.py:64-182``)
    -- so the reference's published HuggingFace initial-domain datasets load
    directly.  Returns ``(topo, geoms, state)``.
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
    if "format_version" not in meta and "spatialDims" in meta:
        return _load_reference_domain(meta, npz_path, dtype)
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


def _load_reference_domain(meta: dict, npz_path: Path, dtype):
    """Rebuild ``(topo, geoms, state)`` from the REFERENCE on-disk layout.

    Mirrors PICT ``load_domain``
    (``/root/reference/src/fluidgym/simulation/pict/util/domain_io.py:185-327``):
    arrays live flat in the npz keyed ``"0".."n"`` (shared tensors dedup'd to
    one slot), JSON fields hold the slot indices, block tensors are NCDHW with
    a leading batch dim of 1, boundaries are listed per face in -x,+x,-y,...
    order.  CONNECTED boundaries store the raw ConnectedBoundary axis table,
    which is exactly the encoding our ``FaceSpec.axes`` replicates (see
    core/domain.py:104-121), so it transfers verbatim.

    Geometry comes from ``vertexCoordinates``; blocks saved with only a
    precomputed ``transform`` are rejected (the packed transform layout is a
    CUDA-extension internal; every published FluidGym dataset stores vertex
    coordinates).
    """
    from fluidgym_tpu.core.domain import DomainBuilder

    with np.load(npz_path) as data_npz:
        data = [np.asarray(data_npz[str(i)]) for i in range(len(data_npz))]

    def get(d: dict, name: str):
        return data[int(d[name])] if name in d else None

    def squeeze_batch(arr):
        if arr is None:
            return None
        if arr.ndim >= 1 and arr.shape[0] == 1:
            return arr[0]
        return arr

    ndims = int(meta["spatialDims"])
    channels = int(meta.get("passiveScalarChannels", 0))
    visc = get(meta, "viscosity")
    dom = DomainBuilder(
        ndims=ndims,
        viscosity=float(np.asarray(visc).reshape(-1)[0]),
        scalar_channels=channels,
        name=meta.get("name", "domain"),
        dtype=dtype,
    )
    if channels and "passiveScalarViscosity" in meta:
        dom.set_scalar_diffusivity(
            np.asarray(get(meta, "passiveScalarViscosity")).reshape(-1))
    elif channels:
        dom.set_scalar_diffusivity(np.zeros((channels,)))

    block_visc = []
    for bd in meta["blocks"]:
        coords = get(bd, "vertexCoordinates")
        if coords is None:
            raise NotImplementedError(
                "reference domain stores a precomputed transform instead of "
                "vertexCoordinates; only coordinate-based blocks are "
                "supported (all published FluidGym datasets use coordinates)"
            )
        blk = dom.create_block(squeeze_batch(coords), name=bd.get("name"))
        blk.set_velocity(squeeze_batch(get(bd, "velocity")))
        pressure = squeeze_batch(get(bd, "pressure"))
        if pressure is not None and pressure.ndim == ndims + 1:
            pressure = pressure[0]  # NCHW with C=1
        blk.set_pressure(pressure)
        if channels and "scalar" in bd:
            blk.set_scalar(squeeze_batch(get(bd, "scalar")))
        if "velocitySource" in bd:
            src = squeeze_batch(get(bd, "velocitySource"))
            blk.set_velocity_source(
                np.broadcast_to(src.reshape((-1,) + (1,) * ndims)
                                if src.ndim == 1 else src,
                                (ndims, *blk.shape)))
        block_visc.append(squeeze_batch(get(bd, "viscosity")))

    # boundaries second (CONNECTED needs every block to exist)
    for bi, bd in enumerate(meta["blocks"]):
        blk = dom._blocks[bi]
        for f, bnd in enumerate(bd["boundaries"]):
            btype = bnd["type"]
            if btype in ("FIXED", "DIRICHLET", "DIRICHLET_VARYING"):
                vel_type = BCType[bnd.get("velocityType", "DIRICHLET")]
                st = bnd.get("passiveScalarType")
                if isinstance(st, str):
                    st = [st] * channels
                scalar_types = (tuple(BCType[t] for t in st)
                                if st is not None else None)
                bvel = squeeze_batch(get(bnd, "velocity"))
                if bvel is not None and bvel.ndim == 1:
                    # static boundary velocity saved as (1, C): broadcast over
                    # the face (reference FixedBoundary static value)
                    bvel = bvel.reshape((ndims,) + (1,) * ndims)
                bscal = squeeze_batch(get(bnd, "scalar")) if channels else None
                if bscal is not None and np.ndim(bscal) <= 1:
                    bscal = np.asarray(bscal).reshape(
                        (channels,) + (1,) * ndims)
                blk.close_boundary(f, velocity=bvel, scalar=bscal,
                                   vel_type=vel_type,
                                   scalar_types=scalar_types)
            elif btype == "CONNECTED":
                axes = tuple(int(a) for a in bnd["axes"])
                blk.faces[f] = FaceSpec(
                    kind=BoundKind.CONNECTED,
                    connected_block=int(bnd["connectedBlock"]),
                    connected_face=axes[0],
                    axes=axes,
                )
                blk.face_data[f] = FaceData()
            elif btype == "PERIODIC":
                blk.faces[f] = FaceSpec(kind=BoundKind.PERIODIC)
                blk.face_data[f] = FaceData()
            else:
                raise NotImplementedError(
                    f"unsupported reference boundary type {btype!r}")

    topo, geoms, state = dom.build()
    for bi, bv in enumerate(block_visc):
        if bv is not None:
            if bv.ndim == ndims + 1:
                bv = bv[0]
            state = state.replace_block(
                bi, replace(state.blocks[bi],
                            viscosity=jnp.asarray(bv, dtype)))
    return topo, geoms, state
