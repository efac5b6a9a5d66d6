"""VTK (.vtu) output of multi-block domain states.

Replaces the reference's pyvista-based writer
(``/root/reference/src/fluidgym/simulation/pict/util/outputVtk.py:29-156``)
with a dependency-free XML UnstructuredGrid writer: all blocks' vertex grids
are merged into one unstructured mesh of quads (2D) / hexahedra (3D) with
per-cell pressure and velocity, loadable in ParaView.
"""

from __future__ import annotations

import base64
import struct
from pathlib import Path

import numpy as np

__all__ = ["save_vtk"]


def _block_cells(shape_vertices: tuple[int, ...], offset: int) -> np.ndarray:
    """Cell connectivity for one structured vertex block.

    2D (ny+1, nx+1) -> (ncells, 4) quads; 3D (nz+1, ny+1, nx+1) ->
    (ncells, 8) hexahedra; vertex ids offset into the merged point list."""
    idx = np.arange(int(np.prod(shape_vertices)), dtype=np.int64).reshape(
        shape_vertices) + offset
    if len(shape_vertices) == 2:
        v00 = idx[:-1, :-1]
        v01 = idx[:-1, 1:]
        v11 = idx[1:, 1:]
        v10 = idx[1:, :-1]
        return np.stack([v00, v01, v11, v10], axis=-1).reshape(-1, 4)
    a = idx[:-1, :-1, :-1]
    b = idx[:-1, :-1, 1:]
    c = idx[:-1, 1:, 1:]
    d = idx[:-1, 1:, :-1]
    e = idx[1:, :-1, :-1]
    f = idx[1:, :-1, 1:]
    g = idx[1:, 1:, 1:]
    h = idx[1:, 1:, :-1]
    return np.stack([a, b, c, d, e, f, g, h], axis=-1).reshape(-1, 8)


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()


def save_vtk(state, vertex_coords_list, out_dir, it: int = 0,
             name: str = "vtk_out") -> Path:
    """Write one ``<name>_%04d.vtu`` file of the full multi-block state.

    ``state``: DomainState; ``vertex_coords_list``: per-block vertex arrays
    ``(ndims, [nz+1,] ny+1, nx+1)`` (e.g. ``env._blocks_vertex_coords``)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    ndims = int(np.asarray(vertex_coords_list[0]).shape[0])
    points, cells, pressures, velocities = [], [], [], []
    offset = 0
    for blk, vc in zip(state.blocks, vertex_coords_list):
        vc = np.asarray(vc, dtype=np.float32)
        vshape = vc.shape[1:]
        pts = vc.reshape(ndims, -1).T  # (n, ndims); rows follow C order
        if ndims == 2:
            pts = np.concatenate(
                [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1)
        points.append(pts.astype(np.float32))
        cells.append(_block_cells(vshape, offset))
        offset += pts.shape[0]

        p = np.asarray(blk.pressure, dtype=np.float32).reshape(-1)
        pressures.append(p)
        u = np.asarray(blk.velocity, dtype=np.float32)
        u = np.moveaxis(u, 0, -1).reshape(-1, ndims)
        if ndims == 2:
            u = np.concatenate([u, np.zeros((u.shape[0], 1), np.float32)], axis=1)
        velocities.append(u.astype(np.float32))

    pts = np.concatenate(points, axis=0)
    conn = np.concatenate(cells, axis=0).astype(np.int64)
    p = np.concatenate(pressures)
    v = np.concatenate(velocities, axis=0)

    n_pts = pts.shape[0]
    n_cells = conn.shape[0]
    npc = conn.shape[1]
    offsets = (np.arange(1, n_cells + 1, dtype=np.int64) * npc)
    cell_type = 9 if ndims == 2 else 12  # VTK_QUAD / VTK_HEXAHEDRON
    types = np.full(n_cells, cell_type, np.uint8)

    path = out_dir / f"{name}_{it:04d}.vtu"
    with open(path, "w") as fh:
        fh.write('<?xml version="1.0"?>\n')
        fh.write('<VTKFile type="UnstructuredGrid" version="1.0" '
                 'byte_order="LittleEndian" header_type="UInt32">\n')
        fh.write("<UnstructuredGrid>\n")
        fh.write(f'<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">\n')
        fh.write("<Points>\n")
        fh.write('<DataArray type="Float32" NumberOfComponents="3" '
                 f'format="binary">{_b64(pts.ravel())}</DataArray>\n')
        fh.write("</Points>\n<Cells>\n")
        fh.write('<DataArray type="Int64" Name="connectivity" '
                 f'format="binary">{_b64(conn.ravel())}</DataArray>\n')
        fh.write('<DataArray type="Int64" Name="offsets" '
                 f'format="binary">{_b64(offsets)}</DataArray>\n')
        fh.write('<DataArray type="UInt8" Name="types" '
                 f'format="binary">{_b64(types)}</DataArray>\n')
        fh.write("</Cells>\n<CellData>\n")
        fh.write('<DataArray type="Float32" Name="p" '
                 f'format="binary">{_b64(p)}</DataArray>\n')
        fh.write('<DataArray type="Float32" Name="v" NumberOfComponents="3" '
                 f'format="binary">{_b64(v.ravel())}</DataArray>\n')
        fh.write("</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")
    return path
