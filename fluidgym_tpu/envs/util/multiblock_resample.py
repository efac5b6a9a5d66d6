"""Multi-block curvilinear -> uniform grid resampling via precomputed gathers.

Replaces the reference's scatter/splat resampling with weight normalization
and iterative hole filling (``resampling.cu``: SampleTransformedGridLocalTo
Global, and the pure-torch port ``pict/data/resample.py:361-549``) with a
TPU-first **gather** formulation: grid geometry is static per env config, so
an inverse-distance interpolation plan (k nearest source cell centers per
uniform target cell, over ALL blocks) is computed once on the host with a
KD-tree; the per-step resample is then ``out = sum_k w_k * field[idx_k]`` --
three fused gathers, no scatter, no hole-filling loop, fully differentiable.

Targets with no source cell within ``max_dist`` (e.g. inside the cylinder)
get weight zero and resolve to 0, mirroring the reference's unfilled-cell
behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["make_multiblock_plan", "make_multiblock_point_plan"]


def make_multiblock_plan(
    centers_list: list[np.ndarray],
    out_shape_xyz: tuple[int, ...],
    bounds_lower: tuple[float, ...],
    bounds_upper: tuple[float, ...],
    k: int = 4,
    max_dist_factor: float = 2.0,
):
    """Build the gather plan.

    ``centers_list``: per-block cell centers ``(ndims, *spatial)``;
    ``out_shape_xyz`` target resolution in physical (x, y[, z]) order;
    ``bounds``: physical extents of the target grid.  Returns a closure
    ``resample(fields) -> (C?, *out_shape)``.
    """
    ndims = len(out_shape_xyz)
    pts = np.concatenate(
        [c.reshape(ndims, -1).T for c in centers_list], axis=0
    )  # (N, ndims)
    block_sizes = [int(np.prod(c.shape[1:])) for c in centers_list]

    axes = [
        bounds_lower[d] + (np.arange(out_shape_xyz[d]) + 0.5)
        * (bounds_upper[d] - bounds_lower[d]) / out_shape_xyz[d]
        for d in range(ndims)
    ]
    mesh = np.meshgrid(*axes[::-1], indexing="ij")  # [z][y][x]
    targets = np.stack([m.ravel() for m in mesh[::-1]], axis=-1)  # (nt, ndims)

    out_shape = tuple(int(out_shape_xyz[ndims - 1 - i]) for i in range(ndims))
    idx, w = _point_weights(pts, targets, k, max_dist_factor)
    # (k, nt) layout: the large target axis must be MINOR on TPU -- an
    # (nt, k) array gets tiled (8, 128), padding k=4 to 128 and inflating
    # HBM 32x (observed as a 19 GB allocation for a 38M-target 3D plan)
    idx_j = jnp.asarray(idx.astype(np.int32).T)   # (k, nt)
    w_j = jnp.asarray(w.astype(np.float32).T)     # (k, nt)

    def resample(fields) -> Array:
        """``fields``: per-block arrays (C?, *spatial) -> (C?, *out_shape)."""
        has_channels = fields[0].ndim > ndims
        if has_channels:
            flat = jnp.concatenate(
                [f.reshape(f.shape[:-ndims] + (-1,)) for f in fields], axis=-1
            )  # (C, N)
            gathered = flat[..., idx_j]  # (C, k, nt)
            out = jnp.sum(gathered * w_j.astype(flat.dtype), axis=-2)
            return out.reshape(fields[0].shape[:-ndims] + out_shape)
        flat = jnp.concatenate([f.reshape(-1) for f in fields], axis=0)
        gathered = flat[idx_j]  # (k, nt)
        out = jnp.sum(gathered * w_j.astype(flat.dtype), axis=0)
        return out.reshape(out_shape)

    return resample


def _point_weights(pts: np.ndarray, targets: np.ndarray, k: int,
                   max_dist_factor: float):
    """k-NN inverse-distance-squared weights of ``targets`` against source
    points ``pts``; targets with no source within ``max_dist`` get zero."""
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    dist, idx = tree.query(targets, k=k)
    if k == 1:
        dist, idx = dist[:, None], idx[:, None]
    typical = np.median(dist[:, 0])  # typical source spacing
    max_dist = max_dist_factor * typical + 1e-12
    w = 1.0 / np.maximum(dist, 1e-10) ** 2
    w[dist[:, 0:1] > max_dist * np.ones_like(dist)] = 0.0
    covered = dist[:, 0] <= max_dist
    w = w * covered[:, None]
    norm = w.sum(axis=1, keepdims=True)
    w = w / np.where(norm == 0, 1.0, norm)
    return idx, w


def make_multiblock_point_plan(
    centers_list: list[np.ndarray],
    points: np.ndarray,
    k: int = 4,
    max_dist_factor: float = 2.0,
):
    """Gather plan for ARBITRARY physical target points.

    ``points (n, ndims)`` in the same physical frame as the block centers.
    Returns ``sample(fields) -> (C?, n)``.  Use this for sensor
    observations: gathering a handful of points directly keeps the
    (constant-folded) plan tensors tiny inside jitted env steps -- resampling
    a full uniform grid first bakes multi-hundred-MB index constants into
    the step HLO on large 3D configs.
    """
    ndims = centers_list[0].shape[0]
    pts = np.concatenate(
        [c.reshape(ndims, -1).T for c in centers_list], axis=0
    )
    idx, w = _point_weights(pts, np.asarray(points, np.float64), k,
                            max_dist_factor)
    idx_j = jnp.asarray(idx.astype(np.int32).T)   # (k, n)
    w_j = jnp.asarray(w.astype(np.float32).T)     # (k, n)

    def sample(fields) -> Array:
        has_channels = fields[0].ndim > ndims
        if has_channels:
            flat = jnp.concatenate(
                [f.reshape(f.shape[:-ndims] + (-1,)) for f in fields], axis=-1
            )
            gathered = flat[..., idx_j]  # (C, k, n)
            return jnp.sum(gathered * w_j.astype(flat.dtype), axis=-2)
        flat = jnp.concatenate([f.reshape(-1) for f in fields], axis=0)
        gathered = flat[idx_j]  # (k, n)
        return jnp.sum(gathered * w_j.astype(flat.dtype), axis=0)

    return sample
