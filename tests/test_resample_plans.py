"""Direct unit tests for the resampling plans against analytic fields
(mirroring the reference's resampling kernel tests,
tests/simulation/test_torch_resample.py:23-180): exact recovery of linear
fields under bilinear interpolation, IDW approximation accuracy, out-of-reach
targets resolving to zero, and nonzero gradients reaching every block."""

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.envs.util.multiblock_resample import (
    make_multiblock_plan,
    make_multiblock_point_plan,
)
from fluidgym_tpu.envs.util.resample import make_rectilinear_plan


def _grid_coords(xs, ys):
    return np.stack(np.meshgrid(xs, ys, indexing="xy"), 0)  # (2, ny+1, nx+1)


def _centers(coords):
    c = 0.25 * (coords[:, :-1, :-1] + coords[:, 1:, :-1]
                + coords[:, :-1, 1:] + coords[:, 1:, 1:])
    return c


def test_rectilinear_plan_exact_on_linear_fields():
    """Per-axis linear interpolation reproduces a (bi)linear field exactly,
    including on a stretched (non-uniform) grid (ref test_torch_resample
    exactness check, :60-93)."""
    xs = np.linspace(0.0, 2.0, 17) ** 1.3 / 2.0 ** 0.3  # stretched
    ys = np.linspace(-1.0, 1.0, 13)
    coords = _grid_coords(xs, ys)
    plan = make_rectilinear_plan(coords, out_shape_xyz=(24, 18))
    cx, cy = _centers(coords)
    field = 2.0 * cx - 3.0 * cy + 0.5
    out = np.asarray(plan(jnp.asarray(field, jnp.float32)))

    # targets: uniform centers over the same extent
    tx = xs[0] + (np.arange(24) + 0.5) / 24 * (xs[-1] - xs[0])
    ty = ys[0] + (np.arange(18) + 0.5) / 18 * (ys[-1] - ys[0])
    TX, TY = np.meshgrid(tx, ty, indexing="xy")
    expected = 2.0 * TX - 3.0 * TY + 0.5
    # interior targets are exact; edge targets clamp-extrapolate
    np.testing.assert_allclose(out[2:-2, 2:-2], expected[2:-2, 2:-2],
                               rtol=1e-5, atol=1e-5)


def test_rectilinear_plan_channels_and_shape():
    xs = np.linspace(0.0, 1.0, 9)
    ys = np.linspace(0.0, 1.0, 7)
    plan = make_rectilinear_plan(_grid_coords(xs, ys), out_shape_xyz=(10, 5))
    field = jnp.asarray(np.random.default_rng(0).normal(size=(3, 6, 8)),
                        jnp.float32)
    out = plan(field)
    assert out.shape == (3, 5, 10)  # array order (y, x)


def test_multiblock_idw_recovers_smooth_field():
    """Two side-by-side blocks -> one uniform grid: the k-NN IDW plan
    approximates a smooth field everywhere including across the seam
    (ref :60-93, atol relative to field scale)."""
    ys = np.linspace(0.0, 1.0, 21)
    ca = _grid_coords(np.linspace(0.0, 1.0, 21), ys)
    cb = _grid_coords(np.linspace(1.0, 2.0, 21), ys)
    cents = [_centers(ca), _centers(cb)]

    def f(x, y):
        return np.sin(2 * x) + 0.5 * np.cos(3 * y)

    fields = [jnp.asarray(f(c[0], c[1]), jnp.float32) for c in cents]
    plan = make_multiblock_plan(cents, out_shape_xyz=(40, 20),
                                bounds_lower=(0.0, 0.0),
                                bounds_upper=(2.0, 1.0))
    out = np.asarray(plan(tuple(fields)))
    tx = (np.arange(40) + 0.5) / 40 * 2.0
    ty = (np.arange(20) + 0.5) / 20 * 1.0
    TX, TY = np.meshgrid(tx, ty, indexing="xy")
    np.testing.assert_allclose(out, f(TX, TY), atol=0.03)


def test_multiblock_unreachable_targets_are_zero():
    """Targets far outside every block resolve to exactly zero (the
    reference's unfilled-cell behavior, resample.py:499-549)."""
    ys = np.linspace(0.0, 1.0, 11)
    ca = _grid_coords(np.linspace(0.0, 1.0, 11), ys)
    cents = [_centers(ca)]
    fields = (jnp.ones((10, 10), jnp.float32) * 7.0,)
    plan = make_multiblock_plan(cents, out_shape_xyz=(30, 10),
                                bounds_lower=(0.0, 0.0),
                                bounds_upper=(3.0, 1.0))
    out = np.asarray(plan(fields))
    assert np.allclose(out[:, -5:], 0.0)   # x in [2.5, 3]: no sources
    assert np.allclose(out[:, :5], 7.0)    # x in [0, 0.5]: covered


def test_point_plan_matches_grid_plan():
    """Sampling arbitrary points equals sampling the uniform grid at those
    cell centers (same kernel, different target sets)."""
    ys = np.linspace(0.0, 1.0, 16)
    ca = _grid_coords(np.linspace(0.0, 1.0, 16), ys)
    cents = [_centers(ca)]
    rng = np.random.default_rng(2)
    field = (jnp.asarray(rng.normal(size=(15, 15)), jnp.float32),)

    nx = ny = 10
    grid_plan = make_multiblock_plan(cents, (nx, ny), (0.0, 0.0), (1.0, 1.0))
    tx = (np.arange(nx) + 0.5) / nx
    ty = (np.arange(ny) + 0.5) / ny
    TX, TY = np.meshgrid(tx, ty, indexing="xy")
    pts = np.stack([TX.ravel(), TY.ravel()], axis=-1)
    point_plan = make_multiblock_point_plan(cents, pts)

    full = np.asarray(grid_plan(field)).reshape(-1)
    pointwise = np.asarray(point_plan(field))
    np.testing.assert_allclose(pointwise, full, rtol=1e-6, atol=1e-6)


def test_multiblock_plan_gradients_reach_every_block():
    """Nonzero cotangents reach EVERY source block through the resample
    (ref test_torch_resample.py:119-138)."""
    ys = np.linspace(0.0, 1.0, 9)
    ca = _grid_coords(np.linspace(0.0, 1.0, 9), ys)
    cb = _grid_coords(np.linspace(1.0, 2.0, 9), ys)
    cents = [_centers(ca), _centers(cb)]
    plan = make_multiblock_plan(cents, (16, 8), (0.0, 0.0), (2.0, 1.0))

    def loss(fa, fb):
        return jnp.sum(plan((fa, fb)) ** 2)

    fa = jnp.asarray(np.random.default_rng(3).normal(size=(8, 8)), jnp.float32)
    fb = jnp.asarray(np.random.default_rng(4).normal(size=(8, 8)), jnp.float32)
    ga, gb = jax.grad(loss, argnums=(0, 1))(fa, fb)
    assert float(jnp.abs(ga).sum()) > 0
    assert float(jnp.abs(gb).sum()) > 0

    # analytic-vs-FD pinning on one entry (ref :141-180)
    eps = 1e-2
    e = jnp.zeros_like(fa).at[3, 4].set(1.0)
    fd = (loss(fa + eps * e, fb) - loss(fa - eps * e, fb)) / (2 * eps)
    np.testing.assert_allclose(float(ga[3, 4]), float(fd), rtol=1e-2,
                               atol=1e-3)
