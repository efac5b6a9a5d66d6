"""Geometry unit tests: weight functions, grids, metric identities."""

import numpy as np
import pytest

from fluidgym_tpu.core import geometry as geo


def test_weights_exp_uniform():
    w = geo.make_weights_exp(10, base=1.0, refinement="START")
    assert np.allclose(w, np.linspace(0, 1, 11))
    assert w[0] == 0 and np.isclose(w[-1], 1.0)


def test_weights_exp_refined_both_symmetric():
    w = geo.make_weights_exp(10, base=1.3, refinement="BOTH")
    d = np.diff(w)
    assert np.allclose(d, d[::-1], atol=1e-12)  # symmetric
    assert d[0] < d[len(d) // 2]  # refined toward walls


def test_uniform_grid_metrics():
    coords = geo.make_uniform_grid((4, 8), lower=(0.0, 0.0), upper=(2.0, 1.0))
    assert coords.shape == (2, 9, 5)
    M, Minv, det = geo.coords_to_transforms(coords)
    hx, hy = 0.5, 0.125
    assert np.allclose(det, hx * hy)
    assert np.allclose(M[..., 0, 0], hx)
    assert np.allclose(M[..., 1, 1], hy)
    assert np.allclose(Minv[..., 0, 0], 1 / hx)
    assert geo.is_orthogonal(M)


def test_wall_refined_grid_cell_sizes():
    coords = geo.make_wall_refined_ortho_grid(
        8, 16, corner_lower=(0, -0.5), corner_upper=(np.pi, 0.5),
        wall_refinement=("-y", "+y"), base=1.1,
    )
    M, Minv, det = geo.coords_to_transforms(coords)
    assert geo.is_orthogonal(M)
    # cell heights symmetric in y, smaller at walls
    hy = M[..., 1, 1][:, 0]
    assert hy[0] < hy[len(hy) // 2]
    assert np.allclose(hy, hy[::-1], atol=1e-12)
    # total height sums to 1
    assert np.isclose(hy.sum(), 1.0)


def test_extrude_grid_z():
    g2 = geo.make_uniform_grid((4, 4), (0, 0), (1, 1))
    g3 = geo.extrude_grid_z(g2, res_z=6, start_z=0.0, end_z=2.0, exp_base=1)
    assert g3.shape == (3, 7, 5, 5)
    M, Minv, det = geo.coords_to_transforms(g3)
    assert np.allclose(det, 0.25 * 0.25 * (2.0 / 6))
    assert geo.is_orthogonal(M)


def test_metric_identity_curvilinear():
    # rotated grid: M should reproduce the rotation, det invariant
    theta = 0.3
    base = geo.make_uniform_grid((8, 8), (0, 0), (1, 1))
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    rotated = np.einsum("ij,jyx->iyx", R, base)
    M, Minv, det = geo.coords_to_transforms(rotated)
    assert np.allclose(det, (1 / 8) ** 2, atol=1e-12)
    assert not geo.is_orthogonal(M)
    # M @ Minv == I
    eye = np.einsum("...ij,...jk->...ik", M, Minv)
    assert np.allclose(eye, np.eye(2), atol=1e-10)


def test_transfinite_interpolation_matches_corners():
    corners = [(0, 0), (2, 0), (0, 1), (3, 2)]
    g = geo.generate_grid_vertices_2d((5, 7), corners)
    assert np.allclose(g[:, 0, 0], corners[0])
    assert np.allclose(g[:, 0, -1], corners[1])
    assert np.allclose(g[:, -1, 0], corners[2])
    assert np.allclose(g[:, -1, -1], corners[3])
