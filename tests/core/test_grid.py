"""Grid tests (mirrors tests/core/test_grid.c)."""

import numpy as np
import pytest

from cfd_tpu import Grid, CFDError


def test_uniform_grid_coordinates():
    g = Grid.uniform(11, 21, xmin=0.0, xmax=1.0, ymin=0.0, ymax=2.0)
    assert g.nx == 11 and g.ny == 21 and g.nz == 1
    np.testing.assert_allclose(g.x[0], 0.0)
    np.testing.assert_allclose(g.x[-1], 1.0)
    np.testing.assert_allclose(g.y[-1], 2.0)
    np.testing.assert_allclose(g.dx, 0.1)
    np.testing.assert_allclose(g.dy, 0.1)
    assert g.is_uniform()
    assert not g.is_3d
    assert g.k_start == 0 and g.k_end == 1
    assert g.inv_dz2 == 0.0 and g.dz0 == 0.0


def test_uniform_grid_3d():
    g = Grid.uniform(5, 6, 7, zmin=0.0, zmax=3.0)
    assert g.is_3d
    assert g.shape == (7, 6, 5)
    np.testing.assert_allclose(g.z[0], 0.0)
    np.testing.assert_allclose(g.z[-1], 3.0)
    np.testing.assert_allclose(g.dz, 0.5)
    np.testing.assert_allclose(g.inv_dz2, 4.0)
    assert g.k_start == 1 and g.k_end == 6


def test_invalid_dimensions_raise():
    with pytest.raises(CFDError):
        Grid.uniform(0, 5)
    with pytest.raises(CFDError):
        Grid.uniform(5, 5, xmin=1.0, xmax=0.0)
    with pytest.raises(CFDError):
        Grid.uniform(5, 5, 5, zmin=1.0, zmax=1.0)


def test_stretched_grid_endpoints_and_clustering():
    # Formula check against grid.c:129-160.
    g = Grid.stretched(33, 33, beta=2.0)
    np.testing.assert_allclose(g.x[0], 0.0, atol=1e-14)
    np.testing.assert_allclose(g.x[-1], 1.0, atol=1e-14)
    np.testing.assert_allclose(g.x[16], 0.5, atol=1e-14)  # midpoint maps to center
    # Clustering: edge spacing < center spacing.
    assert g.dx[0] < g.dx[len(g.dx) // 2]
    assert g.dx[-1] < g.dx[len(g.dx) // 2]
    assert not g.is_uniform("x")
    # Monotone coordinates.
    assert np.all(np.diff(g.x) > 0)


def test_stretched_beta_zero_falls_back_to_uniform():
    g = Grid.stretched(9, 9, beta=0.0)
    np.testing.assert_allclose(g.dx, g.dx[0])


def test_stretched_grid_3d_inv_dz2_uses_min_spacing():
    g = Grid.stretched(9, 9, 9, zmin=0.0, zmax=1.0, beta=1.5)
    np.testing.assert_allclose(g.inv_dz2, 1.0 / np.min(g.dz) ** 2)


def test_coordinate_arrays_broadcast():
    g = Grid.uniform(4, 5, 3, zmin=0.0, zmax=1.0)
    X, Y, Z = g.coordinate_arrays()
    assert X.shape == (1, 1, 4)
    assert Y.shape == (1, 5, 1)
    assert Z.shape == (3, 1, 1)
