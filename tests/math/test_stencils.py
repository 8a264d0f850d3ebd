"""Stencil accuracy tests vs analytic derivatives.

Mirrors tests/math/test_finite_differences.c / _3d.c: apply each operator to a
smooth analytic function and check interior-point accuracy at O(h²).
"""

import jax.numpy as jnp
import numpy as np

from cfd_tpu import Grid
from cfd_tpu.ops import stencils


def _field_2d(g):
    X = np.asarray(g.x)[None, None, :]
    Y = np.asarray(g.y)[None, :, None]
    f = np.sin(np.pi * X) * np.cos(np.pi * Y) + 0 * X
    return jnp.asarray(np.broadcast_to(f, g.shape)), X, Y


def test_first_derivatives_2d():
    g = Grid.uniform(65, 65)
    f, X, Y = _field_2d(g)
    inv_2dx = 1.0 / (2 * g.dx0)
    inv_2dy = 1.0 / (2 * g.dy0)
    dfdx = stencils.ddx(f, inv_2dx)
    dfdy = stencils.ddy(f, inv_2dy)
    exact_x = np.pi * np.cos(np.pi * X) * np.cos(np.pi * Y)
    exact_y = -np.pi * np.sin(np.pi * X) * np.sin(np.pi * Y)
    interior = (slice(None), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(np.asarray(dfdx)[interior],
                               np.broadcast_to(exact_x, g.shape)[interior],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(dfdy)[interior],
                               np.broadcast_to(exact_y, g.shape)[interior],
                               atol=5e-3)


def test_second_derivative_and_laplacian_2d():
    g = Grid.uniform(65, 65)
    f, X, Y = _field_2d(g)
    inv_dx2 = 1.0 / g.dx0 ** 2
    inv_dy2 = 1.0 / g.dy0 ** 2
    lap = stencils.laplacian(f, inv_dx2, inv_dy2)
    exact = -2 * np.pi ** 2 * np.sin(np.pi * X) * np.cos(np.pi * Y)
    interior = (slice(None), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(np.asarray(lap)[interior],
                               np.broadcast_to(exact, g.shape)[interior],
                               atol=5e-2)


def test_laplacian_3d():
    g = Grid.uniform(33, 33, 33, zmin=0.0, zmax=1.0)
    X = np.asarray(g.x)[None, None, :]
    Y = np.asarray(g.y)[None, :, None]
    Z = np.asarray(g.z)[:, None, None]
    f = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
    fj = jnp.asarray(np.broadcast_to(f, g.shape))
    lap = stencils.laplacian(fj, 1.0 / g.dx0 ** 2, 1.0 / g.dy0 ** 2,
                             1.0 / g.dz0 ** 2)
    exact = -3 * np.pi ** 2 * f
    interior = (slice(1, -1), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(np.asarray(lap)[interior],
                               np.broadcast_to(exact, g.shape)[interior],
                               atol=0.15)


def test_divergence_2d():
    g = Grid.uniform(65, 65)
    X = np.broadcast_to(np.asarray(g.x)[None, None, :], g.shape)
    Y = np.broadcast_to(np.asarray(g.y)[None, :, None], g.shape)
    # Divergence-free field: u = sin(pi x) cos(pi y), v = -cos(pi x) sin(pi y)
    u = jnp.asarray(np.sin(np.pi * X) * np.cos(np.pi * Y))
    v = jnp.asarray(-np.cos(np.pi * X) * np.sin(np.pi * Y))
    div = stencils.divergence(u, v, None, 1 / (2 * g.dx0), 1 / (2 * g.dy0))
    interior = (slice(None), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(np.asarray(div)[interior], 0.0, atol=1e-10)


def test_branch_free_2d_equals_3d_with_zero_invdz():
    """The inv_dz2=0 trick: 2D results from the 3D code path."""
    g = Grid.uniform(17, 17)
    f, _, _ = _field_2d(g)
    lap2 = stencils.laplacian(f, 1.0, 1.0)
    lap3 = stencils.laplacian(f, 1.0, 1.0, 0.0)
    np.testing.assert_array_equal(np.asarray(lap2), np.asarray(lap3))


def test_periodic_interior_shift_wraps_skipping_ghosts():
    g = Grid.uniform(8, 5)
    f = jnp.arange(np.prod(g.shape), dtype=jnp.float64).reshape(g.shape)
    left = stencils.sx_m_periodic_interior(f)
    # at i=1, left neighbor wraps to nx-2 (ns_momentum_rhs_scalar.h:80)
    np.testing.assert_array_equal(np.asarray(left)[:, :, 1],
                                  np.asarray(f)[:, :, -2])
    # at i=2..nx-2 left neighbor is i-1
    np.testing.assert_array_equal(np.asarray(left)[:, :, 2],
                                  np.asarray(f)[:, :, 1])
    right = stencils.sx_p_periodic_interior(f)
    np.testing.assert_array_equal(np.asarray(right)[:, :, -2],
                                  np.asarray(f)[:, :, 1])


def test_convergence_order_second_derivative():
    """Refinement study: error ratio ≈ 4 when h halves (O(h²))."""
    errs = []
    for n in (17, 33, 65):
        g = Grid.uniform(n, n)
        f, X, Y = _field_2d(g)
        lap = stencils.laplacian(f, 1.0 / g.dx0 ** 2, 1.0 / g.dy0 ** 2)
        exact = np.broadcast_to(-2 * np.pi ** 2 * np.sin(np.pi * X)
                                * np.cos(np.pi * Y), g.shape)
        err = np.max(np.abs(np.asarray(lap)[:, 1:-1, 1:-1]
                            - exact[:, 1:-1, 1:-1]))
        errs.append(err)
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate1 > 1.9 and rate2 > 1.9
