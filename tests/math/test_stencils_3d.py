"""3D finite-difference accuracy vs analytic derivatives — the
`test_finite_differences_3d.c` analog: every first/second-derivative op,
the 3D gradient and divergence, and per-axis O(h²) convergence."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import Grid
from cfd_tpu.ops import stencils

TWO_PI = 2.0 * np.pi


def _grid(n):
    return Grid.uniform(n, n, n, zmin=0.0, zmax=1.0)


def _field_and_exact(g):
    X, Y, Z = (np.asarray(a) for a in g.coordinate_arrays())
    f = np.sin(TWO_PI * X) * np.cos(TWO_PI * Y) * np.sin(TWO_PI * Z)
    dfdx = TWO_PI * np.cos(TWO_PI * X) * np.cos(TWO_PI * Y) * np.sin(TWO_PI * Z)
    dfdy = -TWO_PI * np.sin(TWO_PI * X) * np.sin(TWO_PI * Y) * np.sin(TWO_PI * Z)
    dfdz = TWO_PI * np.sin(TWO_PI * X) * np.cos(TWO_PI * Y) * np.cos(TWO_PI * Z)
    return f, dfdx, dfdy, dfdz


def _interior_err(num, exact):
    sl = (slice(1, -1), slice(1, -1), slice(1, -1))
    return float(np.max(np.abs(np.asarray(num)[sl] - exact[sl])))


def test_first_derivatives_3d_accuracy():
    n = 48
    g = _grid(n)
    f, dfdx, dfdy, dfdz = _field_and_exact(g)
    fj = jnp.asarray(f)
    h = 1.0 / (n - 1)
    inv2 = 1.0 / (2.0 * h)
    bar = 80.0 * h ** 2  # (2π)³/6-scale truncation constant
    assert _interior_err(stencils.ddx(fj, inv2), dfdx) < bar
    assert _interior_err(stencils.ddy(fj, inv2), dfdy) < bar
    assert _interior_err(stencils.ddz(fj, inv2), dfdz) < bar


def test_second_derivatives_3d_accuracy():
    n = 48
    g = _grid(n)
    f, _, _, _ = _field_and_exact(g)
    fj = jnp.asarray(f)
    h = 1.0 / (n - 1)
    inv_h2 = 1.0 / h ** 2
    d2 = -TWO_PI ** 2 * f  # each axis contributes −(2π)²·f
    bar = 600.0 * h ** 2   # (2π)⁴/12-scale
    assert _interior_err(stencils.d2dx2(fj, inv_h2), d2) < bar
    assert _interior_err(stencils.d2dy2(fj, inv_h2), d2) < bar
    assert _interior_err(stencils.d2dz2(fj, inv_h2), d2) < bar
    lap = stencils.laplacian(fj, inv_h2, inv_h2, inv_h2)
    assert _interior_err(lap, 3.0 * d2) < 3 * bar


def test_gradient_3d_matches_component_ops():
    n = 16
    g = _grid(n)
    f, _, _, _ = _field_and_exact(g)
    fj = jnp.asarray(f)
    h = 1.0 / (n - 1)
    inv2 = 1.0 / (2.0 * h)
    gx, gy, gz = stencils.gradient(fj, inv2, inv2, inv2)
    np.testing.assert_array_equal(np.asarray(gx),
                                  np.asarray(stencils.ddx(fj, inv2)))
    np.testing.assert_array_equal(np.asarray(gy),
                                  np.asarray(stencils.ddy(fj, inv2)))
    np.testing.assert_array_equal(np.asarray(gz),
                                  np.asarray(stencils.ddz(fj, inv2)))


def test_divergence_3d_of_solenoidal_field():
    """div of the 3D Taylor-Green-like solenoidal field ≈ 0 at O(h²)."""
    n = 48
    g = _grid(n)
    X, Y, Z = (np.asarray(a) for a in g.coordinate_arrays())
    u = np.cos(TWO_PI * X) * np.sin(TWO_PI * Y) * np.sin(TWO_PI * Z)
    v = np.sin(TWO_PI * X) * np.cos(TWO_PI * Y) * np.sin(TWO_PI * Z)
    w = -2.0 * np.sin(TWO_PI * X) * np.sin(TWO_PI * Y) * np.cos(TWO_PI * Z)
    h = 1.0 / (n - 1)
    inv2 = 1.0 / (2.0 * h)
    div = stencils.divergence(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
                              inv2, inv2, inv2)
    assert _interior_err(div, np.zeros_like(u)) < 200.0 * h ** 2


@pytest.mark.parametrize("op,exact_idx", [("ddx", 1), ("ddy", 2),
                                          ("ddz", 3)])
def test_per_axis_convergence_order(op, exact_idx):
    """Each first-derivative op converges at rate ≈ 2 under refinement."""
    errs = []
    for n in (16, 32):
        g = _grid(n)
        parts = _field_and_exact(g)
        h = 1.0 / (n - 1)
        num = getattr(stencils, op)(jnp.asarray(parts[0]), 1.0 / (2.0 * h))
        errs.append(_interior_err(num, parts[exact_idx]))
    rate = np.log2(errs[0] / errs[1]) / np.log2((31) / (15))
    assert rate > 1.7, (op, errs, rate)


def test_ddz_degenerates_in_2d():
    """inv_2dz = 0 makes ddz exactly zero (the branch-free idiom)."""
    f = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8)))
    assert float(jnp.max(jnp.abs(stencils.ddz(f, 0.0)))) == 0.0
