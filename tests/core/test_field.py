"""FlowField tests (mirrors tests/core/test_flow_field_3d.c and the
initialize_flow_field behavior in solver_explicit_euler.c:124-160)."""

import jax
import numpy as np

from cfd_tpu import FlowField, Grid
from cfd_tpu.core import derived
import pytest


def test_zeros_shape_and_w_allocated():
    f = FlowField.zeros(5, 6, 7)
    assert f.shape == (7, 6, 5)
    assert f.nx == 5 and f.ny == 6 and f.nz == 7
    np.testing.assert_array_equal(np.asarray(f.w), 0.0)


def test_initialize_matches_reference_formula():
    g = Grid.uniform(20, 10, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0)
    f = FlowField.initialize(g)
    X = np.broadcast_to(np.asarray(g.x)[None, None, :], g.shape)
    Y = np.broadcast_to(np.asarray(g.y)[None, :, None], g.shape)
    # Outside the perturbation radius the base profile holds exactly.
    r = np.sqrt((X - 1.0) ** 2 + (Y - 0.5) ** 2)
    outside = r >= 0.2
    u = np.asarray(f.u)
    v = np.asarray(f.v)
    np.testing.assert_allclose(u[outside],
                               (1.0 + 0.1 * np.sin(np.pi * Y))[outside])
    np.testing.assert_allclose(v[outside],
                               (0.05 * np.sin(2 * np.pi * X))[outside])
    np.testing.assert_array_equal(np.asarray(f.w), 0.0)
    np.testing.assert_allclose(np.asarray(f.rho), 1.0)
    np.testing.assert_allclose(np.asarray(f.T), 300.0)
    # Inside, the pressure bump raises p above the base value.
    inside = r < 0.1
    assert np.all(np.asarray(f.p)[inside] > 1.0)


def test_field_is_pytree():
    f = FlowField.zeros(4, 4)
    leaves = jax.tree_util.tree_leaves(f)
    assert len(leaves) == 6
    f2 = jax.tree_util.tree_map(lambda a: a + 1.0, f)
    np.testing.assert_allclose(np.asarray(f2.u), 1.0)


@pytest.mark.nan_injection
def test_is_finite_flag():
    f = FlowField.zeros(4, 4)
    assert bool(f.is_finite())
    bad = f.replace(u=f.u.at[0, 1, 1].set(np.nan))
    assert not bool(bad.is_finite())


def test_velocity_magnitude_and_stats():
    f = FlowField.zeros(3, 3).replace(
        u=3.0 * np.ones((1, 3, 3)), v=4.0 * np.ones((1, 3, 3)))
    vm = derived.velocity_magnitude(f)
    np.testing.assert_allclose(np.asarray(vm), 5.0)
    stats = derived.compute_statistics(f)
    np.testing.assert_allclose(float(stats["vel_mag"].max_val), 5.0)
    np.testing.assert_allclose(float(stats["u"].avg_val), 3.0)
    np.testing.assert_allclose(float(stats["p"].min_val), 0.0)
