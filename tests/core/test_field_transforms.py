"""FlowField as a first-class JAX pytree: vmap/tree_map/scan/grad-safety —
the TPU-native contract that replaces the reference's SoA memory layout
tests (`tests/core/test_flow_field*.c`)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step


def test_tree_map_preserves_structure():
    f = FlowField.initialize(Grid.uniform(8, 8))
    g = jax.tree_util.tree_map(lambda a: a * 2.0, f)
    assert isinstance(g, FlowField)
    np.testing.assert_array_equal(np.asarray(g.u), 2.0 * np.asarray(f.u))
    leaves = jax.tree_util.tree_leaves(f)
    assert len(leaves) == 6  # u, v, w, p, rho, T


def test_vmap_over_batch_of_fields():
    """vmap a step over a batch axis prepended to every leaf — ensemble
    runs in one compile."""
    g = Grid.uniform(12, 12)
    step = make_euler_step(g, NSParams(source_amplitude_u=0.0,
                                       source_amplitude_v=0.0))
    base = FlowField.initialize(g)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a * 0.5, a * 0.25]), base)

    def one(f):
        out, res = step(f, 1e-4, 0)
        return out.u, res.status

    us, statuses = jax.vmap(one)(batch)
    assert us.shape == (3,) + base.u.shape
    assert np.all(np.asarray(statuses) == 0)
    # members evolved independently (different magnitudes)
    assert not np.allclose(np.asarray(us[0]), np.asarray(us[1]))


def test_scan_carries_field():
    g = Grid.uniform(12, 12)
    step = make_euler_step(g, NSParams())
    f0 = FlowField.initialize(g)

    def body(f, i):
        f2, res = step(f, 1e-4, i)
        return f2, res.max_velocity

    f_end, vmax_trace = lax.scan(body, f0, jnp.arange(5))
    assert isinstance(f_end, FlowField)
    assert vmax_trace.shape == (5,)
    assert bool(f_end.is_finite())


def test_jit_donation_and_dtype_stability():
    g = Grid.uniform(12, 12)
    step = jax.jit(make_euler_step(g, NSParams(), dtype=jnp.float32))
    f = FlowField.initialize(g, dtype=jnp.float32)
    out, _ = step(f, 1e-4, 0)
    for name in ("u", "v", "w", "p", "rho", "T"):
        assert getattr(out, name).dtype == jnp.float32, name


def test_field_flatten_roundtrip():
    f = FlowField.initialize(Grid.uniform(6, 7, 5, zmin=0, zmax=1))
    leaves, treedef = jax.tree_util.tree_flatten(f)
    f2 = jax.tree_util.tree_unflatten(treedef, leaves)
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_array_equal(np.asarray(getattr(f, name)),
                                      np.asarray(getattr(f2, name)))
