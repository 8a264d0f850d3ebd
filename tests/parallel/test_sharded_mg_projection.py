"""Sharded projection with the fused shard_map multigrid pressure solve.

``make_sharded_step(..., poisson_method=MULTIGRID, use_pallas=True)``
dispatches to the GSPMD jnp predictor/corrector with the
`parallel.fused_mg` wavefront V-cycles as the pressure solve (MG's
2^k+1 grids sit outside the rolling predictor kernels' support, so the
V-cycles are the fusable cost).  Validates dispatch (strict builds),
numerics vs the single-device jnp projection, and the fallback reason
for non-coarsenable grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method, PoissonParams


def _random_field(grid, seed=0, amp=0.1):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32))


@pytest.fixture(scope="module")
def grid():
    return Grid.uniform(33, 33, 33, zmin=0.0, zmax=1.0)


def test_strict_dispatch_builds(grid):
    """The MULTIGRID pressure solve qualifies for the fused sharded path
    (strict=True would raise on fallback)."""
    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(
        grid, NSParams(), mesh, "projection", use_pallas=True,
        strict=True, dtype=jnp.float32,
        poisson_method=Method.MULTIGRID,
        poisson_params=PoissonParams(tolerance=1e-6))
    f_out, res = step(place(_random_field(grid)), 0.001, 0)
    assert int(res.status) == 0
    assert len(f_out.u.sharding.device_set) == 8


def test_strict_raises_on_non_coarsenable():
    g = Grid.uniform(32, 32, 32, zmin=0.0, zmax=1.0)
    mesh = make_mesh(axes=("z",))
    with pytest.raises(ValueError, match="coarsenable"):
        make_sharded_step(g, NSParams(), mesh, "projection",
                          use_pallas=True, strict=True,
                          dtype=jnp.float32,
                          poisson_method=Method.MULTIGRID)


def _mesh(axes, shape):
    if shape is None:
        return make_mesh(axes=axes)
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:shape[0] * shape[1]]).reshape(
        *shape), axes)


@pytest.mark.parametrize("axes,shape", [(("z",), None),
                                        (("z", "y"), (2, 4))])
def test_matches_single_device(grid, axes, shape):
    """Sharded MG projection vs the single-device jnp projection+MG:
    same converged state to solver tolerance."""
    params = NSParams()
    pp = PoissonParams(tolerance=1e-6)
    f = _random_field(grid, seed=5)

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32, use_pallas=False,
        poisson_method=Method.MULTIGRID, poisson_params=pp))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    mesh = _mesh(axes, shape)
    step, place = make_sharded_step(
        grid, params, mesh, "projection", use_pallas=True, strict=True,
        dtype=jnp.float32, poisson_method=Method.MULTIGRID,
        poisson_params=pp)
    f_out, res = step(place(f), 0.001, 0)

    assert int(res.status) == int(res_ref.status) == 0
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=1e-4)


@pytest.mark.heavy
def test_multi_step_with_energy(grid):
    """Three steps with energy+Boussinesq: the MG pressure solve composes
    with the GSPMD thermal post-step."""
    # energy/buoyancy enablement is derived (alpha > 0, beta != 0)
    params = NSParams(alpha=1e-3, beta=0.5, T_ref=0.5)
    pp = PoissonParams(tolerance=1e-6)
    rng = np.random.default_rng(7)
    f = _random_field(grid, seed=7).replace(
        T=jnp.asarray(rng.uniform(0, 1, grid.shape), jnp.float32))

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32, use_pallas=False,
        poisson_method=Method.MULTIGRID, poisson_params=pp))
    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(
        grid, params, mesh, "projection", use_pallas=True, strict=True,
        dtype=jnp.float32, poisson_method=Method.MULTIGRID,
        poisson_params=pp)

    f_ref, f_sh = f, place(f)
    for it in range(3):
        f_ref, _ = ref_step(f_ref, 0.001, it)
        f_sh, res = step(f_sh, 0.001, it)
        assert int(res.status) == 0
    for name in ("u", "v", "w", "T"):
        np.testing.assert_allclose(np.asarray(getattr(f_sh, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=3e-5)
