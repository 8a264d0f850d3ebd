"""Fused multi-chip BiCGSTAB (shard_map ring halos + psum dots).

Validates the distributed twin of the three-pass fused BiCGSTAB on the
8-device virtual CPU mesh, on z-only and (z, y) meshes.  Unlike CG,
BiCGSTAB's trajectory is sensitive to dot-product rounding (the jnp and
single-chip fused solvers already differ by a few iterations on the same
problem), so the assertions are convergence + solution agreement + an
iteration-count window rather than exact parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.parallel import make_mesh
from cfd_tpu.parallel.fused_bicgstab import (
    bicgstab_fused_sharded_unsupported_reason, make_bicgstab_fused_sharded)
from cfd_tpu.solvers.poisson.base import PoissonParams, PoissonProblem
from cfd_tpu.solvers.poisson.krylov import make_bicgstab, \
    make_bicgstab_fused


@pytest.fixture(scope="module")
def problem():
    return PoissonProblem(128, 16, 16, 1.0 / 127, 1.0 / 15, 1.0 / 15)


@pytest.fixture(scope="module")
def zmesh():
    return make_mesh(axes=("z",))


def _zy_mesh(pz, py):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:pz * py]).reshape(pz, py),
                ("z", "y"))


def _rhs(problem, seed=0):
    rng = np.random.default_rng(seed)
    r = np.zeros(problem.shape)
    r[1:-1, 1:-1, 1:-1] = rng.normal(
        0.0, 1.0, tuple(s - 2 for s in problem.shape))
    r -= r[1:-1, 1:-1, 1:-1].mean()
    return jnp.asarray(r, jnp.float32)


def test_supported(problem):
    assert bicgstab_fused_sharded_unsupported_reason(problem, 8) is None
    p2 = PoissonProblem(128, 16, 1, 0.01, 0.01, 0.0)
    assert "3D" in bicgstab_fused_sharded_unsupported_reason(p2, 8)
    p3 = PoissonProblem(128, 32, 8, 0.01, 0.01, 0.01)
    assert bicgstab_fused_sharded_unsupported_reason(p3, 2, py=4) is None
    assert "y-shards" in bicgstab_fused_sharded_unsupported_reason(
        p3, 2, py=8)


def test_matches_single_chip_fused(problem, zmesh):
    """Same rotated recursion sharded vs one device: both converge, same
    ballpark iteration count, matching solutions."""
    params = PoissonParams(tolerance=1e-3, max_iterations=400)
    rhs = _rhs(problem)
    x0 = jnp.zeros(problem.shape, jnp.float32)

    ref = jax.jit(make_bicgstab_fused(problem, params, interpret=True))
    r_ref = ref(x0, rhs)

    solve = jax.jit(make_bicgstab_fused_sharded(problem, params, zmesh))
    r_sh = solve(x0, rhs)

    assert int(r_sh.status) == int(r_ref.status) == 0
    assert abs(int(r_sh.iterations) - int(r_ref.iterations)) \
        <= max(5, int(0.3 * int(r_ref.iterations)))
    np.testing.assert_allclose(float(r_sh.initial_residual),
                               float(r_ref.initial_residual), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=2e-5)
    assert len(r_sh.x.sharding.device_set) == 8


def test_matches_jnp_bicgstab(problem, zmesh):
    """Fixed-SHORT-budget run tracks the jnp reference BiCGSTAB closely
    (rounding paths have not yet diverged), and caller shells survive."""
    params = PoissonParams(tolerance=0.0, absolute_tolerance=0.0,
                           max_iterations=8, check_interval=8)
    rhs = _rhs(problem, seed=3)
    x1 = jnp.asarray(np.random.default_rng(9).normal(
        0, 1, problem.shape), jnp.float32)

    r_ref = jax.jit(make_bicgstab(problem, params))(x1, rhs)
    r_sh = jax.jit(make_bicgstab_fused_sharded(problem, params,
                                               zmesh))(x1, rhs)

    assert int(r_sh.iterations) == int(r_ref.iterations) == 8
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=5e-4)


def test_zy_matches_single_chip_fused():
    """(z, y)-mesh fused BiCGSTAB converges to the same solution as the
    single-chip fused solver across mesh aspect ratios."""
    problem = PoissonProblem(128, 32, 8, 1.0 / 127, 1.0 / 31, 1.0 / 7)
    params = PoissonParams(tolerance=1e-3, max_iterations=400)
    rhs = _rhs(problem, seed=5)
    x0 = jnp.zeros(problem.shape, jnp.float32)

    ref = jax.jit(make_bicgstab_fused(problem, params, interpret=True))
    r_ref = ref(x0, rhs)

    for pz, py in ((2, 4), (4, 2), (2, 2)):
        solve = jax.jit(make_bicgstab_fused_sharded(problem, params,
                                                    _zy_mesh(pz, py)))
        r_sh = solve(x0, rhs)
        assert int(r_sh.status) == int(r_ref.status) == 0
        assert abs(int(r_sh.iterations) - int(r_ref.iterations)) \
            <= max(5, int(0.3 * int(r_ref.iterations))), (pz, py)
        np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                                   atol=5e-5, err_msg=f"mesh ({pz},{py})")


def test_projection_with_sharded_bicgstab(problem, zmesh):
    """Fused sharded projection accepts poisson_method=BICGSTAB (the
    BiCGSTAB local body rides the same (x, rhs) → PoissonResult slot as
    the fused CG) and matches the single-device jnp projection step using
    the same settings.  Rounding-path sensitivity ⇒ solution-level
    tolerances, not iteration parity."""
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method

    grid = Grid.uniform(128, 16, 16, zmin=0.0, zmax=1.0)
    params = NSParams()
    pp = PoissonParams(tolerance=1e-4, max_iterations=400)
    rng = np.random.default_rng(31)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32))

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32, poisson_method=Method.BICGSTAB,
        poisson_params=pp))
    f_ref, rr = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32,
                                    poisson_method=Method.BICGSTAB,
                                    poisson_params=pp)
    f_out, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=1e-4, err_msg=name)
    # p: two BiCGSTAB trajectories converged to residual tol 1e-4 on a
    # κ≈(nx/π)² system agree only to tol·κ-scale (the corrector sees ∇p,
    # hence the tight velocity gate above); demeaned to drop the Neumann
    # gauge.
    dp = np.asarray(f_out.p) - np.asarray(f_ref.p)
    np.testing.assert_allclose(dp - dp[1:-1, 1:-1, 1:-1].mean(), 0.0,
                               atol=5e-2)


def test_zy_projection_with_sharded_bicgstab():
    """poisson_method=BICGSTAB through the (z, y)-mesh fused projection."""
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method

    g = Grid.uniform(128, 32, 8, zmin=0.0, zmax=1.0)
    params = NSParams()
    pp = PoissonParams(tolerance=1e-5, max_iterations=800)
    rng = np.random.default_rng(37)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32))

    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.BICGSTAB,
                                       poisson_params=pp))
    fr, rr = ref(f, 1e-3, 0)

    step, place = make_sharded_step(g, params, _zy_mesh(2, 4),
                                    "projection", use_pallas=True,
                                    strict=True, dtype=jnp.float32,
                                    poisson_method=Method.BICGSTAB,
                                    poisson_params=pp)
    ff, rf = step(place(f), 1e-3, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-4, err_msg=name)
    dp = np.asarray(ff.p) - np.asarray(fr.p)
    np.testing.assert_allclose(dp - dp[1:-1, 1:-1, 1:-1].mean(), 0.0,
                               atol=5e-2)
