"""Multigrid Poisson tests (a capability beyond the reference, which stubs
POISSON_METHOD_MULTIGRID at linear_solver.c:236-238)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd_tpu.core.status import CFDError, Status
from cfd_tpu.solvers.poisson import (Method, PoissonParams, PoissonStatus,
                                     Precond, create_solver)


def system(n, seed=0, nz=1):
    h = 1.0 / (n - 1)
    rng = np.random.default_rng(seed)
    shape = (nz, n, n) if nz == 1 else (nz, n, n)
    rhs = rng.normal(size=shape)
    rhs[..., 0] = rhs[..., -1] = 0
    rhs[:, 0, :] = rhs[:, -1, :] = 0
    if nz > 1:
        rhs[0] = rhs[-1] = 0
    return h, jnp.asarray(rhs)


def test_multigrid_converges_fast_2d():
    n = 65
    h, rhs = system(n)
    s = create_solver(Method.MULTIGRID)
    s.init(n, n, 1, h, h, 0.0)
    x, stats = s.solve(jnp.zeros((1, n, n)), rhs)
    assert stats.status == PoissonStatus.CONVERGED
    # Textbook multigrid: grid-independent, ~1 digit per cycle.
    assert stats.iterations <= 12, stats.iterations

    # CG on the same system takes an order of magnitude more iterations.
    cg = create_solver(Method.CG)
    cg.init(n, n, 1, h, h, 0.0)
    x_cg, stats_cg = cg.solve(jnp.zeros((1, n, n)), rhs)
    assert stats_cg.iterations > 5 * stats.iterations
    np.testing.assert_allclose(np.asarray(x)[0, 1:-1, 1:-1],
                               np.asarray(x_cg)[0, 1:-1, 1:-1],
                               atol=5e-5)


@pytest.mark.heavy
def test_multigrid_iterations_grid_independent():
    iters = []
    for n in (33, 65, 129):
        h, rhs = system(n)
        s = create_solver(Method.MULTIGRID)
        s.init(n, n, 1, h, h, 0.0)
        _, stats = s.solve(jnp.zeros((1, n, n)), rhs)
        assert stats.status == PoissonStatus.CONVERGED
        iters.append(stats.iterations)
    # The hallmark of multigrid: iteration count does not grow with n.
    assert max(iters) - min(iters) <= 3, iters


def test_multigrid_3d():
    n = 33
    h, rhs = system(n, nz=n)
    s = create_solver(Method.MULTIGRID)
    s.init(n, n, n, h, h, h)
    x, stats = s.solve(jnp.zeros((n, n, n)), rhs)
    assert stats.status == PoissonStatus.CONVERGED
    assert stats.iterations <= 12
    # Same fixed point as CG (the Dirichlet-0 correction-space convention).
    cg = create_solver(Method.CG)
    cg.init(n, n, n, h, h, h, PoissonParams(tolerance=1e-8))
    x_cg, stats_cg = cg.solve(jnp.zeros((n, n, n)), rhs)
    assert stats_cg.status == PoissonStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(x)[1:-1, 1:-1, 1:-1],
                               np.asarray(x_cg)[1:-1, 1:-1, 1:-1],
                               atol=1e-4)


def test_mg_preconditioned_cg():
    n = 65
    h, rhs = system(n)
    s = create_solver(Method.CG,
                      PoissonParams(preconditioner=Precond.MULTIGRID))
    s.init(n, n, 1, h, h, 0.0,
           PoissonParams(preconditioner=Precond.MULTIGRID))
    x, stats = s.solve(jnp.zeros((1, n, n)), rhs)
    assert stats.status == PoissonStatus.CONVERGED
    assert stats.iterations <= 12, stats.iterations


def test_non_coarsenable_grid_rejected():
    s = create_solver(Method.MULTIGRID)
    with pytest.raises(CFDError) as e:
        s.init(30, 30, 1, 0.1, 0.1, 0.0)  # (n-1)=29 odd
    assert e.value.status == Status.ERROR_UNSUPPORTED


def test_projection_with_multigrid_pressure_solver():
    """The projection step accepts MULTIGRID as its pressure method."""
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step

    grid = Grid.uniform(33, 33)
    step = make_projection_step(grid, NSParams(mu=0.01),
                                poisson_method=Method.MULTIGRID)
    f, res = step(FlowField.initialize(grid), 1e-3, 0)
    assert int(res.status) == 0
    assert bool(f.is_finite())


@pytest.mark.heavy
def test_multigrid_fused_matches_jnp():
    """Fused wavefront RB sweeps (lane-padded, red+black+residual in one
    pass) converge iteration-for-iteration with the jnp V-cycle and land
    on the same solution (Gauss-Seidel affinity makes smoothing the
    iterate identical to smoothing the zero-initialized correction)."""
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.multigrid import make_multigrid

    n = 33
    h, rhs = system(n, nz=n)
    rhs = jnp.asarray(rhs, jnp.float32)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    x0 = jnp.zeros((n, n, n), jnp.float32)

    ref = make_multigrid(prob, pp, use_pallas=False)
    r_ref = ref(x0, rhs)
    fus = make_multigrid(prob, pp, use_pallas=True, pallas_interpret=True,
                         min_fused_nx=0)
    r_fus = fus(x0, rhs)

    assert int(r_ref.status) == int(r_fus.status) == 0
    assert int(r_fus.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(np.asarray(r_fus.x), np.asarray(r_ref.x),
                               atol=1e-5)


def test_multigrid_fused_build_keeps_f64_on_jnp_path():
    """use_pallas multigrid must not crash non-float32 solves: the fused
    sweeps are f32 kernels, so an f64 call takes the jnp body (trace-time
    dtype gate)."""
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.multigrid import make_multigrid

    n = 17
    h, rhs = system(n, nz=n)
    prob = PoissonProblem(n, n, n, h, h, h)
    fn = make_multigrid(prob, PoissonParams(tolerance=1e-6),
                        use_pallas=True, pallas_interpret=True,
                        min_fused_nx=0)
    r64 = fn(jnp.zeros((n, n, n)), jnp.asarray(rhs))   # f64 under x64
    assert r64.x.dtype == jnp.float64
    assert int(r64.status) == 0
    r32 = fn(jnp.zeros((n, n, n), jnp.float32),
             jnp.asarray(rhs, jnp.float32))
    assert int(r32.status) == 0
    np.testing.assert_allclose(np.asarray(r32.x), np.asarray(r64.x),
                               atol=1e-4)


@pytest.mark.heavy
def test_mg_cg_fused_matches_jnp():
    """The symmetric fused V-cycle preconditioner (black-first wavefront
    post sweeps) reproduces the jnp MG-CG iteration-for-iteration."""
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.multigrid import make_mg_cg

    n = 33
    h, rhs = system(n, nz=n)
    rhs = jnp.asarray(rhs, jnp.float32)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    x0 = jnp.zeros((n, n, n), jnp.float32)

    ref = make_mg_cg(prob, pp, use_pallas=False)
    r_ref = ref(x0, rhs)
    fus = make_mg_cg(prob, pp, use_pallas=True, pallas_interpret=True,
                     min_fused_nx=0)
    r_fus = fus(x0, rhs)

    assert int(r_ref.status) == int(r_fus.status) == 0
    assert int(r_fus.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(np.asarray(r_fus.x), np.asarray(r_ref.x),
                               atol=1e-5)
