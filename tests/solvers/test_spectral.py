"""Direct spectral (DST-I) Poisson solver: exactness, fixed-point equality
with CG, frontend dispatch, and use inside the projection step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.core.status import CFDError
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                          PoissonProblem, PoissonStatus)
from cfd_tpu.solvers.poisson.frontend import create_solver
from cfd_tpu.solvers.poisson.krylov import make_cg
from cfd_tpu.solvers.poisson.spectral import make_fft_direct, \
    spectral_supported


def _random_problem(shape, dz, seed=1):
    nz, ny, nx = shape
    prob = PoissonProblem(nx, ny, nz, 0.03, 0.025, dz)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    rhs = prob.zero_boundary(jax.random.normal(k1, shape))
    x0 = jax.random.normal(k2, shape)
    return prob, x0, rhs


@pytest.mark.parametrize("shape,dz", [((1, 33, 41), 0.0), ((17, 21, 25), 0.04)])
def test_exact_one_shot(shape, dz):
    prob, x0, rhs = _random_problem(shape, dz)
    res = make_fft_direct(prob, PoissonParams())(x0, rhs)
    assert int(res.status) == PoissonStatus.CONVERGED
    assert int(res.iterations) == 1
    # Direct solve: ~machine-precision residual in one application
    # (scaled by the rhs norm; initial_residual is not a concept here).
    rhs_norm = float(jnp.sqrt(jnp.sum(rhs ** 2)))
    assert float(res.final_residual) < 1e-8 * rhs_norm


@pytest.mark.parametrize("shape,dz", [((1, 33, 41), 0.0), ((17, 21, 25), 0.04)])
def test_matches_cg_fixed_point(shape, dz):
    """Same Dirichlet-0 correction-space solution CG converges to."""
    prob, x0, rhs = _random_problem(shape, dz)
    cg = make_cg(prob, PoissonParams(tolerance=1e-14,
                                     absolute_tolerance=1e-14,
                                     max_iterations=20000))
    fft = make_fft_direct(prob, PoissonParams())
    xc = cg(x0, rhs).x
    xf = fft(x0, rhs).x
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xc),
                               rtol=0, atol=1e-7)


def test_frontend_dispatch():
    solver = create_solver(Method.FFT_DIRECT)
    _, x0, rhs = _random_problem((1, 17, 19), 0.0)
    solver.init(19, 17, 1, 0.03, 0.025, 0.0)
    x, stats = solver.solve(x0, rhs)
    assert stats.status == PoissonStatus.CONVERGED
    assert stats.iterations == 1
    assert stats.final_residual < 1e-5  # exact solve, random O(1) rhs


def test_unsupported_geometry_raises():
    # nz == 3 with dz == 0 is neither 2D nor a valid 3D problem.
    with pytest.raises(CFDError):
        create_solver(Method.FFT_DIRECT).init(9, 9, 3, 0.1, 0.1, 0.0) \
            .solve(jnp.zeros((3, 9, 9)), jnp.zeros((3, 9, 9)))
    assert not spectral_supported(PoissonProblem(9, 9, 3, 0.1, 0.1, 0.0))


def test_projection_step_with_fft():
    """Projection with the spectral pressure solve tracks the tight-CG step."""
    grid = Grid.uniform(33, 33)
    params = NSParams(mu=0.01, source_amplitude_u=0.0, source_amplitude_v=0.0)
    field = FlowField.initialize(grid)
    tight = PoissonParams(tolerance=1e-12, absolute_tolerance=1e-12,
                          max_iterations=20000)
    step_cg = make_projection_step(grid, params, poisson_params=tight)
    step_fft = make_projection_step(grid, params,
                                    poisson_method=Method.FFT_DIRECT)
    dt = 1e-3
    f_cg, r_cg = step_cg(field, dt, 0)
    f_fft, r_fft = step_fft(field, dt, 0)
    assert int(r_fft.status) == 0
    for attr in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(f_fft, attr)),
                                   np.asarray(getattr(f_cg, attr)),
                                   rtol=0, atol=1e-8)
