"""Pallas kernel consistency tests (interpret mode on CPU).

The reference's cross-backend consistency strategy (SURVEY.md §4) maps to:
Pallas kernels vs the pure-jnp reference numerics.  The fused kernels must
agree with the jnp CG building blocks to float32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.ops.pallas.cg_kernels import (fused_kernels_available,
                                           make_cg_update,
                                           make_lap_dot_fused,
                                           make_lap_dot_rolling)
from cfd_tpu.solvers.poisson.base import PoissonParams, PoissonProblem
from cfd_tpu.solvers.poisson.krylov import make_cg, make_cg_fused


@pytest.fixture
def problem():
    n = 16
    h = 1.0 / (n - 1)
    return PoissonProblem(n, n, n, h, h, h)


def rand_fields(problem, seed=0, count=2):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=problem.shape).astype(np.float32))
            for _ in range(count)]


def test_fused_available_for_bench_shape():
    assert fused_kernels_available(512, 512, 512)
    assert not fused_kernels_available(2, 16, 16)  # nz too small


@pytest.mark.nan_shell
def test_lap_dot_windowed_matches_jnp(problem):
    r, p = rand_fields(problem)
    ld = make_lap_dot_fused(*problem.shape[::-1][::-1],
                            problem.inv_dx2, problem.inv_dy2,
                            problem.inv_dz2, 1.0, jnp.float32,
                            interpret=True)
    pn, ap, dot = ld(r, p, 0.5)
    rm = problem.zero_boundary(r)
    pm = problem.zero_boundary(p)
    pn_ref = problem.zero_boundary(rm + 0.5 * pm)
    ap_ref = problem.zero_boundary(-problem.laplacian(pn_ref))
    inter = (slice(1, -1),) * 3
    np.testing.assert_allclose(np.asarray(pn)[inter],
                               np.asarray(pn_ref)[inter], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ap)[inter],
                               np.asarray(ap_ref)[inter], rtol=1e-5,
                               atol=1e-2)
    ref_dot = float(problem.dot_interior(ap_ref, pn_ref))
    assert abs(float(dot) - ref_dot) < 1e-5 * abs(ref_dot) + 1.0


def test_lap_dot_rolling_matches_jnp():
    # rolling kernel needs nx % 128 == 0
    n = 8
    nx = 128
    h = 0.1
    problem = PoissonProblem(nx, n, n, h, h, h)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(n, n, nx)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(n, n, nx)).astype(np.float32))
    ld = make_lap_dot_rolling(n, n, nx, problem.inv_dx2, problem.inv_dy2,
                              problem.inv_dz2, 1.0, jnp.float32,
                              interpret=True)
    assert ld is not None
    pn, ap, dot = ld(r, p, 0.25)
    rm = problem.zero_boundary(r)
    pm = problem.zero_boundary(p)
    pn_ref = problem.zero_boundary(rm + 0.25 * pm)
    ap_ref = problem.zero_boundary(-problem.laplacian(pn_ref))
    np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref),
                               rtol=1e-4, atol=1e-2)


def test_cg_update_matches_jnp(problem):
    r, p, x, ap = rand_fields(problem, seed=2, count=4)
    upd = make_cg_update(*problem.shape, jnp.float32, interpret=True)
    pm = problem.zero_boundary(p)
    apm = problem.zero_boundary(ap)
    x2, r2, rr = upd(x, r, pm, apm, 0.7)
    np.testing.assert_allclose(np.asarray(x2),
                               np.asarray(x + 0.7 * pm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2),
                               np.asarray(r - 0.7 * apm), atol=1e-5)
    r2_ref = r - 0.7 * apm
    ref_rr = float(problem.dot_interior(r2_ref, r2_ref))
    assert abs(float(rr) - ref_rr) < 1e-5 * ref_rr + 1.0
    # x and r shells preserved bit-exactly
    np.testing.assert_array_equal(np.asarray(x2)[0], np.asarray(x)[0])
    np.testing.assert_array_equal(np.asarray(r2)[:, 0, :],
                                  np.asarray(r)[:, 0, :])


@pytest.mark.nan_shell
def test_fused_cg_solver_matches_jnp_cg(problem):
    """Full fused-CG solve vs jnp CG in interpret mode: same iteration count
    and matching solution."""
    params = PoissonParams(max_iterations=60)
    cg = make_cg(problem, params)
    cgf = make_cg_fused(problem, params, jnp.float32, interpret=True)
    assert cgf is not None
    rng = np.random.default_rng(3)
    rhs = problem.zero_boundary(
        jnp.asarray(rng.normal(size=problem.shape).astype(np.float32)))
    x0 = jnp.zeros(problem.shape, jnp.float32)
    ra = cg(x0, rhs)
    rb = cgf(x0, rhs)
    assert int(ra.status) == int(rb.status) == 0
    assert abs(int(ra.iterations) - int(rb.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(ra.x), np.asarray(rb.x),
                               rtol=1e-3, atol=1e-4)


def test_fused_spectral_projection_step_matches_jnp():
    """The fully fused projection step (Pallas predictor/btilde/corrector +
    DST pipeline, interpret mode) matches the jnp step with the same
    FFT_DIRECT pressure solve to f32 roundoff."""
    import numpy as np
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method

    grid = Grid.uniform(128, 16, 8, 0.0, 1.0, 0.0, 0.5, 0.0, 0.25)
    params = NSParams(mu=0.01)
    field = FlowField.initialize(grid, dtype=jnp.float32)

    fused = make_projection_step(grid, params, dtype=jnp.float32,
                                 poisson_method=Method.FFT_DIRECT,
                                 use_pallas_cg=True, pallas_interpret=True)
    plain = make_projection_step(grid, params, dtype=jnp.float32,
                                 poisson_method=Method.FFT_DIRECT)

    f1, r1 = fused(field, 1e-3, 0)
    f2, r2 = plain(field, 1e-3, 0)
    assert int(r1.status) == 0 and int(r2.status) == 0
    for attr in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(f1, attr)),
                                   np.asarray(getattr(f2, attr)),
                                   rtol=0, atol=2e-5)
