"""Poisson solver suite tests.

Mirrors tests/math/test_poisson*.c, test_pcg_convergence.c, test_bicgstab.c,
test_sor_omega.c: manufactured solutions 2D/3D, per-method convergence,
cross-method consistency, auto-optimal omega, residual computation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd_tpu.solvers.poisson import (Method, PoissonParams, PoissonProblem,
                                     PoissonStatus, Precond, SolverPreset,
                                     create_solver, poisson_solve)


def manufactured_2d(n=33):
    """∇²p = rhs with p = cos(pi x) cos(pi y) (pure Neumann-compatible)."""
    x = np.linspace(0, 1, n)
    y = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, y)  # (ny, nx)
    p_exact = np.cos(np.pi * X) * np.cos(np.pi * Y)
    rhs = -2 * np.pi ** 2 * p_exact
    h = x[1] - x[0]
    return p_exact[None], rhs[None], h


def check_converges(method, n=33, tol_factor=50.0, params=None, max_iter=None):
    p_exact, rhs, h = manufactured_2d(n)
    params = params or PoissonParams()
    if max_iter is not None:
        import dataclasses
        params = dataclasses.replace(params, max_iterations=max_iter)
    solver = create_solver(method, params)
    solver.init(n, n, 1, h, h, 0.0, params if params else None)
    p0 = jnp.zeros_like(jnp.asarray(rhs))
    p_sol, stats = solver.solve(p0, jnp.asarray(rhs))
    assert stats.status == PoissonStatus.CONVERGED, (method, stats)
    # Residual actually small
    res = solver.compute_residual(p_sol, rhs)
    assert res < tol_factor * params.tolerance * stats.initial_residual + 1e-8
    # Solution matches exact up to a constant (pure Neumann nullspace)
    diff = np.asarray(p_sol) - p_exact
    diff -= diff.mean()
    assert np.max(np.abs(diff)) < 0.05, (method, np.max(np.abs(diff)))
    return stats


def test_jacobi_converges():
    stats = check_converges(Method.JACOBI, n=17,
                            params=PoissonParams(max_iterations=20000,
                                                 check_interval=10))
    assert stats.iterations > 50  # Jacobi is slow


def test_redblack_sor_converges():
    stats = check_converges(Method.REDBLACK_SOR)
    assert stats.iterations < 1500


def test_sor_converges():
    stats = check_converges(Method.SOR, n=17)
    assert stats.iterations < 1500


def test_cg_converges_fast():
    stats = check_converges(Method.CG)
    # Reference ballpark: ~80 iters on 100x100; on 33x33 should be << 200
    assert stats.iterations < 200


def test_pcg_converges():
    stats = check_converges(Method.CG,
                            params=PoissonParams(
                                preconditioner=Precond.JACOBI))
    assert stats.iterations < 200


def test_bicgstab_converges():
    stats = check_converges(Method.BICGSTAB)
    assert stats.iterations < 150


def test_cross_method_consistency():
    """All methods agree on the same system (the reference's
    test_omp_consistency strategy, adapted to cross-method)."""
    p_exact, rhs, h = manufactured_2d(25)
    sols = {}
    for method in (Method.JACOBI, Method.REDBLACK_SOR, Method.CG,
                   Method.BICGSTAB, Method.SOR):
        params = PoissonParams(max_iterations=30000, tolerance=1e-8)
        s = create_solver(method)
        s.init(25, 25, 1, h, h, 0.0, params)
        p, stats = s.solve(jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs))
        assert stats.status == PoissonStatus.CONVERGED, method
        a = np.asarray(p)
        sols[method] = a - a.mean()
    ref = sols[Method.CG]
    for method, a in sols.items():
        np.testing.assert_allclose(a, ref, atol=5e-4,
                                   err_msg=str(method))


def test_3d_manufactured():
    n = 17
    x = np.linspace(0, 1, n)
    X = x[None, None, :]
    Y = x[None, :, None]
    Z = x[:, None, None]
    p_exact = (np.cos(np.pi * X) * np.cos(np.pi * Y) * np.cos(np.pi * Z))
    rhs = -3 * np.pi ** 2 * p_exact
    h = x[1] - x[0]
    s = create_solver(Method.CG)
    s.init(n, n, n, h, h, h, PoissonParams(tolerance=1e-8,
                                           max_iterations=2000))
    p, stats = s.solve(jnp.zeros((n, n, n)), jnp.asarray(np.broadcast_to(
        rhs, (n, n, n))))
    assert stats.status == PoissonStatus.CONVERGED
    diff = np.asarray(p) - np.broadcast_to(p_exact, (n, n, n))
    diff -= diff.mean()
    assert np.max(np.abs(diff)) < 0.08


def test_optimal_omega_formula():
    """omega = 2/(1+sqrt(1-rho_J^2)) (`linear_solver_internal.h:184-203`)."""
    prob = PoissonProblem(33, 33, 1, 0.1, 0.1, 0.0)
    rho_j = np.cos(np.pi / 32)
    expected = 2.0 / (1.0 + np.sqrt(1.0 - rho_j ** 2))
    np.testing.assert_allclose(prob.optimal_omega(), expected, rtol=1e-12)
    # user-specified omega respected
    assert prob.resolve_omega(1.5) == 1.5
    # 3D includes z term
    prob3 = PoissonProblem(17, 17, 17, 0.1, 0.1, 0.1)
    assert 1.0 < prob3.optimal_omega() < 2.0


def test_residual_computation():
    """Zero field, zero rhs → zero residual; nonzero rhs → ||rhs||_inf."""
    prob = PoissonProblem(9, 9, 1, 0.125, 0.125, 0.0)
    x = jnp.zeros((1, 9, 9))
    rhs = jnp.ones((1, 9, 9)) * 3.0
    assert float(prob.residual_inf(x, jnp.zeros_like(rhs))) == 0.0
    np.testing.assert_allclose(float(prob.residual_inf(x, rhs)), 3.0)


def test_already_converged_returns_zero_iterations():
    prob_n = 9
    h = 1.0 / (prob_n - 1)
    s = create_solver(Method.CG)
    s.init(prob_n, prob_n, 1, h, h, 0.0)
    p, stats = s.solve(jnp.zeros((1, prob_n, prob_n)),
                       jnp.zeros((1, prob_n, prob_n)))
    assert stats.iterations == 0
    assert stats.status == PoissonStatus.CONVERGED


def test_max_iter_reports_nonconvergence():
    p_exact, rhs, h = manufactured_2d(33)
    s = create_solver(Method.JACOBI)
    s.init(33, 33, 1, h, h, 0.0, PoissonParams(max_iterations=3,
                                               tolerance=1e-14,
                                               absolute_tolerance=1e-16))
    _, stats = s.solve(jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs))
    assert stats.status == PoissonStatus.MAX_ITER
    assert stats.iterations == 3


def test_convenience_api_cached():
    p_exact, rhs, h = manufactured_2d(17)
    p0 = jnp.zeros_like(jnp.asarray(rhs))
    p1, iters1 = poisson_solve(p0, jnp.asarray(rhs), 17, 17, h, h,
                               SolverPreset.CG_SCALAR)
    assert iters1 > 0
    # Second call reuses the cached solver (same dims)
    p2, iters2 = poisson_solve(p0, jnp.asarray(rhs), 17, 17, h, h,
                               SolverPreset.CG_SCALAR)
    assert iters2 == iters1


def test_sor_matches_reference_gauss_seidel_order():
    """The associative-scan SOR must equal a literal row-major sweep."""
    rng = np.random.default_rng(0)
    n = 11
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, 1, h, h, 0.0)
    omega = prob.optimal_omega()
    x0 = rng.normal(size=(1, n, n))
    rhs = rng.normal(size=(1, n, n))

    # literal row-major SOR sweep (the C loop, `linear_solver_sor.c:100-119`)
    ref = x0.copy()
    inv_factor = prob.inv_factor
    inv_dx2, inv_dy2 = prob.inv_dx2, prob.inv_dy2
    for j in range(1, n - 1):
        for i in range(1, n - 1):
            gs = -(rhs[0, j, i]
                   - (ref[0, j, i + 1] + ref[0, j, i - 1]) * inv_dx2
                   - (ref[0, j + 1, i] + ref[0, j - 1, i]) * inv_dy2) * inv_factor
            ref[0, j, i] += omega * (gs - ref[0, j, i])

    from cfd_tpu.solvers.poisson.stationary import make_sor
    import dataclasses
    # Build solver with max 1 iteration and no BC application to isolate the
    # sweep: use the internal sweep through a single-iteration solve is hard;
    # instead rebuild the sweep closure directly.
    params = PoissonParams()
    solver_fn = make_sor(prob, dataclasses.replace(params, max_iterations=1,
                                                   tolerance=0.0,
                                                   absolute_tolerance=0.0))
    # One sweep then Neumann BC; compare interiors only.
    res = solver_fn(jnp.asarray(x0), jnp.asarray(rhs))
    got = np.asarray(res.x)
    np.testing.assert_allclose(got[0, 1:-1, 1:-1], ref[0, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)
