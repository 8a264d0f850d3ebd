"""Poisson solver suite tests.

Mirrors tests/math/test_poisson*.c, test_pcg_convergence.c, test_bicgstab.c,
test_sor_omega.c: manufactured solutions 2D/3D, per-method convergence,
cross-method consistency, auto-optimal omega, residual computation.

Two solution families, matching the reference semantics exactly:

* stationary methods (Jacobi/SOR/RB-SOR) apply the mirrored-Neumann BC after
  every sweep → they solve the discrete Neumann problem (boundary error is
  O(h), the reference's own "BC-limited" caveat in test_convergence_order.c);
* Krylov methods (CG/BiCGSTAB) iterate in a zero-Dirichlet correction space
  (work vectors never touch the boundary — `linear_solver_cg.c:103-123`), so
  with a zero initial guess they produce the Dirichlet-0 interior solution.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from cfd_tpu.solvers.poisson import (Method, PoissonParams, PoissonProblem,
                                     PoissonStatus, Precond, SolverPreset,
                                     create_solver, poisson_solve)


def neumann_problem_2d(n=33):
    """∇²p = rhs with p = cos(pi x) cos(pi y) (zero normal derivative)."""
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x)
    p_exact = np.cos(np.pi * X) * np.cos(np.pi * Y)
    rhs = -2 * np.pi ** 2 * p_exact
    return p_exact[None], rhs[None], x[1] - x[0]


def dirichlet_problem_2d(n=33):
    """∇²p = rhs with p = sin(pi x) sin(pi y) (zero on the boundary)."""
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x)
    p_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rhs = -2 * np.pi ** 2 * p_exact
    return p_exact[None], rhs[None], x[1] - x[0]


def solve_with(method, n, problem_fn, params=None):
    p_exact, rhs, h = problem_fn(n)
    params = params or PoissonParams()
    solver = create_solver(method)
    solver.init(n, n, 1, h, h, 0.0, params)
    p_sol, stats = solver.solve(jnp.zeros_like(jnp.asarray(rhs)),
                                jnp.asarray(rhs))
    return np.asarray(p_sol), p_exact, stats


# ---- stationary family (Neumann fixed point) --------------------------------


@pytest.mark.parametrize("method,params", [
    (Method.JACOBI, PoissonParams(max_iterations=30000, check_interval=10)),
    (Method.REDBLACK_SOR, PoissonParams()),
    (Method.SOR, PoissonParams()),
])
def test_stationary_converges_neumann(method, params):
    p_sol, p_exact, stats = solve_with(method, 33, neumann_problem_2d, params)
    assert stats.status == PoissonStatus.CONVERGED, (method, stats)
    diff = p_sol - p_exact
    diff -= diff.mean()
    # Mirror-Neumann BC is O(h) at the boundary: loose absolute bound,
    # tightened by the refinement test below.
    assert np.max(np.abs(diff)) < 0.25, (method, np.max(np.abs(diff)))


def test_stationary_error_shrinks_with_refinement():
    errs = []
    for n in (17, 33):
        p_sol, p_exact, stats = solve_with(Method.REDBLACK_SOR, n,
                                           neumann_problem_2d)
        assert stats.status == PoissonStatus.CONVERGED
        diff = p_sol - p_exact
        diff -= diff.mean()
        errs.append(np.max(np.abs(diff)))
    assert errs[1] < 0.7 * errs[0]


def test_stationary_cross_method_consistency():
    """Jacobi / RB-SOR / SOR share a fixed point (cross-backend consistency
    strategy of test_omp_consistency.c, adapted cross-method)."""
    sols = {}
    params = PoissonParams(max_iterations=60000, tolerance=1e-9,
                           check_interval=10)
    for method in (Method.JACOBI, Method.REDBLACK_SOR, Method.SOR):
        p_sol, _, stats = solve_with(method, 17, neumann_problem_2d, params)
        assert stats.status == PoissonStatus.CONVERGED, method
        sols[method] = p_sol - p_sol.mean()
    ref = sols[Method.REDBLACK_SOR]
    for method, a in sols.items():
        np.testing.assert_allclose(a, ref, atol=2e-5, err_msg=str(method))


def test_check_interval_semantics():
    """check_interval skips residual *work*, not just the decision
    (`poisson_solver.h:105`): convergence is detected on the first check at
    or after the ci=1 iteration count, so counts agree within one interval
    and are multiples of it."""
    it1 = solve_with(Method.REDBLACK_SOR, 33, neumann_problem_2d,
                     PoissonParams(check_interval=1))[2].iterations
    sol10, _, stats10 = solve_with(
        Method.REDBLACK_SOR, 33, neumann_problem_2d,
        PoissonParams(check_interval=10))
    assert stats10.status == PoissonStatus.CONVERGED
    assert stats10.iterations % 10 == 0
    assert it1 <= stats10.iterations < it1 + 10
    sol1 = solve_with(Method.REDBLACK_SOR, 33, neumann_problem_2d,
                      PoissonParams(check_interval=1))[0]
    np.testing.assert_allclose(sol10 - sol10.mean(), sol1 - sol1.mean(),
                               atol=1e-6)


def test_redblack_faster_than_jacobi():
    params = PoissonParams(max_iterations=30000, check_interval=10)
    _, _, stats_j = solve_with(Method.JACOBI, 33, neumann_problem_2d, params)
    _, _, stats_rb = solve_with(Method.REDBLACK_SOR, 33, neumann_problem_2d)
    # Reference ballpark: Jacobi ~8000 iters vs RB-SOR ~2000 on 100².
    assert stats_rb.iterations < 0.5 * stats_j.iterations


# ---- Krylov family (Dirichlet-0 correction space) ----------------------------


@pytest.mark.parametrize("method,params,max_iters", [
    (Method.CG, PoissonParams(), 120),
    (Method.CG, PoissonParams(preconditioner=Precond.JACOBI), 120),
    (Method.BICGSTAB, PoissonParams(), 120),
])
def test_krylov_converges_dirichlet(method, params, max_iters):
    p_sol, p_exact, stats = solve_with(method, 33, dirichlet_problem_2d,
                                       params)
    assert stats.status == PoissonStatus.CONVERGED, (method, stats)
    # Reference ballpark on 100²: CG ~80, BiCGSTAB ~40 iterations.
    assert stats.iterations < max_iters, (method, stats.iterations)
    # Interior matches the exact Dirichlet solution to discretization error;
    # the final Neumann mirror only rewrites the boundary ring.
    err = np.abs(p_sol[:, 1:-1, 1:-1] - p_exact[:, 1:-1, 1:-1]).max()
    assert err < 5e-3, (method, err)


def test_krylov_cross_method_consistency():
    params = PoissonParams(tolerance=1e-10)
    a, _, sa = solve_with(Method.CG, 25, dirichlet_problem_2d, params)
    b, _, sb = solve_with(Method.BICGSTAB, 25, dirichlet_problem_2d, params)
    assert sa.status == sb.status == PoissonStatus.CONVERGED
    np.testing.assert_allclose(a[:, 1:-1, 1:-1], b[:, 1:-1, 1:-1], atol=1e-8)


def test_bicgstab_converges_in_fewer_iterations_than_cg():
    # A localized source excites many modes (sin·sin alone is an eigenvector
    # and converges in ONE Krylov iteration).
    n = 33
    h = 1.0 / (n - 1)
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.normal(size=(1, n, n)))

    def run(method):
        s = create_solver(method)
        s.init(n, n, 1, h, h, 0.0)
        _, stats = s.solve(jnp.zeros((1, n, n)), rhs)
        assert stats.status == PoissonStatus.CONVERGED, (method, stats)
        return stats

    s_cg = run(Method.CG)
    s_bi = run(Method.BICGSTAB)
    # BiCGSTAB does 2 matvecs/iter; reference table shows ~half the iters.
    assert s_bi.iterations < s_cg.iterations
    # and CG iteration count is in the reference's ballpark (~80 on 100²)
    assert 10 < s_cg.iterations < 200


def test_3d_manufactured_cg():
    n = 17
    x = np.linspace(0, 1, n)
    X, Y, Z = x[None, None, :], x[None, :, None], x[:, None, None]
    p_exact = np.broadcast_to(np.sin(np.pi * X) * np.sin(np.pi * Y)
                              * np.sin(np.pi * Z), (n, n, n))
    rhs = -3 * np.pi ** 2 * p_exact
    h = x[1] - x[0]
    s = create_solver(Method.CG)
    s.init(n, n, n, h, h, h, PoissonParams(tolerance=1e-9,
                                           max_iterations=2000))
    p, stats = s.solve(jnp.zeros((n, n, n)), jnp.asarray(rhs))
    assert stats.status == PoissonStatus.CONVERGED
    err = np.abs(np.asarray(p)[1:-1, 1:-1, 1:-1]
                 - p_exact[1:-1, 1:-1, 1:-1]).max()
    assert err < 2e-2, err


# ---- shared machinery --------------------------------------------------------


def test_optimal_omega_formula():
    """omega = 2/(1+sqrt(1-rho_J^2)) (`linear_solver_internal.h:184-203`)."""
    prob = PoissonProblem(33, 33, 1, 0.1, 0.1, 0.0)
    rho_j = np.cos(np.pi / 32)
    expected = 2.0 / (1.0 + np.sqrt(1.0 - rho_j ** 2))
    np.testing.assert_allclose(prob.optimal_omega(), expected, rtol=1e-12)
    assert prob.resolve_omega(1.5) == 1.5
    prob3 = PoissonProblem(17, 17, 17, 0.1, 0.1, 0.1)
    assert 1.0 < prob3.optimal_omega() < 2.0


def test_residual_computation():
    prob = PoissonProblem(9, 9, 1, 0.125, 0.125, 0.0)
    x = jnp.zeros((1, 9, 9))
    rhs = jnp.ones((1, 9, 9)) * 3.0
    assert float(prob.residual_inf(x, jnp.zeros_like(rhs))) == 0.0
    np.testing.assert_allclose(float(prob.residual_inf(x, rhs)), 3.0)


def test_already_converged_returns_zero_iterations():
    n = 9
    h = 1.0 / (n - 1)
    s = create_solver(Method.CG)
    s.init(n, n, 1, h, h, 0.0)
    _, stats = s.solve(jnp.zeros((1, n, n)), jnp.zeros((1, n, n)))
    assert stats.iterations == 0
    assert stats.status == PoissonStatus.CONVERGED


def test_max_iter_reports_nonconvergence():
    _, rhs, h = neumann_problem_2d(33)
    s = create_solver(Method.JACOBI)
    s.init(33, 33, 1, h, h, 0.0, PoissonParams(max_iterations=3,
                                               tolerance=1e-14,
                                               absolute_tolerance=1e-16))
    _, stats = s.solve(jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs))
    assert stats.status == PoissonStatus.MAX_ITER
    assert stats.iterations == 3


def test_convenience_api_cached():
    _, rhs, h = dirichlet_problem_2d(17)
    p0 = jnp.zeros_like(jnp.asarray(rhs))
    p1, iters1 = poisson_solve(p0, jnp.asarray(rhs), 17, 17, h, h,
                               SolverPreset.CG_SCALAR)
    assert iters1 > 0
    p2, iters2 = poisson_solve(p0, jnp.asarray(rhs), 17, 17, h, h,
                               SolverPreset.CG_SCALAR)
    assert iters2 == iters1


def test_sor_matches_reference_gauss_seidel_order():
    """The associative-scan SOR must equal a literal row-major C-order sweep."""
    rng = np.random.default_rng(0)
    n = 11
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, 1, h, h, 0.0)
    omega = prob.optimal_omega()
    x0 = rng.normal(size=(1, n, n))
    rhs = rng.normal(size=(1, n, n))

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
    solver_fn = make_sor(prob, dataclasses.replace(
        PoissonParams(), max_iterations=1, tolerance=0.0,
        absolute_tolerance=0.0))
    res = solver_fn(jnp.asarray(x0), jnp.asarray(rhs))
    got = np.asarray(res.x)
    np.testing.assert_allclose(got[0, 1:-1, 1:-1], ref[0, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)


def test_sor_3d_matches_reference_order():
    """3D plane-by-plane SOR equals the literal C triple loop."""
    rng = np.random.default_rng(1)
    n = 7
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    omega = prob.optimal_omega()
    x0 = rng.normal(size=(n, n, n))
    rhs = rng.normal(size=(n, n, n))

    ref = x0.copy()
    inv_factor = prob.inv_factor
    ix2, iy2, iz2 = prob.inv_dx2, prob.inv_dy2, prob.inv_dz2
    for k in range(1, n - 1):
        for j in range(1, n - 1):
            for i in range(1, n - 1):
                gs = -(rhs[k, j, i]
                       - (ref[k, j, i + 1] + ref[k, j, i - 1]) * ix2
                       - (ref[k, j + 1, i] + ref[k, j - 1, i]) * iy2
                       - (ref[k + 1, j, i] + ref[k - 1, j, i]) * iz2) * inv_factor
                ref[k, j, i] += omega * (gs - ref[k, j, i])

    from cfd_tpu.solvers.poisson.stationary import make_sor
    solver_fn = make_sor(prob, dataclasses.replace(
        PoissonParams(), max_iterations=1, tolerance=0.0,
        absolute_tolerance=0.0))
    res = solver_fn(jnp.asarray(x0), jnp.asarray(rhs))
    got = np.asarray(res.x)
    np.testing.assert_allclose(got[1:-1, 1:-1, 1:-1], ref[1:-1, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)
