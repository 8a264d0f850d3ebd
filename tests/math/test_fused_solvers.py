"""Fused RB-SOR / BiCGSTAB Pallas solver consistency (interpret mode on CPU).

The reference backs Red-Black SOR and BiCGSTAB with dedicated GPU solvers
(`gpu/poisson_solver_redblack_sor_gpu.cu`, `gpu/poisson_solver_bicgstab_gpu.cu`);
here the fused rolling-plane kernels must reproduce the jnp reference
numerics: same sweeps, same iteration counts, same fixed points.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.ops.pallas.bicgstab_kernels import (BiCGSTABKernels,
                                                 bicgstab_kernels_supported)
from cfd_tpu.ops.pallas.rbsor_kernels import make_rbsor_sweep, rbsor_supported
from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                          PoissonProblem, PoissonStatus)
from cfd_tpu.solvers.poisson.frontend import create_solver
from cfd_tpu.solvers.poisson.krylov import make_bicgstab, make_bicgstab_fused
from cfd_tpu.solvers.poisson.stationary import (_checkerboard,
                                                make_redblack_sor,
                                                make_redblack_sor_fused)


def make_problem(nz=6, ny=16, nx=128, h=(0.1, 0.2, 0.15)):
    return PoissonProblem(nx=nx, ny=ny, nz=nz, dx=h[0], dy=h[1], dz=h[2])


def rand(problem, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=problem.shape).astype(np.float32))


def point_rhs(problem):
    rhs = jnp.zeros(problem.shape, jnp.float32)
    return rhs.at[problem.nz // 2, problem.ny // 2, 60].set(100.0) \
              .at[1, 2, 20].set(-40.0)


def jnp_rb_sweep(problem, x, rhs, omega):
    """One reference RB sweep + Neumann BC (the jnp solver's body)."""
    red = _checkerboard(problem, 0)
    black = _checkerboard(problem, 1)

    def half(x, mask):
        nb = ((jnp.roll(x, -1, -1) + jnp.roll(x, 1, -1)) * problem.inv_dx2
              + (jnp.roll(x, -1, -2) + jnp.roll(x, 1, -2)) * problem.inv_dy2
              + (jnp.roll(x, -1, -3) + jnp.roll(x, 1, -3)) * problem.inv_dz2)
        gs = -(rhs - nb) * problem.inv_factor
        return jnp.where(mask, x + omega * (gs - x), x)

    return problem.neumann_bc(half(half(x, red), black))


def test_rbsor_supported_shapes():
    assert rbsor_supported(512, 512, 512)
    assert rbsor_supported(3, 8, 128)
    assert not rbsor_supported(2, 8, 128)      # nz too small
    assert not rbsor_supported(6, 8, 100)      # lanes not 128-aligned
    assert not rbsor_supported(6, 12, 128)     # sublanes not 8-aligned


@pytest.mark.parametrize("nz", [3, 4, 6])
def test_rbsor_sweep_matches_jnp(nz):
    problem = make_problem(nz=nz, ny=8)
    omega = problem.resolve_omega(0.0)
    x = rand(problem, 0)
    rhs = rand(problem, 1)
    sweep = make_rbsor_sweep(nz, problem.ny, problem.nx, problem.inv_dx2,
                             problem.inv_dy2, problem.inv_dz2,
                             problem.inv_factor, omega, interpret=True)
    x_k, res_k = sweep(x, rhs)
    x_ref = jnp_rb_sweep(problem, x, rhs, omega)
    res_ref = problem.residual_inf(x_ref, rhs)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               atol=2e-6, rtol=1e-6)
    assert abs(float(res_k) - float(res_ref)) < 1e-3


def test_rbsor_solve_matches_jnp_exactly():
    """Same sweeps ⇒ same iterate: the fused solve must land on the jnp
    solver's iterate bit-for-bit up to f32 associativity (observed exact)."""
    problem = make_problem(h=(0.05, 0.05, 0.05))
    params = PoissonParams(tolerance=1e-4, max_iterations=400,
                           check_interval=5)
    rhs = point_rhs(problem)
    x0 = jnp.zeros(problem.shape, jnp.float32)
    r_jnp = make_redblack_sor(problem, params)(x0, rhs)
    r_fus = make_redblack_sor_fused(problem, params, interpret=True)(x0, rhs)
    assert int(r_fus.iterations) == int(r_jnp.iterations)
    assert int(r_fus.status) == int(r_jnp.status)
    np.testing.assert_allclose(np.asarray(r_fus.x), np.asarray(r_jnp.x),
                               atol=1e-6)
    np.testing.assert_allclose(float(r_fus.final_residual),
                               float(r_jnp.final_residual), rtol=1e-4)


def test_rbsor_already_converged():
    problem = make_problem()
    params = PoissonParams()
    solve = make_redblack_sor_fused(problem, params, interpret=True)
    zeros = jnp.zeros(problem.shape, jnp.float32)
    r = solve(zeros, zeros)
    assert int(r.iterations) == 0
    assert int(r.status) == int(PoissonStatus.CONVERGED)


def test_bicgstab_supported_shapes():
    assert bicgstab_kernels_supported(512, 512, 512)
    assert not bicgstab_kernels_supported(6, 8, 100)


def test_bicgstab_passes_match_jnp():
    problem = make_problem()
    k = BiCGSTABKernels(problem.nz, problem.ny, problem.nx, problem.inv_dx2,
                        problem.inv_dy2, problem.inv_dz2, interpret=True)
    assert k.ok
    r = problem.zero_boundary(rand(problem, 3))
    p = problem.zero_boundary(rand(problem, 4))
    v = problem.zero_boundary(rand(problem, 5))
    rhat = problem.zero_boundary(rand(problem, 6))
    beta, omega = 0.7, 0.3

    def A(q):
        return problem.zero_boundary(-problem.laplacian(q))

    def close(got, want, rel=1e-5):
        # roundoff-scale agreement: atol anchored to the field magnitude
        # (the Laplacian cancels ~1e4-scale terms, so near-zero entries
        # carry absolute error ~rel·max|want|).
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            atol=rel * float(jnp.max(jnp.abs(want))) + 1e-7)

    pn, vn, rhv = k.pass_pv(r, p, v, rhat, beta, omega)
    pn_ref = problem.zero_boundary(r + beta * (p - omega * v))
    vn_ref = A(pn_ref)
    close(pn, pn_ref)
    close(vn, vn_ref)
    ref = float(problem.dot_interior(rhat, vn_ref))
    assert abs(float(rhv) - ref) < 1e-4 * abs(ref) + 1.0

    alpha = 0.4
    s, t, ss, ts, tt = k.pass_st(r, vn, alpha)
    s_ref = problem.zero_boundary(r - alpha * vn)
    t_ref = A(s_ref)
    close(s, s_ref)
    close(t, t_ref)
    for got, want in ((ss, problem.dot_interior(s_ref, s_ref)),
                      (ts, problem.dot_interior(t_ref, s_ref)),
                      (tt, problem.dot_interior(t_ref, t_ref))):
        assert abs(float(got) - float(want)) < 1e-4 * abs(float(want)) + 1.0

    x = rand(problem, 7)
    x2, r2, rr, rhr = k.pass_xr(x, pn, s, t, rhat, alpha, omega)
    x2_ref = x + alpha * pn + omega * s
    r2_ref = s - omega * t
    close(x2, x2_ref)
    # r' shells are zero by construction; x keeps its caller shells.
    np.testing.assert_allclose(np.asarray(x2)[0], np.asarray(x)[0], atol=0)
    inter = (slice(1, -1),) * 3
    close(np.asarray(r2)[inter], np.asarray(r2_ref)[inter])


@pytest.mark.parametrize("check_interval", [1, 3])
def test_bicgstab_solve_matches_jnp(check_interval):
    problem = make_problem(h=(0.05, 0.05, 0.05))
    params = PoissonParams(tolerance=1e-5, max_iterations=300,
                           check_interval=check_interval)
    rhs = point_rhs(problem)
    x0 = jnp.zeros(problem.shape, jnp.float32)
    r_jnp = make_bicgstab(problem, params)(x0, rhs)
    r_fus = make_bicgstab_fused(problem, params, interpret=True)(x0, rhs)
    # BiCGSTAB iteration counts are roundoff-sensitive near tolerance (the
    # fused dots accumulate per-plane, jnp tree-reduces); both must converge
    # in the same ballpark, solutions must agree to the reference's
    # cross-backend bar (`test_cavity_backends.c:38-50` is 0.1%).
    assert abs(int(r_fus.iterations) - int(r_jnp.iterations)) <= 3
    assert int(r_fus.status) == int(r_jnp.status) == int(
        PoissonStatus.CONVERGED)
    scale = float(jnp.max(jnp.abs(r_jnp.x)))
    np.testing.assert_allclose(np.asarray(r_fus.x), np.asarray(r_jnp.x),
                               atol=1e-3 * scale)


def test_bicgstab_fused_nonzero_guess():
    problem = make_problem(h=(0.05, 0.05, 0.05))
    params = PoissonParams(tolerance=1e-5, max_iterations=300)
    rhs = point_rhs(problem)
    x0 = rand(problem, 11)
    r_jnp = make_bicgstab(problem, params)(x0, rhs)
    r_fus = make_bicgstab_fused(problem, params, interpret=True)(x0, rhs)
    assert abs(int(r_fus.iterations) - int(r_jnp.iterations)) <= 3
    assert int(r_fus.status) == int(PoissonStatus.CONVERGED)
    scale = float(jnp.max(jnp.abs(r_jnp.x)))
    np.testing.assert_allclose(np.asarray(r_fus.x), np.asarray(r_jnp.x),
                               atol=1e-3 * scale)


def test_frontend_dispatches_fused_by_dtype():
    """init(use_pallas=True) engages the fused path for f32 inputs (interpret
    mode off-TPU) and keeps the jnp path for f64 — the backend-consistency
    contract (`test_cavity_backends.c:38-50` analog)."""
    problem_dims = dict(nx=128, ny=16, nz=6, dx=0.05, dy=0.05, dz=0.05)
    # 1e-3 relative keeps the stationary method's iteration budget small.
    params = PoissonParams(tolerance=1e-3, max_iterations=2000)
    rhs32 = np.zeros((6, 16, 128), np.float32)
    rhs32[3, 8, 60] = 100.0

    for method in (Method.REDBLACK_SOR, Method.BICGSTAB, Method.CG):
        s = create_solver(method, params)
        s.init(**problem_dims, params=params, use_pallas=True)
        assert s._fused_fn is not None, method
        s_ref = create_solver(method, params)
        s_ref.init(**problem_dims, params=params, use_pallas=False)
        assert s_ref._fused_fn is None
        x32 = jnp.zeros((6, 16, 128), jnp.float32)
        out_f, st_f = s.solve(x32, jnp.asarray(rhs32))
        out_r, st_r = s_ref.solve(x32, jnp.asarray(rhs32))
        assert st_f.status == st_r.status == PoissonStatus.CONVERGED, method
        scale = float(jnp.max(jnp.abs(out_r))) or 1.0
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=5e-4 * scale)
        # f64 input → jnp path (fused is f32-only); must still solve.
        x64 = jnp.zeros((6, 16, 128), jnp.float64)
        out64, st64 = s.solve(x64, jnp.asarray(rhs32, jnp.float64))
        assert st64.status == PoissonStatus.CONVERGED


def test_fused_maker_absent_for_huge_2d_and_multigrid_precond():
    params = PoissonParams()
    s = create_solver(Method.REDBLACK_SOR, params)
    # 2D now has the VMEM whole-solve kernel...
    s.init(nx=128, ny=16, dx=0.05, dy=0.05, use_pallas=True)
    assert s._fused_fn is not None
    # ...but only while the plane fits the VMEM budget
    s_big = create_solver(Method.REDBLACK_SOR, params)
    s_big.init(nx=4096, ny=4096, dx=0.05, dy=0.05, use_pallas=True)
    assert s_big._fused_fn is None
    pcg_mg = dataclasses.replace(params, preconditioner=2)
    s2 = create_solver(Method.CG, pcg_mg)
    # multigrid-preconditioned CG: needs coarsenable dims; 129 = 2^7+1
    s2.init(nx=129, ny=17, nz=9, dx=0.05, dy=0.05, dz=0.05, params=pcg_mg,
            use_pallas=True)
    assert s2._fused_fn is None
