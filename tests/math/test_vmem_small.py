"""VMEM-resident whole-solve Red-Black SOR (small 2D grids) — interpret-mode
consistency vs the jnp reference path: identical iteration counts, statuses,
residuals, and iterates (the cross-backend consistency bar,
`test_omp_consistency.c:88`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                          PoissonProblem)
from cfd_tpu.solvers.poisson.stationary import (make_redblack_sor,
                                                make_redblack_sor_vmem)


def _problem(ny, nx):
    return PoissonProblem(nx, ny, 1, 1.0 / (nx - 1), 1.0 / (ny - 1), 0.0)


def _data(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    rhs = jnp.asarray(rng.normal(0, 1, (1, ny, nx)), jnp.float32)
    x0 = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32)
    return x0, rhs


def test_supported_shapes():
    from cfd_tpu.ops.pallas.vmem_small import vmem_solve_supported
    assert vmem_solve_supported(1, 100, 100)
    assert vmem_solve_supported(1, 33, 65)
    assert vmem_solve_supported(64, 64, 64)           # small 3D volumes too
    assert not vmem_solve_supported(2, 100, 100)      # degenerate nz
    assert not vmem_solve_supported(1, 4096, 4096)    # exceeds VMEM budget
    assert not vmem_solve_supported(256, 256, 256)


@pytest.mark.parametrize("ny,nx,ci", [(100, 100, 1), (100, 100, 10),
                                      (33, 65, 7)])
def test_vmem_matches_jnp_exactly(ny, nx, ci):
    prob = _problem(ny, nx)
    pp = PoissonParams(tolerance=1e-3, absolute_tolerance=1e-12,
                       max_iterations=300, check_interval=ci)
    ref = make_redblack_sor(prob, pp)
    vm = make_redblack_sor_vmem(prob, pp, dtype=jnp.float32, interpret=True)
    assert vm is not None
    x0, rhs = _data(ny, nx)
    r_ref = ref(x0, rhs)
    r_vm = jax.jit(vm)(x0, rhs)
    assert int(r_ref.iterations) == int(r_vm.iterations)
    assert int(r_ref.status) == int(r_vm.status)
    np.testing.assert_allclose(float(r_vm.initial_residual),
                               float(r_ref.initial_residual), rtol=1e-5)
    np.testing.assert_allclose(float(r_vm.final_residual),
                               float(r_ref.final_residual), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               rtol=2e-5, atol=2e-5)


def test_vmem_max_iter_status():
    prob = _problem(40, 40)
    pp = PoissonParams(tolerance=0.0, absolute_tolerance=0.0,
                       max_iterations=37, check_interval=5)
    vm = make_redblack_sor_vmem(prob, pp, dtype=jnp.float32, interpret=True)
    x0, rhs = _data(40, 40)
    r = jax.jit(vm)(x0, rhs)
    assert int(r.iterations) == 37   # final chunk clipped: 7×5 + 2
    assert int(r.status) == 1        # MAX_ITER


def test_vmem_already_converged():
    prob = _problem(32, 64)
    pp = PoissonParams(tolerance=1e-6, absolute_tolerance=1e-2,
                       max_iterations=100)
    vm = make_redblack_sor_vmem(prob, pp, dtype=jnp.float32, interpret=True)
    x0 = jnp.zeros((1, 32, 64), jnp.float32)
    rhs = jnp.full((1, 32, 64), 1e-5, jnp.float32)   # residual < abs_tol
    r = jax.jit(vm)(x0, rhs)
    assert int(r.iterations) == 0
    assert int(r.status) == 0
    np.testing.assert_allclose(float(r.final_residual),
                               float(r.initial_residual))


def test_frontend_dispatches_vmem_2d():
    """use_pallas=True on a small 2D problem routes f32 solves through the
    VMEM kernel and f64 through the jnp path."""
    from cfd_tpu.solvers.poisson.frontend import create_solver

    pp = PoissonParams(tolerance=1e-3, max_iterations=200)
    s = create_solver(Method.REDBLACK_SOR, pp)
    s.init(100, 100, 1, 1 / 99, 1 / 99, 0.0, use_pallas=True)
    assert s._fused_fn is not None
    x0, rhs = _data(100, 100)
    x_f, st_f = s.solve(x0, rhs)
    s2 = create_solver(Method.REDBLACK_SOR, pp)
    s2.init(100, 100, 1, 1 / 99, 1 / 99, 0.0, use_pallas=False)
    x_j, st_j = s2.solve(x0, rhs)
    assert st_f.iterations == st_j.iterations
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_j),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- Krylov

def test_vmem_cg_matches_jnp_exactly():
    """CG's trajectory is reduction-order-robust here: iteration counts and
    iterates match the jnp path."""
    from cfd_tpu.solvers.poisson.krylov import make_cg, make_cg_vmem

    prob = _problem(100, 100)
    pp = PoissonParams(tolerance=1e-5, max_iterations=1000)
    x0, rhs = _data(100, 100, seed=3)
    x0 = jnp.zeros_like(x0)
    r_ref = make_cg(prob, pp)(x0, rhs)
    r_vm = jax.jit(make_cg_vmem(prob, pp, dtype=jnp.float32,
                                interpret=True))(x0, rhs)
    assert int(r_ref.status) == int(r_vm.status) == 0
    assert abs(int(r_ref.iterations) - int(r_vm.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               atol=1e-5)


def test_vmem_pcg_jacobi_preconditioner():
    from cfd_tpu.solvers.poisson.base import Precond
    from cfd_tpu.solvers.poisson.krylov import make_cg, make_cg_vmem

    prob = _problem(64, 96)
    pp = PoissonParams(tolerance=1e-5, max_iterations=1000,
                       preconditioner=Precond.JACOBI)
    x0, rhs = _data(64, 96, seed=5)
    r_ref = make_cg(prob, pp)(x0, rhs)
    r_vm = jax.jit(make_cg_vmem(prob, pp, dtype=jnp.float32,
                                interpret=True))(x0, rhs)
    assert int(r_ref.status) == int(r_vm.status) == 0
    assert abs(int(r_ref.iterations) - int(r_vm.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               atol=1e-4)


def test_vmem_bicgstab_converges_to_same_solution():
    """BiCGSTAB's path is hypersensitive to fp reduction order (a pure
    dot-accumulation-order change shifts the f64 trajectory by ~1e-7), so
    iteration counts may differ; the contract is status + a solution whose
    TRUE residual meets the tolerance."""
    from cfd_tpu.solvers.poisson.krylov import (make_bicgstab,
                                                make_bicgstab_vmem)

    prob = _problem(100, 100)
    pp = PoissonParams(tolerance=1e-5, max_iterations=1000)
    x0, rhs = _data(100, 100, seed=3)
    x0 = jnp.zeros_like(x0)
    r_ref = make_bicgstab(prob, pp)(x0, rhs)
    r_vm = jax.jit(make_bicgstab_vmem(prob, pp, dtype=jnp.float32,
                                      interpret=True))(x0, rhs)
    assert int(r_ref.status) == int(r_vm.status) == 0
    assert 0 < int(r_vm.iterations) <= 2 * int(r_ref.iterations)
    # both meet the same L2 recursion tolerance; solutions agree at tol level
    tol = pp.tolerance * float(r_vm.initial_residual)
    assert float(r_vm.final_residual) < tol
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               atol=5e-4)


def test_frontend_dispatches_vmem_krylov_2d():
    for method in (Method.CG, Method.BICGSTAB):
        from cfd_tpu.solvers.poisson.frontend import create_solver
        pp = PoissonParams(tolerance=1e-4, max_iterations=500)
        s = create_solver(method, pp)
        s.init(100, 100, 1, 1 / 99, 1 / 99, 0.0, use_pallas=True)
        assert s._fused_fn is not None, method
        x0, rhs = _data(100, 100, seed=9)
        x, st = s.solve(jnp.zeros_like(x0), rhs)
        assert st.status.name == "CONVERGED"
        assert np.all(np.isfinite(np.asarray(x)))


def test_projection_2d_with_vmem_poisson_matches_jnp():
    """use_pallas 2D projection routes iterative Poisson through the VMEM
    whole-solve kernels and matches the jnp step (status + fields)."""
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step

    g = Grid.uniform(128, 64)
    pp = PoissonParams(tolerance=1e-4, max_iterations=600)
    for m in (Method.REDBLACK_SOR, Method.CG, Method.BICGSTAB):
        ref = jax.jit(make_projection_step(
            g, NSParams(), dtype=jnp.float32, poisson_method=m,
            poisson_params=pp))
        fus = jax.jit(make_projection_step(
            g, NSParams(), dtype=jnp.float32, poisson_method=m,
            poisson_params=pp, use_pallas=True, pallas_interpret=True))
        f = FlowField.initialize(g, dtype=jnp.float32)
        fr, rr = ref(f, 1e-3, 0)
        ff, rf = fus(f, 1e-3, 0)
        assert int(rr.status) == int(rf.status), m
        np.testing.assert_allclose(np.asarray(ff.u), np.asarray(fr.u),
                                   atol=1e-4, err_msg=str(m))


# ------------------------------------------------------------------- 3D

def _problem3(nz, ny, nx):
    return PoissonProblem(nx, ny, nz, 1.0 / (nx - 1), 1.0 / (ny - 1),
                          1.0 / (nz - 1))


@pytest.mark.parametrize("nz,ny,nx", [(16, 16, 16), (8, 20, 33)])
def test_vmem_rbsor_3d_matches_jnp(nz, ny, nx):
    """3D volume in VMEM (power-of-two pny row layout): identical iteration
    counts, statuses, and iterates vs the jnp 3D RB-SOR."""
    prob = _problem3(nz, ny, nx)
    pp = PoissonParams(tolerance=1e-3, absolute_tolerance=1e-12,
                       max_iterations=200, check_interval=4)
    ref = make_redblack_sor(prob, pp)
    vm = make_redblack_sor_vmem(prob, pp, dtype=jnp.float32, interpret=True)
    assert vm is not None
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.normal(0, 1, (nz, ny, nx)), jnp.float32)
    x0 = jnp.asarray(rng.normal(0, 0.1, (nz, ny, nx)), jnp.float32)
    r_ref = ref(x0, rhs)
    r_vm = jax.jit(vm)(x0, rhs)
    assert int(r_ref.iterations) == int(r_vm.iterations)
    assert int(r_ref.status) == int(r_vm.status)
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(r_vm.final_residual),
                               float(r_ref.final_residual), rtol=1e-3)


def test_vmem_cg_3d_matches_jnp():
    from cfd_tpu.solvers.poisson.krylov import make_cg, make_cg_vmem

    prob = _problem3(12, 16, 20)
    pp = PoissonParams(tolerance=1e-5, max_iterations=500)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.normal(0, 1, (12, 16, 20)), jnp.float32)
    x0 = jnp.zeros((12, 16, 20), jnp.float32)
    r_ref = make_cg(prob, pp)(x0, rhs)
    r_vm = jax.jit(make_cg_vmem(prob, pp, dtype=jnp.float32,
                                interpret=True))(x0, rhs)
    assert int(r_ref.status) == int(r_vm.status) == 0
    assert abs(int(r_ref.iterations) - int(r_vm.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               atol=1e-4)


def test_vmem_bicgstab_3d_converges():
    from cfd_tpu.solvers.poisson.krylov import (make_bicgstab,
                                                make_bicgstab_vmem)

    prob = _problem3(12, 16, 20)
    pp = PoissonParams(tolerance=1e-5, max_iterations=500)
    rng = np.random.default_rng(4)
    rhs = jnp.asarray(rng.normal(0, 1, (12, 16, 20)), jnp.float32)
    x0 = jnp.zeros((12, 16, 20), jnp.float32)
    r_ref = make_bicgstab(prob, pp)(x0, rhs)
    r_vm = jax.jit(make_bicgstab_vmem(prob, pp, dtype=jnp.float32,
                                      interpret=True))(x0, rhs)
    assert int(r_ref.status) == int(r_vm.status) == 0
    tol = pp.tolerance * float(r_vm.initial_residual)
    assert float(r_vm.final_residual) < tol
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               atol=5e-4)


def test_vmem_jacobi_matches_jnp_exactly():
    from cfd_tpu.solvers.poisson.stationary import (make_jacobi,
                                                    make_jacobi_vmem)

    for prob, shape in ((_problem(100, 100), (1, 100, 100)),
                        (_problem3(16, 16, 16), (16, 16, 16))):
        pp = PoissonParams(tolerance=1e-3, absolute_tolerance=1e-12,
                           max_iterations=400, check_interval=10)
        ref = make_jacobi(prob, pp)
        vm = make_jacobi_vmem(prob, pp, dtype=jnp.float32, interpret=True)
        assert vm is not None
        rng = np.random.default_rng(5)
        rhs = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        x0 = jnp.zeros(shape, jnp.float32)
        r_ref = ref(x0, rhs)
        r_vm = jax.jit(vm)(x0, rhs)
        assert int(r_ref.iterations) == int(r_vm.iterations), shape
        assert int(r_ref.status) == int(r_vm.status)
        np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                                   rtol=2e-5, atol=2e-5)


def test_frontend_dispatches_vmem_jacobi():
    from cfd_tpu.solvers.poisson.frontend import create_solver

    s = create_solver(Method.JACOBI, PoissonParams(tolerance=1e-3,
                                                   max_iterations=500))
    s.init(100, 100, 1, 1 / 99, 1 / 99, 0.0, use_pallas=True)
    assert s._fused_fn is not None
