"""VMEM-resident whole-solve 2D multigrid (`ops/pallas/vmem_mg.py`) —
interpret-mode consistency vs the jnp V-cycle (`make_multigrid`): same
V-cycle algorithm (the reference declares POISSON_METHOD_MULTIGRID but
never implements it, `linear_solver.c:236-238`), so iteration counts must
match up to MXU-matmul-vs-slice rounding and solutions to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                          PoissonProblem)
from cfd_tpu.solvers.poisson.multigrid import (_build_levels, make_multigrid,
                                               make_multigrid_vmem)


def _problem(ny, nx):
    return PoissonProblem(nx, ny, 1, 1.0 / (nx - 1), 1.0 / (ny - 1), 0.0)


def _data(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    rhs = jnp.asarray(rng.normal(0, 1, (1, ny, nx)), jnp.float32)
    x0 = jnp.asarray(rng.normal(0, 0.1, (1, ny, nx)), jnp.float32)
    return x0, rhs


def test_supported_shapes():
    from cfd_tpu.ops.pallas.vmem_mg import mg_vmem_supported
    assert mg_vmem_supported(_build_levels(_problem(65, 65)))
    assert mg_vmem_supported(_build_levels(_problem(33, 129)))
    # 3D hierarchies use the streaming mg_kernels path, not VMEM.
    assert not mg_vmem_supported(
        _build_levels(PoissonProblem(33, 33, 33, 0.1, 0.1, 0.1)))
    # Non-coarsenable grids never reach the kernel.
    assert _build_levels(_problem(34, 34)) is None


@pytest.mark.parametrize("ny,nx,ci", [(65, 65, 1), (33, 65, 2)])
def test_vmem_mg_matches_jnp(ny, nx, ci):
    prob = _problem(ny, nx)
    pp = PoissonParams(tolerance=1e-5, absolute_tolerance=1e-12,
                       max_iterations=50, check_interval=ci)
    ref = make_multigrid(prob, pp, use_pallas=False)
    vm = make_multigrid_vmem(prob, pp, interpret=True)
    assert vm is not None
    x0, rhs = _data(ny, nx)
    r_ref = ref(x0, rhs)
    r_vm = jax.jit(vm)(x0, rhs)
    # Same algorithm; matmul restriction/prolongation vs strided slices
    # reorders float adds, so allow one V-cycle of slack at the margin.
    assert abs(int(r_ref.iterations) - int(r_vm.iterations)) <= 1
    assert int(r_ref.status) == int(r_vm.status) == 0
    np.testing.assert_allclose(float(r_vm.initial_residual),
                               float(r_ref.initial_residual), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_vm.x), np.asarray(r_ref.x),
                               rtol=5e-4, atol=5e-5)
    # Same operator residual as the jnp path (a random rhs is incompatible
    # for the pure-Neumann problem, so the absolute value stays O(mean·A)
    # — both paths must land on the same fixed point regardless).
    np.testing.assert_allclose(float(prob.residual_inf(r_vm.x, rhs)),
                               float(prob.residual_inf(r_ref.x, rhs)),
                               rtol=1e-3)


def test_vmem_mg_max_iter_status():
    prob = _problem(33, 33)
    pp = PoissonParams(tolerance=0.0, absolute_tolerance=0.0,
                       max_iterations=7, check_interval=3)
    vm = make_multigrid_vmem(prob, pp, interpret=True)
    x0, rhs = _data(33, 33)
    r = jax.jit(vm)(x0, rhs)
    assert int(r.iterations) == 7
    assert int(r.status) == 1        # MAX_ITER


def test_vmem_mg_already_converged():
    prob = _problem(33, 33)
    pp = PoissonParams(tolerance=1e-6, absolute_tolerance=1e-2,
                       max_iterations=50)
    vm = make_multigrid_vmem(prob, pp, interpret=True)
    x0 = jnp.zeros((1, 33, 33), jnp.float32)
    rhs = jnp.full((1, 33, 33), 1e-5, jnp.float32)
    r = jax.jit(vm)(x0, rhs)
    assert int(r.iterations) == 0
    assert int(r.status) == 0


def test_frontend_dispatch_engages_vmem_mg():
    """use_pallas=True on a small coarsenable 2D grid must bind the VMEM
    whole-solve (interpret off-TPU) and produce the jnp solution."""
    from cfd_tpu.solvers.poisson.frontend import create_solver
    s = create_solver(Method.MULTIGRID,
                      PoissonParams(tolerance=1e-5, max_iterations=50))
    s.init(65, 65, 1, 1.0 / 64, 1.0 / 64, 0.0, use_pallas=True)
    assert s._fused_fn is not None
    x0, rhs = _data(65, 65)
    x, stats = s.solve(x0[0], rhs[0])
    assert stats.status == 0
    ref = create_solver(Method.MULTIGRID,
                        PoissonParams(tolerance=1e-5, max_iterations=50))
    ref.init(65, 65, 1, 1.0 / 64, 1.0 / 64, 0.0, use_pallas=False)
    x_ref, _ = ref.solve(x0[0], rhs[0])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-4, atol=5e-5)
