"""Fused multi-chip CG pressure solve (shard_map ring halos + psum dots).

Validates the distributed twin of the two-pass fused CG on the 8-device
virtual CPU mesh: solution + iteration-count parity with the single-chip
fused CG and the jnp reference CG, and the CG-backed fused sharded
projection step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.parallel.fused_cg import (cg_fused_sharded_unsupported_reason,
                                       make_cg_fused_sharded)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                          PoissonProblem)
from cfd_tpu.solvers.poisson.krylov import make_cg, make_cg_fused


@pytest.fixture(scope="module")
def problem():
    return PoissonProblem(128, 16, 16, 1.0 / 127, 1.0 / 15, 1.0 / 15)


@pytest.fixture(scope="module")
def zmesh():
    return make_mesh(axes=("z",))


def _rhs(problem, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.normal(0.0, 1.0, problem.shape)
    r[0] = r[-1] = 0.0
    r[:, 0] = r[:, -1] = 0.0
    r[:, :, 0] = r[:, :, -1] = 0.0
    r -= r[1:-1, 1:-1, 1:-1].mean()
    return jnp.asarray(r, jnp.float32)


def test_supported(problem, zmesh):
    assert cg_fused_sharded_unsupported_reason(problem, 8) is None
    # 2D refusal
    p2 = PoissonProblem(128, 16, 1, 0.01, 0.01, 0.0)
    assert "3D" in cg_fused_sharded_unsupported_reason(p2, 8)
    # indivisible nz
    p3 = PoissonProblem(128, 16, 12, 0.01, 0.01, 0.01)
    assert "divisible" in cg_fused_sharded_unsupported_reason(p3, 8)


def test_matches_single_chip_fused(problem, zmesh):
    """Same rotated PCG recursion sharded vs one device: equal iteration
    counts, matching solutions."""
    params = PoissonParams(tolerance=1e-3, max_iterations=400)
    rhs = _rhs(problem)
    x0 = jnp.zeros(problem.shape, jnp.float32)

    ref = jax.jit(make_cg_fused(problem, params, interpret=True))
    r_ref = ref(x0, rhs)

    solve = jax.jit(make_cg_fused_sharded(problem, params, zmesh))
    r_sh = solve(x0, rhs)

    assert int(r_sh.status) == int(r_ref.status) == 0
    assert int(r_sh.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(float(r_sh.initial_residual),
                               float(r_ref.initial_residual), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=2e-5)
    assert len(r_sh.x.sharding.device_set) == 8


def test_matches_jnp_cg(problem, zmesh):
    """Fixed-budget run tracks the jnp reference CG."""
    params = PoissonParams(tolerance=0.0, absolute_tolerance=0.0,
                           max_iterations=30, check_interval=30)
    rhs = _rhs(problem, seed=3)
    x0 = jnp.zeros(problem.shape, jnp.float32)

    r_ref = jax.jit(make_cg(problem, params))(x0, rhs)
    r_sh = jax.jit(make_cg_fused_sharded(problem, params, zmesh))(x0, rhs)

    assert int(r_sh.iterations) == int(r_ref.iterations) == 30
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=2e-5)
    # caller shells preserved bit-exactly through the masked updates
    x1 = jnp.asarray(np.random.default_rng(9).normal(
        0, 1, problem.shape), jnp.float32)
    r2 = jax.jit(make_cg_fused_sharded(problem, params, zmesh))(x1, rhs)
    r2_ref = jax.jit(make_cg(problem, params))(x1, rhs)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r2_ref.x),
                               atol=5e-5)


def test_projection_with_sharded_cg(problem, zmesh):
    """Fused sharded projection with poisson_method=CG matches the
    single-device jnp projection step using the same CG settings."""
    grid = Grid.uniform(128, 16, 16, zmin=0.0, zmax=1.0)
    params = NSParams()
    # f32 CG stagnates near 1e-5 relative; 1e-3 converges in a few dozen
    # iterations on both paths.
    pp = PoissonParams(tolerance=1e-3, max_iterations=400)
    rng = np.random.default_rng(21)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32))

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32, poisson_method=Method.CG,
        poisson_params=pp))
    f_ref, rr = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32,
                                    poisson_method=Method.CG,
                                    poisson_params=pp)
    f_out, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=2e-3)


def test_nonstrict_cg_build_failure_falls_back(problem, zmesh):
    """A CG configuration the fused sharded solve can't take (multigrid
    preconditioner) must fall back to the GSPMD jnp path when not strict,
    not raise."""
    from cfd_tpu.solvers.poisson.base import Precond

    grid = Grid.uniform(128, 16, 16, zmin=0.0, zmax=1.0)
    pp = PoissonParams(tolerance=1e-3, max_iterations=200,
                       preconditioner=Precond.MULTIGRID)
    step, place = make_sharded_step(grid, NSParams(), zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32,
                                    poisson_method=Method.CG,
                                    poisson_params=pp)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    out, res = step(place(f), 0.001, 0)
    assert int(res.status) == 0


def _zy_mesh(pz, py):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:pz * py]).reshape(pz, py),
                ("z", "y"))


def test_zy_matches_single_chip_fused():
    """(z, y)-mesh fused CG — 4-row y-halo ring + owned-row-masked dots —
    keeps iteration-count parity with the single-chip fused CG."""
    problem = PoissonProblem(128, 32, 8, 1.0 / 127, 1.0 / 31, 1.0 / 7)
    params = PoissonParams(tolerance=1e-3, max_iterations=400)
    rhs = _rhs(problem, seed=5)
    x0 = jnp.zeros(problem.shape, jnp.float32)

    ref = jax.jit(make_cg_fused(problem, params, interpret=True))
    r_ref = ref(x0, rhs)

    for pz, py in ((2, 4), (4, 2), (2, 2)):
        solve = jax.jit(make_cg_fused_sharded(problem, params,
                                              _zy_mesh(pz, py)))
        r_sh = solve(x0, rhs)
        assert int(r_sh.status) == int(r_ref.status) == 0
        assert int(r_sh.iterations) == int(r_ref.iterations), (pz, py)
        np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                                   atol=2e-5, err_msg=f"mesh ({pz},{py})")


def test_zy_projection_with_sharded_cg():
    """Fused sharded zy projection with poisson_method=CG matches the
    single-device jnp projection step (CG pressure solve on both sides)."""
    g = Grid.uniform(128, 32, 8, zmin=0.0, zmax=1.0)
    params = NSParams()
    pparams = PoissonParams(tolerance=1e-6, max_iterations=800)
    rng = np.random.default_rng(21)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, .1, g.shape), jnp.float32))

    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.CG,
                                       poisson_params=pparams))
    fr, rr = ref(f, 1e-3, 0)

    step, place = make_sharded_step(g, params, _zy_mesh(2, 4),
                                    "projection", use_pallas=True,
                                    strict=True, dtype=jnp.float32,
                                    poisson_method=Method.CG,
                                    poisson_params=pparams)
    ff, rf = step(place(f), 1e-3, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(ff.p), np.asarray(fr.p),
                               atol=2e-4)
