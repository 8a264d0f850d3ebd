"""Fused multi-chip multigrid (sharded wavefront sweeps + replicated
coarse levels) on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.parallel import make_mesh
from cfd_tpu.parallel.fused_mg import (make_multigrid_sharded,
                                       mg_fused_sharded_unsupported_reason)
from cfd_tpu.solvers.poisson.base import PoissonParams, PoissonProblem
from cfd_tpu.solvers.poisson.multigrid import make_multigrid


def _rhs(shape, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.normal(0.0, 1.0, shape)
    r[0] = r[-1] = 0.0
    r[:, 0] = r[:, -1] = 0.0
    r[:, :, 0] = r[:, :, -1] = 0.0
    return jnp.asarray(r, jnp.float32)


def test_unsupported_reasons():
    p = PoissonProblem(33, 33, 33, 1 / 32, 1 / 32, 1 / 32)
    assert mg_fused_sharded_unsupported_reason(p, 8) is None
    assert "float32" in mg_fused_sharded_unsupported_reason(
        p, 8, jnp.float64)
    p2 = PoissonProblem(33, 33, 1, 1 / 32, 1 / 32, 0.0)
    assert "3D" in mg_fused_sharded_unsupported_reason(p2, 8)
    p3 = PoissonProblem(34, 33, 34, 1 / 33, 1 / 32, 1 / 33)
    assert "coarsenable" in mg_fused_sharded_unsupported_reason(p3, 8)


@pytest.mark.heavy
def test_sharded_mg_matches_single_chip():
    """Same sweeps, transfers and coarse solves sharded vs one device:
    equal iteration counts, matching solutions."""
    n = 33
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    rhs = _rhs((n, n, n))
    x0 = jnp.zeros((n, n, n), jnp.float32)

    ref = jax.jit(make_multigrid(prob, pp, use_pallas=True,
                                 pallas_interpret=True, min_fused_nx=0))
    r_ref = ref(x0, rhs)

    mesh = make_mesh(axes=("z",))
    solve = jax.jit(make_multigrid_sharded(prob, pp, mesh))
    r_sh = solve(x0, rhs)

    assert int(r_sh.status) == int(r_ref.status) == 0
    assert int(r_sh.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(float(r_sh.initial_residual),
                               float(r_ref.initial_residual), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=1e-4)


@pytest.mark.heavy
def test_sharded_mg_warm_start_parity():
    """Non-zero initial guess: the sharded solve matches the single-chip
    solve from the same start (the correction-space convention freezes the
    warm start's mirror shell, so warm and cold land on slightly different
    fixed points — parity with the single-chip solver is the invariant)."""
    n = 17
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    rhs = _rhs((n, n, n), seed=3)
    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.normal(0, 1, (n, n, n)), jnp.float32)

    ref = jax.jit(make_multigrid(prob, pp, use_pallas=False))
    r_ref = ref(x1, rhs)
    mesh = make_mesh(axes=("z",))
    solve = jax.jit(make_multigrid_sharded(prob, pp, mesh))
    r_warm = solve(x1, rhs)
    assert int(r_warm.status) == int(r_ref.status) == 0
    assert int(r_warm.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(np.asarray(r_warm.x), np.asarray(r_ref.x),
                               atol=2e-4)


def _zy_mesh(pz, py):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:pz * py]).reshape(pz, py),
                ("z", "y"))


@pytest.mark.heavy
def test_zy_sharded_mg_matches_single_chip():
    """(z, y)-mesh fused multigrid — global-row wavefront sweeps whose
    4-row y halo keeps red/black/residual exact on owned rows, two-axis
    W-contraction restriction with one psum — keeps iteration parity with
    the single-chip fused V-cycle across mesh aspect ratios."""
    from cfd_tpu.solvers.poisson.multigrid import make_multigrid

    n = 33
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    rhs = _rhs((n, n, n), seed=2)
    x0 = jnp.zeros((n, n, n), jnp.float32)

    ref = jax.jit(make_multigrid(prob, pp, use_pallas=True,
                                 pallas_interpret=True, min_fused_nx=0))
    r_ref = ref(x0, rhs)

    for pz, py in ((2, 4), (4, 2), (2, 2)):
        solve = jax.jit(make_multigrid_sharded(prob, pp, _zy_mesh(pz, py)))
        r_sh = solve(x0, rhs)
        assert int(r_sh.status) == int(r_ref.status) == 0, (pz, py)
        assert int(r_sh.iterations) == int(r_ref.iterations), (pz, py)
        np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                                   atol=1e-4, err_msg=f"mesh ({pz},{py})")
        assert len(r_sh.x.sharding.device_set) == pz * py


@pytest.mark.heavy
def test_zy_sharded_mg_warm_start():
    """Warm starts (nonzero x0 with caller shells) survive the zy path."""
    from cfd_tpu.solvers.poisson.multigrid import make_multigrid

    n = 33
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    rhs = _rhs((n, n, n), seed=4)
    x1 = jnp.asarray(np.random.default_rng(11).normal(0, 1, (n, n, n)),
                     jnp.float32)

    ref = jax.jit(make_multigrid(prob, pp, use_pallas=True,
                                 pallas_interpret=True, min_fused_nx=0))
    r_ref = ref(x1, rhs)
    solve = jax.jit(make_multigrid_sharded(prob, pp, _zy_mesh(2, 4)))
    r_sh = solve(x1, rhs)
    assert int(r_sh.status) == int(r_ref.status) == 0
    assert int(r_sh.iterations) == int(r_ref.iterations)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=1e-4)
