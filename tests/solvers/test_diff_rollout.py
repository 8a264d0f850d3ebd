"""Differentiable-rollout tests: Euler/RK gradients, traced physics
params (Boussinesq β), per-step dt schedules, and remat-policy agreement.

Extension component — the C reference is forward-only; no counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import (NSParams, make_euler_step,
                                make_projection_step, make_rk2_step,
                                make_rk4_step, make_rollout)
from cfd_tpu.solvers.poisson.base import Method, PoissonParams

TIGHT = PoissonParams(tolerance=1e-12, absolute_tolerance=1e-13,
                      max_iterations=4000)


def _grid():
    return Grid.uniform(17, 17, xmin=0, xmax=2 * np.pi,
                        ymin=0, ymax=2 * np.pi)


def _tg_field(grid, amp=0.3):
    X, Y, _ = grid.coordinate_arrays(jnp.float64)
    shape = (grid.nz, grid.ny, grid.nx)
    return FlowField.quiescent(grid.nx, grid.ny, grid.nz).replace(
        u=jnp.broadcast_to(amp * jnp.sin(X) * jnp.cos(Y), shape),
        v=jnp.broadcast_to(-amp * jnp.cos(X) * jnp.sin(Y), shape))


def _fd_check(loss, x, d, g, eps=1e-6, rtol=1e-4):
    fd = (float(loss(x + eps * d)) - float(loss(x - eps * d))) / (2 * eps)
    assert float(jnp.vdot(g, d)) == pytest.approx(fd, rel=rtol, abs=1e-9)


@pytest.mark.parametrize("maker", [make_euler_step, make_rk2_step,
                                   make_rk4_step])
def test_integrator_grad_wrt_initial_velocity(maker, rng):
    """Euler/RK jnp paths are differentiable as-is: grad of final kinetic
    energy w.r.t. the initial u matches finite differences."""
    grid = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = maker(grid, params, use_pallas=False)
    rollout = make_rollout(step, 3)
    field0 = _tg_field(grid)

    def loss(u0):
        f, _ = rollout(field0.replace(u=u0), 1e-4)
        return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2)

    g = jax.grad(loss)(field0.u)
    assert np.isfinite(np.asarray(g)).all()
    _fd_check(loss, field0.u, jnp.asarray(rng.standard_normal(g.shape)), g)


def test_grad_wrt_boussinesq_beta(rng):
    """Traced physics params through enablement gates: β is a tracer at
    build time (static_bool keeps the buoyancy term), and the gradient of
    a velocity loss w.r.t. β matches finite differences."""
    grid = _grid()
    ny, nx = grid.ny, grid.nx
    T0 = jnp.asarray(0.5 + 0.1 * rng.standard_normal((1, ny, nx)))
    field0 = _tg_field(grid).replace(T=T0)

    def loss(beta):
        params = NSParams(alpha=0.01, beta=beta, T_ref=0.5,
                          gravity=(0.0, -9.81, 0.0),
                          source_amplitude_u=0.0, source_amplitude_v=0.0)
        step = make_euler_step(grid, params, use_pallas=False)
        f, _ = make_rollout(step, 3)(field0, 1e-4)
        return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2)

    g = float(jax.grad(loss)(0.7))
    eps = 1e-5
    fd = (loss(0.7 + eps) - loss(0.7 - eps)) / (2 * eps)
    assert g == pytest.approx(float(fd), rel=1e-4)


def test_grad_wrt_dt_schedule(rng):
    """Per-step dt array: the schedule is itself optimizable."""
    grid = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_rk2_step(grid, params, use_pallas=False)
    rollout = make_rollout(step, 4)
    field0 = _tg_field(grid)
    dts = jnp.full((4,), 1e-3)

    def loss(dts):
        f, _ = rollout(field0, dts)
        return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2)

    g = jax.grad(loss)(dts)
    assert g.shape == (4,)
    # viscous decay: longer steps -> less kinetic energy
    assert np.all(np.asarray(g) < 0.0)
    _fd_check(loss, dts, jnp.asarray(rng.standard_normal((4,))), g, eps=1e-7)


@pytest.mark.parametrize("remat", ["step", "sqrt"])
def test_remat_policies_match_plain(remat):
    """Checkpointing changes the memory schedule, not the math: value and
    gradient agree with the store-everything rollout (n=7 exercises the
    sqrt policy's remainder tail)."""
    grid = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_projection_step(grid, params, poisson_method=Method.CG,
                                poisson_params=TIGHT, use_pallas=False,
                                differentiable=True)
    field0 = _tg_field(grid)

    def make_loss(policy):
        rollout = make_rollout(step, 7, remat=policy)

        def loss(u0):
            f, _ = rollout(field0.replace(u=u0), 0.01)
            return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2)

        return loss

    base, g_base = jax.value_and_grad(make_loss(None))(field0.u)
    val, g = jax.value_and_grad(make_loss(remat))(field0.u)
    np.testing.assert_allclose(float(val), float(base), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_base),
                               rtol=1e-10, atol=1e-12)


def test_rollout_results_and_final_status():
    grid = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_euler_step(grid, params, use_pallas=False)
    field0 = _tg_field(grid)

    f_all, results = make_rollout(step, 5, collect_results=True)(field0, 1e-4)
    assert results.status.shape == (5,)
    assert np.all(np.asarray(results.status) == 0)

    f_last, last = make_rollout(step, 5)(field0, 1e-4)
    assert last.status.shape == ()
    np.testing.assert_array_equal(np.asarray(f_all.u), np.asarray(f_last.u))
    assert float(last.max_velocity) == float(results.max_velocity[-1])


def test_rollout_start_iter_offsets_sources():
    """start_iter shifts the iteration index seen by time-dependent
    sources: rolling 4 then 4-more equals rolling 8."""
    grid = _grid()
    params = NSParams()  # default decaying sinusoidal sources are on
    step = make_euler_step(grid, params, use_pallas=False)
    field0 = _tg_field(grid)

    f8, _ = make_rollout(step, 8)(field0, 1e-4)
    f4, _ = make_rollout(step, 4)(field0, 1e-4)
    f44, _ = make_rollout(step, 4, start_iter=4)(f4, 1e-4)
    np.testing.assert_allclose(np.asarray(f44.u), np.asarray(f8.u),
                               rtol=0, atol=1e-15)


def test_rollout_validates_args():
    grid = _grid()
    step = make_euler_step(grid, NSParams(), use_pallas=False)
    with pytest.raises(ValueError):
        make_rollout(step, 3, remat="bogus")
    with pytest.raises(ValueError):
        make_rollout(step, 0)
