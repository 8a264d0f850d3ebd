"""NS integrator tests.

Mirrors tests/solvers/: quiescent stability, finite evolution, divergence
detection, RK temporal-order checks (cpu/test_solver_rk2.c), 3D behavior,
dt computation (test_cfl/compute_time_step behavior).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.core.status import Status
from cfd_tpu.solvers.ns import (NSParams, NSSolver, compute_dt,
                                make_momentum_rhs)


def make(method, nx=16, ny=12, nz=1, **params):
    g = Grid.uniform(nx, ny, nz, xmin=0, xmax=2, ymin=0, ymax=1,
                     zmin=0, zmax=1 if nz > 1 else 0)
    p = NSParams(**params)
    s = NSSolver(name=method, method=method)
    s.init(g, p)
    return g, p, s


@pytest.mark.parametrize("method", ["explicit_euler", "rk2", "rk4",
                                    "projection"])
def test_step_produces_finite_field(method):
    g, p, s = make(method)
    f = FlowField.initialize(g)
    f2, stats = s.step(f, 0.001)
    assert stats.status == Status.SUCCESS
    assert bool(f2.is_finite())
    # something actually changed
    assert not np.allclose(np.asarray(f2.u), np.asarray(f.u))


@pytest.mark.parametrize("method", ["explicit_euler", "projection"])
def test_quiescent_field_stays_quiescent(method):
    """Zero velocity + no sources must remain zero (the reference's
    quiescent-3D validation)."""
    g, p, s = make(method, source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.quiescent(g.nx, g.ny, g.nz)
    f2, stats = s.solve(f, 0.001)
    assert stats.status == Status.SUCCESS
    np.testing.assert_allclose(np.asarray(f2.u), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f2.v), 0.0, atol=1e-12)


@pytest.mark.nan_injection
def test_divergence_detection():
    """NaN in the field must be flagged as DIVERGED, and the iteration count
    reflects the early stop."""
    g, p, s = make("explicit_euler", max_iter=5)
    f = FlowField.initialize(g)
    f = f.replace(u=f.u.at[0, 5, 5].set(np.nan))
    f2, stats = s.solve(f, 0.001)
    assert stats.status == Status.ERROR_DIVERGED
    assert stats.iterations == 1


def test_3d_solvers_run():
    for method in ("explicit_euler", "rk2", "projection"):
        g, p, s = make(method, nx=8, ny=8, nz=8)
        f = FlowField.initialize(g)
        f2, stats = s.step(f, 0.001)
        assert stats.status == Status.SUCCESS, method
        assert bool(f2.is_finite()), method


def test_compute_dt_bounds_and_cfl():
    g = Grid.uniform(16, 16)
    p = NSParams()
    f = FlowField.initialize(g)
    dt = compute_dt(f, g, p)
    assert 1e-6 <= dt <= 0.01
    # CFL: dt ≈ cfl*dmin/max_speed with sound speed sqrt(gamma*p/rho)
    u = np.asarray(f.u)
    c = np.sqrt(1.4 * np.asarray(f.p) / np.asarray(f.rho))
    speed = np.sqrt(u ** 2 + np.asarray(f.v) ** 2) + c
    expected = 0.2 * (1.0 / 15) / speed.max()
    np.testing.assert_allclose(dt, np.clip(expected, 1e-6, 0.01), rtol=1e-6)


def test_compute_dt_thermal_constraint():
    g = Grid.uniform(16, 16)
    f = FlowField.quiescent(16, 16)
    slow = compute_dt(f, g, NSParams(alpha=0.0))
    fast_alpha = compute_dt(f, g, NSParams(alpha=100.0))
    assert fast_alpha <= slow


def test_euler_conservative_dt_cap():
    """Euler internally caps dt at 1e-4 — two different large dts give the
    same result (`solver_explicit_euler.c:389`)."""
    g, p, s = make("explicit_euler")
    f = FlowField.initialize(g)
    f1, _ = s.step(f, 0.01)
    f2, _ = s.step(f, 0.005)
    np.testing.assert_array_equal(np.asarray(f1.u), np.asarray(f2.u))


def test_rk2_temporal_order():
    """Halving dt must reduce the error ~4x for RK2 (O(dt²)).

    Strategy from cpu/test_solver_rk2.c: integrate to a fixed horizon with
    dt and dt/2; compare against a fine-dt reference.
    """
    g = Grid.uniform(17, 17, xmin=0, xmax=1, ymin=0, ymax=1)
    f0 = FlowField.initialize(g)
    horizon = 0.02

    def run(method, dt):
        steps = int(round(horizon / dt))
        p = NSParams(max_iter=steps, mu=0.02)
        s = NSSolver(name=method, method=method)
        s.init(g, p)
        f, stats = s.solve(f0, dt)
        assert stats.status == Status.SUCCESS
        return np.asarray(f.u)

    ref = run("rk2", horizon / 64)
    err1 = np.max(np.abs(run("rk2", horizon / 8) - ref))
    err2 = np.max(np.abs(run("rk2", horizon / 16) - ref))
    rate = np.log2(err1 / err2)
    assert rate > 1.6, rate


def test_rk4_more_accurate_than_rk2():
    g = Grid.uniform(17, 17)
    f0 = FlowField.initialize(g)
    dt, steps = 0.002, 10

    def run(method):
        p = NSParams(max_iter=steps, mu=0.02)
        s = NSSolver(name=method, method=method)
        s.init(g, p)
        f, _ = s.solve(f0, dt)
        return np.asarray(f.u)

    ref = None
    # fine reference with rk4
    p = NSParams(max_iter=steps * 16, mu=0.02)
    s = NSSolver(name="rk4", method="rk4")
    s.init(g, p)
    fref, _ = s.solve(f0, dt / 16)
    ref = np.asarray(fref.u)
    err2 = np.max(np.abs(run("rk2") - ref))
    err4 = np.max(np.abs(run("rk4") - ref))
    assert err4 < err2


def test_momentum_rhs_zero_on_boundary():
    g = Grid.uniform(10, 10)
    p = NSParams()
    import jax
    rhs = make_momentum_rhs(g, p, jnp.float64)
    f = FlowField.initialize(g)
    ru, rv, rw, rp = rhs(f.u, f.v, f.w, f.p, f.rho, f.T, 0, 0.001)
    np.testing.assert_array_equal(np.asarray(ru)[:, 0, :], 0.0)
    np.testing.assert_array_equal(np.asarray(ru)[:, :, -1], 0.0)
    np.testing.assert_array_equal(np.asarray(rp)[:, -1, :], 0.0)


def test_projection_reduces_divergence():
    """After a projection step the interior divergence must be small."""
    from cfd_tpu.ops import stencils
    g, p, s = make("projection", nx=33, ny=33,
                   source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.initialize(g)
    f2, stats = s.step(f, 0.005)
    assert stats.status == Status.SUCCESS
    div = stencils.divergence(f2.u, f2.v, None, 1 / (2 * g.dx0),
                              1 / (2 * g.dy0))
    div_int = np.asarray(div)[:, 1:-1, 1:-1]
    div0 = stencils.divergence(f.u, f.v, None, 1 / (2 * g.dx0),
                               1 / (2 * g.dy0))
    div0_int = np.asarray(div0)[:, 1:-1, 1:-1]
    assert np.abs(div_int).max() < 0.5 * np.abs(div0_int).max()
