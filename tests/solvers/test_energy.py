"""Energy equation tests (mirrors tests/solvers/energy/test_energy_solver.c)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.core.status import CFDError, Status
from cfd_tpu.solvers.energy import (apply_thermal_bcs, compute_buoyancy,
                                    make_energy_step, validate_thermal_bc)
from cfd_tpu.solvers.ns import NSParams, NSSolver


def test_disabled_when_alpha_zero():
    g = Grid.uniform(8, 8)
    assert make_energy_step(g, 0.0) is None
    assert make_energy_step(g, -1.0) is None


def test_pure_diffusion_decays_peak():
    g = Grid.uniform(33, 33)
    step = make_energy_step(g, alpha=0.1)
    X = np.broadcast_to(np.asarray(g.x)[None, None, :], g.shape)
    Y = np.broadcast_to(np.asarray(g.y)[None, :, None], g.shape)
    T = jnp.asarray(300 + 10 * np.exp(-((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.01))
    zeros = jnp.zeros(g.shape)
    T1 = step(T, zeros, zeros, zeros, 1e-4, 0.0)
    assert float(T1.max()) < float(T.max())
    # total heat approximately conserved in the interior
    assert abs(float(T1[0, 1:-1, 1:-1].mean()) -
               float(T[0, 1:-1, 1:-1].mean())) < 0.01


def test_advection_moves_temperature():
    g = Grid.uniform(33, 33)
    step = make_energy_step(g, alpha=1e-8)
    X = np.broadcast_to(np.asarray(g.x)[None, None, :], g.shape)
    T = jnp.asarray(300 + 10 * np.exp(-((X - 0.3) ** 2) / 0.005))
    u = jnp.ones(g.shape)
    zeros = jnp.zeros(g.shape)
    T1 = T
    for i in range(50):
        T1 = step(T1, u, zeros, zeros, 1e-3, i * 1e-3)
    x_peak0 = np.asarray(g.x)[np.argmax(np.asarray(T)[0, 16, :])]
    x_peak1 = np.asarray(g.x)[np.argmax(np.asarray(T1)[0, 16, :])]
    assert x_peak1 > x_peak0 + 0.02  # moved downstream


def test_heat_source_callable():
    g = Grid.uniform(17, 17)

    def q(X, Y, Z, t):
        return 100.0 * jnp.ones_like(X + Y)

    step = make_energy_step(g, alpha=0.01, heat_source=q)
    T = jnp.full(g.shape, 300.0)
    zeros = jnp.zeros(g.shape)
    T1 = step(T, zeros, zeros, zeros, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(T1)[0, 1:-1, 1:-1], 300.1)


def test_nonuniform_grid_rejected():
    g = Grid.stretched(17, 17, beta=2.0)
    with pytest.raises(CFDError) as e:
        make_energy_step(g, alpha=0.1)
    assert e.value.status == Status.ERROR_UNSUPPORTED


def test_buoyancy():
    su, sv, sw = compute_buoyancy(jnp.asarray(310.0), beta=0.01, T_ref=300.0,
                                  gravity=(0.0, -9.81, 0.0))
    assert su == 0.0
    np.testing.assert_allclose(float(sv), 0.01 * 10 * 9.81)  # upward force
    # beta=0 disables
    assert compute_buoyancy(jnp.asarray(310.0), 0.0, 300.0, (0, -9.81, 0)) \
        == (0.0, 0.0, 0.0)


def test_thermal_bcs_faces():
    T = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 7)) + 300)
    cfg = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.PERIODIC, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=350.0, top=250.0))
    T2 = np.asarray(apply_thermal_bcs(T, cfg))
    np.testing.assert_allclose(T2[0, 1:-1, 0], 350.0)
    np.testing.assert_array_equal(T2[0, 1:-1, -1], T2[0, 1:-1, -2])
    np.testing.assert_allclose(T2[0, -1, :], 250.0)  # top wins corners
    # bottom periodic wraps from row ny-2 (applied after left/right)
    assert T2[0, 0, 3] == np.asarray(apply_thermal_bcs(T, cfg))[0, -2, 3]


def test_thermal_bc_validation():
    g = Grid.uniform(8, 8)
    with pytest.raises(CFDError):
        validate_thermal_bc(ThermalBCConfig(left=BCType.NOSLIP), g)


def test_solver_with_energy_and_buoyancy():
    """Full integration: heated-from-below convection starts moving fluid."""
    g = Grid.uniform(17, 17)
    params = NSParams(
        mu=0.01, alpha=0.01, beta=0.1, T_ref=300.0,
        gravity=(0.0, -9.81, 0.0),
        source_amplitude_u=0.0, source_amplitude_v=0.0,
        max_iter=20,
        thermal_bc=ThermalBCConfig(
            left=BCType.NEUMANN, right=BCType.NEUMANN,
            bottom=BCType.DIRICHLET, top=BCType.DIRICHLET,
            dirichlet_values=DirichletValues(bottom=310.0, top=290.0)))
    s = NSSolver(name="projection", method="projection")
    s.init(g, params)
    f = FlowField.quiescent(17, 17)
    f2, stats = s.solve(f, 1e-3)
    assert stats.status == Status.SUCCESS
    assert float(stats.max_temperature) > 300.0
    # buoyancy must have generated some motion
    assert float(jnp.abs(f2.v).max()) > 1e-8
