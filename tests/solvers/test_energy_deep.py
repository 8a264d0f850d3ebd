"""Quantitative energy-equation tests, mirroring the reference's
`tests/solvers/energy/test_energy_solver.c` (1055 LoC) depth: pointwise
RHS accuracy vs analytic advection/diffusion, 3D terms, heat-source time
dependence, thermal-BC corner ownership and periodic wrap indices, buoyancy
vector algebra, and energy-in-integrator coupling for every integrator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary.types import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.core.status import CFDError, Status
from cfd_tpu.solvers.energy import (apply_thermal_bcs, compute_buoyancy,
                                    make_energy_step, thermal_dt_limit,
                                    validate_thermal_bc)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

TWO_PI = 2.0 * np.pi


def _coords(g):
    X, Y, Z = g.coordinate_arrays()
    return np.asarray(X), np.asarray(Y), np.asarray(Z)


def test_energy_rhs_matches_analytic_advection_diffusion_2d():
    """One step from a smooth field: (T1−T0)/dt must equal
    −u·∇T + α∇²T pointwise in the interior to O(h²)."""
    n = 64
    g = Grid.uniform(n, n)
    alpha = 0.37
    step = make_energy_step(g, alpha)
    X, Y, _ = _coords(g)
    T0 = 300.0 + np.sin(TWO_PI * X) * np.cos(TWO_PI * Y)
    u = np.full_like(T0, 1.3)
    v = np.full_like(T0, -0.6)
    w = np.zeros_like(T0)
    dt = 1e-7  # tiny so time-discretization error is negligible

    T1 = np.asarray(step(jnp.asarray(T0), jnp.asarray(u), jnp.asarray(v),
                         jnp.asarray(w), dt, 0.0))
    rhs_num = (T1 - T0) / dt

    dTdx = TWO_PI * np.cos(TWO_PI * X) * np.cos(TWO_PI * Y)
    dTdy = -TWO_PI * np.sin(TWO_PI * X) * np.sin(TWO_PI * Y)
    lap = -2.0 * TWO_PI ** 2 * np.sin(TWO_PI * X) * np.cos(TWO_PI * Y)
    rhs_exact = -(u * dTdx + v * dTdy) + alpha * lap

    interior = (slice(None), slice(1, -1), slice(1, -1))
    h = 1.0 / (n - 1)
    err = np.max(np.abs(rhs_num[interior] - rhs_exact[interior]))
    assert err < 200.0 * h ** 2  # O(h²); constant ~(2π)⁴/12-scale
    # shells untouched (interior-only update)
    np.testing.assert_array_equal(T1[0, 0, :], T0[0, 0, :])
    np.testing.assert_array_equal(T1[0, :, -1], T0[0, :, -1])


def test_energy_rhs_matches_analytic_3d():
    n = 32
    g = Grid.uniform(n, n, n, zmin=0.0, zmax=1.0)
    alpha = 0.11
    step = make_energy_step(g, alpha)
    X, Y, Z = _coords(g)
    T0 = (300.0 + np.sin(TWO_PI * X) + np.cos(TWO_PI * Y)
          + np.sin(TWO_PI * Z))
    u = np.full_like(T0, 0.7)
    v = np.full_like(T0, -0.2)
    w = np.full_like(T0, 0.5)
    dt = 1e-7

    T1 = np.asarray(step(jnp.asarray(T0), jnp.asarray(u), jnp.asarray(v),
                         jnp.asarray(w), dt, 0.0))
    rhs_num = (T1 - T0) / dt

    dTdx = TWO_PI * np.cos(TWO_PI * X) * np.ones_like(T0)
    dTdy = -TWO_PI * np.sin(TWO_PI * Y) * np.ones_like(T0)
    dTdz = TWO_PI * np.cos(TWO_PI * Z) * np.ones_like(T0)
    lap = -TWO_PI ** 2 * (np.sin(TWO_PI * X) + np.cos(TWO_PI * Y)
                          + np.sin(TWO_PI * Z))
    rhs_exact = -(u * dTdx + v * dTdy + w * dTdz) + alpha * lap

    interior = (slice(1, -1), slice(1, -1), slice(1, -1))
    h = 1.0 / (n - 1)
    err = np.max(np.abs(rhs_num[interior] - rhs_exact[interior]))
    assert err < 200.0 * h ** 2


def test_heat_source_receives_time_and_coords():
    """Q(x,y,z,t) contributes exactly dt·Q; the time argument is threaded."""
    n = 16
    g = Grid.uniform(n, n)

    def q(X, Y, Z, t):
        return X + 10.0 * Y + 100.0 * t

    step = make_energy_step(g, alpha=1e-12, heat_source=q)
    T0 = jnp.full(g.shape, 300.0)
    zeros = jnp.zeros(g.shape)
    dt, t = 0.25, 2.0
    T1 = np.asarray(step(T0, zeros, zeros, zeros, dt, t))
    X, Y, _ = _coords(g)
    expected = 300.0 + dt * (X + 10.0 * Y + 100.0 * t)
    interior = (slice(None), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(T1[interior], expected[interior], rtol=1e-6)


def test_thermal_bc_corner_ownership_2d():
    """Sequential face order L,R,B,T: corners belong to the LAST face
    applied (top/bottom beat left/right) — `energy_solver.c:246-331`."""
    cfg = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.DIRICHLET, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=1.0, right=2.0,
                                         bottom=3.0, top=4.0))
    T = jnp.zeros((1, 8, 8))
    T = apply_thermal_bcs(T, cfg)
    T = np.asarray(T)
    assert T[0, 0, 0] == 3.0 and T[0, 0, -1] == 3.0      # bottom wins corners
    assert T[0, -1, 0] == 4.0 and T[0, -1, -1] == 4.0    # top wins corners
    assert T[0, 4, 0] == 1.0 and T[0, 4, -1] == 2.0      # face interiors


def test_thermal_bc_corner_ownership_3d_front_last():
    cfg = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.DIRICHLET, top=BCType.DIRICHLET,
        back=BCType.DIRICHLET, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=1.0, right=2.0, bottom=3.0,
                                         top=4.0, back=5.0, front=6.0))
    T = np.asarray(apply_thermal_bcs(jnp.zeros((6, 8, 8)), cfg))
    # z faces are applied last → they own every edge/corner they touch
    assert T[0, 0, 0] == 5.0 and T[0, -1, -1] == 5.0
    assert T[-1, 0, 0] == 6.0 and T[-1, -1, -1] == 6.0
    # interior of y-top face still owned by top
    assert T[3, -1, 4] == 4.0


def test_thermal_bc_periodic_wrap_indices():
    """PERIODIC copies the opposite INTERIOR plane (index 1 / −2)."""
    cfg = ThermalBCConfig(left=BCType.PERIODIC, right=BCType.PERIODIC,
                          bottom=BCType.NEUMANN, top=BCType.NEUMANN)
    T0 = jnp.arange(8 * 8, dtype=jnp.float64).reshape(1, 8, 8)
    T = np.asarray(apply_thermal_bcs(T0, cfg))
    T0 = np.asarray(T0)
    np.testing.assert_array_equal(T[0, 1:-1, 0], T0[0, 1:-1, -2])
    np.testing.assert_array_equal(T[0, 1:-1, -1], T0[0, 1:-1, 1])
    # Neumann zero-gradient copies the adjacent interior row
    np.testing.assert_array_equal(T[0, 0, :], T[0, 1, :])
    np.testing.assert_array_equal(T[0, -1, :], T[0, -2, :])


def test_validate_thermal_bc_rejects_bad_types():
    g = Grid.uniform(8, 8)
    with pytest.raises(CFDError) as ei:
        validate_thermal_bc(ThermalBCConfig(left=BCType.NOSLIP), g)
    assert ei.value.status == Status.ERROR_INVALID
    # z-face types only validated on 3D grids
    g3 = Grid.uniform(8, 8, 4, zmin=0.0, zmax=1.0)
    with pytest.raises(CFDError):
        validate_thermal_bc(ThermalBCConfig(front=BCType.INLET), g3)
    # ... and ignored on 2D grids
    validate_thermal_bc(ThermalBCConfig(front=BCType.INLET), g)


def test_buoyancy_vector_algebra():
    T = jnp.asarray([[301.0, 299.0]])
    fx, fy, fz = compute_buoyancy(T, beta=0.5, T_ref=300.0,
                                  gravity=(1.0, -9.81, 2.0))
    np.testing.assert_allclose(np.asarray(fx), [[-0.5, 0.5]])
    np.testing.assert_allclose(np.asarray(fy), [[0.5 * 9.81, -0.5 * 9.81]])
    np.testing.assert_allclose(np.asarray(fz), [[-1.0, 1.0]])
    assert compute_buoyancy(T, 0.0, 300.0, (0, -9.81, 0)) == (0.0, 0.0, 0.0)


def test_thermal_dt_limit_formula():
    assert thermal_dt_limit(0.0, 0.1, 2, 0.2) == float("inf")
    assert thermal_dt_limit(-1.0, 0.1, 2, 0.2) == float("inf")
    np.testing.assert_allclose(thermal_dt_limit(2.0, 0.1, 3, 0.4),
                               0.1 ** 2 / (2 * 2.0 * 3) * 0.4)


@pytest.mark.parametrize("maker", [make_euler_step, make_rk2_step,
                                   make_rk4_step, make_projection_step])
def test_energy_coupled_into_every_integrator(maker):
    """alpha>0 evolves T inside each integrator; alpha=0 leaves T frozen
    (the reference wires the energy post-step into every NS solver)."""
    g = Grid.uniform(24, 24)
    X, Y, _ = _coords(g)
    T0 = jnp.asarray(300.0 + 5.0 * np.sin(TWO_PI * X) * np.sin(TWO_PI * Y))

    f = FlowField.initialize(g).replace(T=T0)
    hot = jax.jit(maker(g, NSParams(alpha=0.05, source_amplitude_u=0.0,
                                    source_amplitude_v=0.0)))
    cold = jax.jit(maker(g, NSParams(alpha=0.0, source_amplitude_u=0.0,
                                     source_amplitude_v=0.0)))
    f_hot, r_hot = hot(f, 1e-4, 0)
    f_cold, r_cold = cold(f, 1e-4, 0)
    assert int(r_hot.status) == 0 and int(r_cold.status) == 0
    # interior comparison: euler/RK apply the periodic default wrap to the
    # T shell regardless of alpha (reference parity, `:546-575`)
    inner = (slice(None), slice(1, -1), slice(1, -1))
    assert float(jnp.max(jnp.abs(f_hot.T[inner] - T0[inner]))) > 0.0
    np.testing.assert_array_equal(np.asarray(f_cold.T[inner]),
                                  np.asarray(T0[inner]))
