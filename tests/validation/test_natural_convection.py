"""de Vahl Davis natural convection benchmark.

Mirrors tests/validation/test_natural_convection.c: differentially heated
square cavity (hot left wall 310 K, cold right wall 290 K, adiabatic
top/bottom, no-slip walls, Boussinesq coupling), marched to steady state via
a kinetic-energy residual, then compared against the published benchmark:

  Ra     u_max*   v_max*   Nu_avg
  1e3    3.649    3.697    1.117      (CI tier, 41², 10% gates)
  1e4    16.178   19.617   2.238     (full tier)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step

L = 1.0
T_HOT, T_COLD, T_REF = 310.0, 290.0, 300.0
DT_TEMP = T_HOT - T_COLD
BETA = 0.003333
G = 9.81
PR = 0.71
STEADY_TOL = 1e-6
CHUNK = 100


def run_dvd(Ra: float, n: int, dt: float, max_steps: int):
    nu_alpha = G * BETA * DT_TEMP * L ** 3 / Ra
    alpha = float(np.sqrt(nu_alpha / PR))
    nu = PR * alpha
    dx = L / (n - 1)
    assert dt < dx * dx / (2 * alpha * 2), "dt exceeds thermal stability"

    grid = Grid.uniform(n, n)
    params = NSParams(
        dt=dt, mu=nu, alpha=alpha, beta=BETA, T_ref=T_REF,
        gravity=(0.0, -G, 0.0), max_iter=1,
        source_amplitude_u=0.0, source_amplitude_v=0.0,
        thermal_bc=ThermalBCConfig(
            left=BCType.DIRICHLET, right=BCType.DIRICHLET,
            top=BCType.NEUMANN, bottom=BCType.NEUMANN,
            dirichlet_values=DirichletValues(left=T_HOT, right=T_COLD)))
    step = make_projection_step(grid, params)

    noslip = DirichletValues()

    def bc(field):
        from cfd_tpu.boundary import apply_dirichlet_scalar
        return field.replace(u=apply_dirichlet_scalar(field.u, noslip),
                             v=apply_dirichlet_scalar(field.v, noslip))

    def one_step(field, i):
        field = bc(field)
        field, res = step(field, dt, i)
        field = bc(field)
        return field, res.status

    @jax.jit
    def run_chunk(field, start):
        return lax.scan(one_step, field,
                        start + jnp.arange(CHUNK))

    # Quiescent start with a linear temperature ramp hot→cold.
    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    field = FlowField.quiescent(n, n, pressure=0.0).replace(
        T=jnp.asarray(T_HOT - DT_TEMP * (X / L)))

    prev_ke = 0.0
    steps_done = 0
    converged = False
    while steps_done < max_steps:
        field, statuses = run_chunk(field, steps_done)
        assert (np.asarray(statuses) == 0).all(), "solver failed"
        steps_done += CHUNK
        ke = float(0.5 * (np.asarray(field.u) ** 2
                          + np.asarray(field.v) ** 2).sum())
        if steps_done > 200 and abs(ke - prev_ke) / (prev_ke + 1e-10) \
                < STEADY_TOL * CHUNK:
            converged = True
            break
        prev_ke = ke

    # Benchmark quantities (non-dimensionalized by alpha/L).
    vel_scale = L / alpha
    ic, jc = n // 2, n // 2
    u = np.asarray(field.u)[0]
    v = np.asarray(field.v)[0]
    T = np.asarray(field.T)[0]
    umax = np.abs(u[:, ic]).max() * vel_scale
    vmax = np.abs(v[jc, :]).max() * vel_scale

    # Average Nusselt number on the hot wall (2nd-order one-sided).
    Ts = (T - T_COLD) / DT_TEMP
    dTdx = (-3 * Ts[:, 0] + 4 * Ts[:, 1] - Ts[:, 2]) / (2 * dx)
    nu_local = -dTdx * L
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    nu_avg = (w * nu_local).sum() * (L / (n - 1)) / L

    return umax, vmax, nu_avg, converged, steps_done, field


def test_dvd_ra1e3():
    umax, vmax, nu_avg, converged, steps, field = run_dvd(
        Ra=1e3, n=41, dt=0.002, max_steps=30000)
    assert bool(field.is_finite())
    assert abs(umax - 3.649) / 3.649 < 0.10, umax
    assert abs(vmax - 3.697) / 3.697 < 0.10, vmax
    assert abs(nu_avg - 1.117) / 1.117 < 0.10, nu_avg


def test_dvd_ra1e4_full(full_validation):
    if not full_validation:
        pytest.skip("full-validation tier (--full-validation)")
    umax, vmax, nu_avg, converged, steps, field = run_dvd(
        Ra=1e4, n=81, dt=0.0005, max_steps=60000)
    assert abs(umax - 16.178) / 16.178 < 0.10, umax
    assert abs(vmax - 19.617) / 19.617 < 0.10, vmax
    assert abs(nu_avg - 2.238) / 2.238 < 0.10, nu_avg
