"""Poiseuille channel-flow validation.

Mirrors tests/validation/test_poiseuille_flow.c: channel [0,4]×[0,1],
Re=5 (ν=0.2), 41×21 grid, parabolic inlet (left), zero-gradient outlet
(right), no-slip walls; initialized with the analytic profile and stepped
200× with dt=1e-3; profile RMS at x=0.75·L must stay within 10%.

Also covers the stretched-grid configuration from
examples/poiseuille_stretched_grid.c (tanh β=1.5 wall clustering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (InletConfig, OutletConfig, apply_inlet,
                              apply_noslip, apply_outlet_velocity)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step

LENGTH, HEIGHT = 4.0, 1.0
U_MAX = 1.0
RE = 5.0
NU = U_MAX * HEIGHT / RE  # 0.2
NX, NY = 41, 21
DT = 0.001
STEPS = 200
PROFILE_RMS_TOL = 0.10


def analytic_u(y):
    """u(y) = 4·U_max·(y/H)(1 − y/H)."""
    s = y / HEIGHT
    return 4.0 * U_MAX * s * (1.0 - s)


def run_poiseuille(grid: Grid):
    params = NSParams(dt=DT, mu=NU, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_projection_step(grid, params)
    inlet = InletConfig.parabolic(U_MAX)
    outlet = OutletConfig.zero_gradient()

    def bc(field):
        u, v = apply_noslip(field.u, field.v)
        u, v = apply_inlet(u, v, inlet)
        u, v = apply_outlet_velocity(u, v, outlet)
        return field.replace(u=u, v=v)

    def one_step(field, i):
        field = bc(field)
        field, res = step(field, DT, i)
        return field, res.status

    @jax.jit
    def run(field):
        return lax.scan(one_step, field, jnp.arange(STEPS))

    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    u0 = analytic_u(Y)
    dpdx = -8.0 * NU * U_MAX / HEIGHT ** 2  # analytic pressure gradient
    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    field = FlowField.quiescent(grid.nx, grid.ny, pressure=0.0).replace(
        u=jnp.asarray(u0), p=jnp.asarray(dpdx * X))
    field, statuses = run(field)
    assert (np.asarray(statuses) == 0).all()
    return bc(field)


def test_poiseuille_profile_uniform_grid():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    ix = int(0.75 * (NX - 1))
    u_profile = np.asarray(field.u)[0, :, ix]
    u_exact = analytic_u(np.asarray(grid.y))
    rms = np.sqrt(np.mean((u_profile - u_exact) ** 2)) / U_MAX
    assert rms < PROFILE_RMS_TOL, rms
    # cross-flow remains negligible
    assert np.abs(np.asarray(field.v)).max() < 0.1
    # walls are no-slip
    assert np.abs(u_profile[0]) < 1e-12 and np.abs(u_profile[-1]) < 1e-12


def test_poiseuille_inlet_profile_held():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    u_inlet = np.asarray(field.u)[0, :, 0]
    s = np.arange(NY) / (NY - 1)
    np.testing.assert_allclose(u_inlet, U_MAX * 4 * s * (1 - s), atol=1e-12)


def test_poiseuille_outlet_zero_gradient():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    u = np.asarray(field.u)[0]
    np.testing.assert_allclose(u[:, -1], u[:, -2], atol=1e-12)
