"""Shared validation harness: jit-scanned cavity / Taylor-Green / convection
runners.

TPU-native equivalent of the reference's validation harness headers
(tests/validation/lid_driven_cavity_common.h, taylor_green_reference.h): the
per-step "apply BCs → solver_step" host loop becomes a ``lax.scan`` so a
2000-step validation run is one XLA execution.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (DirichletValues, apply_dirichlet_scalar,
                              apply_neumann_scalar, apply_periodic_scalar)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

STEP_BUILDERS = {
    "explicit_euler": make_euler_step,
    "rk2": make_rk2_step,
    "rk4": make_rk4_step,
    "projection": make_projection_step,
}


# ---------------------------------------------------------------------------
# Lid-driven cavity (lid_driven_cavity_common.h:143-149, 232-330)
# ---------------------------------------------------------------------------


def run_cavity(method: str, nx: int, steps: int, dt: float, reynolds: float,
               lid_velocity: float = 1.0):
    """Quiescent start; each step applies the cavity Dirichlet BCs then one
    solver step (max_iter=1), exactly the reference's loop."""
    grid = Grid.uniform(nx, nx)
    nu = lid_velocity * 1.0 / reynolds
    params = NSParams(dt=dt, cfl=0.5, mu=nu, k=0.0, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0,
                      source_decay_rate=0.0)
    step = STEP_BUILDERS[method](grid, params)

    u_bc = DirichletValues(top=lid_velocity)
    v_bc = DirichletValues()

    def cavity_step(field, i):
        u = apply_dirichlet_scalar(field.u, u_bc)
        v = apply_dirichlet_scalar(field.v, v_bc)
        p = apply_neumann_scalar(field.p)
        field = field.replace(u=u, v=v, p=p)
        field, res = step(field, dt, i)
        return field, res.status

    @jax.jit
    def run(field):
        field, statuses = lax.scan(cavity_step, field, jnp.arange(steps))
        return field, statuses

    field0 = FlowField.quiescent(nx, nx, pressure=0.0)
    field, statuses = run(field0)
    field.u.block_until_ready()
    return field, grid, np.asarray(statuses)


def centerline_profiles(field, grid):
    """(y, u(x=0.5, y)) and (x, v(x, y=0.5)) centerline profiles."""
    ic = grid.nx // 2
    jc = grid.ny // 2
    u_profile = np.asarray(field.u)[0, :, ic]
    v_profile = np.asarray(field.v)[0, jc, :]
    return (np.asarray(grid.y), u_profile), (np.asarray(grid.x), v_profile)


# ---------------------------------------------------------------------------
# Taylor-Green vortex (taylor_green_reference.h)
# ---------------------------------------------------------------------------


def tg_init_2d(grid: Grid):
    """u = cos x sin y · F, v = −sin x cos y · F, p = −ρ/4 (cos2x + cos2y)F²
    at t=0 (F=1)."""
    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    u = np.cos(X) * np.sin(Y)
    v = -np.sin(X) * np.cos(Y)
    p = -0.25 * (np.cos(2 * X) + np.cos(2 * Y))
    return FlowField(u=jnp.asarray(u), v=jnp.asarray(v),
                     w=jnp.zeros(grid.shape),
                     p=jnp.asarray(p), rho=jnp.ones(grid.shape),
                     T=jnp.full(grid.shape, 300.0))


def run_taylor_green(method: str, nx: int, steps: int, dt: float, nu: float,
                     nz: int = 1):
    two_pi = 2.0 * np.pi
    grid = Grid.uniform(nx, nx, nz, xmax=two_pi, ymax=two_pi,
                        zmax=two_pi if nz > 1 else 0.0)
    params = NSParams(dt=dt, cfl=0.5, mu=nu, k=0.0, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0,
                      source_decay_rate=0.0)
    step = STEP_BUILDERS[method](grid, params)

    def tg_step(field, i):
        field = field.replace(u=apply_periodic_scalar(field.u),
                              v=apply_periodic_scalar(field.v),
                              p=apply_periodic_scalar(field.p))
        field, res = step(field, dt, i)
        return field, res.status

    @jax.jit
    def run(field):
        return lax.scan(tg_step, field, jnp.arange(steps))

    field0 = tg_init_2d(grid)
    field, statuses = run(field0)
    field.u.block_until_ready()
    return field0, field, grid, np.asarray(statuses)


def max_velocity(field):
    return float(np.sqrt(np.asarray(field.u) ** 2
                         + np.asarray(field.v) ** 2
                         + np.asarray(field.w) ** 2).max())


def kinetic_energy(field):
    return float(0.5 * (np.asarray(field.u) ** 2
                        + np.asarray(field.v) ** 2
                        + np.asarray(field.w) ** 2).sum())
