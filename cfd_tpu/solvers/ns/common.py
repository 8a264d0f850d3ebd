"""Shared helpers for the NS time integrators."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...core.field import FlowField
from ...core.grid import Grid
from ...core.status import CFDError, Status
from .params import (DT_MAX_LIMIT, DT_MIN_LIMIT, SPEED_EPSILON,
                     VELOCITY_EPSILON, NSParams, StepResult)
from ..energy import thermal_dt_limit


def validate_grid_for_solver(grid: Grid, field_shape) -> None:
    """Dimension checks shared by all integrators
    (`solver_explicit_euler.c:338-353`)."""
    nz, ny, nx = field_shape
    if nx < 3 or ny < 3 or (nz > 1 and nz < 3):
        raise CFDError(Status.ERROR_INVALID,
                       "solver requires >= 3 points per active axis")
    if grid.nz > 1 and not grid.is_uniform("z", rtol=1e-14):
        raise CFDError(Status.ERROR_INVALID,
                       "non-uniform z-spacing not supported")


def spacing_arrays(grid: Grid, dtype):
    """Per-point inverse spacings broadcastable over (nz, ny, nx).

    Mirrors the reference's use of grid->dx[i] at point i
    (`solver_explicit_euler.c:409`): entry i holds dx[i] for i < nx-1; the
    final entry repeats dx[-1] (only interior points are consumed).
    Also returns validity masks for the |dx|>1e-10 guards.
    """
    dx = np.concatenate([grid.dx, grid.dx[-1:]])
    dy = np.concatenate([grid.dy, grid.dy[-1:]])
    inv_2dx = jnp.asarray(1.0 / (2.0 * dx), dtype)[None, None, :]
    inv_2dy = jnp.asarray(1.0 / (2.0 * dy), dtype)[None, :, None]
    inv_dx2 = jnp.asarray(1.0 / (dx * dx), dtype)[None, None, :]
    inv_dy2 = jnp.asarray(1.0 / (dy * dy), dtype)[None, :, None]
    ok = ((np.abs(dx)[None, None, :] >= 1e-10)
          & (np.abs(dy)[None, :, None] >= 1e-10))
    return inv_2dx, inv_2dy, inv_dx2, inv_dy2, jnp.asarray(ok)


def z_constants(grid: Grid):
    """Branch-free z constants (inv_2dz, inv_dz2); zeros in 2D."""
    if grid.nz > 1:
        return 1.0 / (2.0 * grid.dz0), 1.0 / (grid.dz0 * grid.dz0)
    return 0.0, 0.0


def stretch_mode(grid: Grid, params: NSParams):
    """(stretch, fuse_ok) gate shared by the euler/RK fused-kernel
    dispatchers.  Uniform x/y → (None, spacing-valid); stretched x/y →
    a ``(dx, dy, x, y)`` numpy tuple for the kernels' pinned coefficient
    inputs (`ops/pallas/stretch.py`), provided every per-point spacing
    passes the |h| > 1e-10 guard and the energy equation is off (it
    requires uniform grids, `energy_solver.c:55-91`)."""
    if grid.is_uniform("x") and grid.is_uniform("y"):
        return None, min(grid.dx0, grid.dy0) > 1e-10
    if params.energy_enabled:
        return None, False
    from ...ops.pallas.stretch import stretch_spacing_ok
    if not stretch_spacing_ok(grid.dx, grid.dy):
        return None, False
    return (grid.dx, grid.dy, grid.x, grid.y), True


def clamp(v, limit):
    return jnp.clip(v, -limit, limit)


def field_diagnostics(field: FlowField):
    """(max |velocity|, max p, max T) for stats."""
    vmax = jnp.sqrt(jnp.max(field.u ** 2 + field.v ** 2 + field.w ** 2))
    return vmax, jnp.max(field.p), jnp.max(field.T)


def field_status_and_diagnostics(field: FlowField):
    """(finite, vmax, pmax, tmax) in a minimal number of HBM passes.

    The finiteness of u, v, w follows from max(u²+v²+w²) being finite
    (squares map ±Inf → Inf and NaN propagates through max); p is covered by
    max(|p|).  This folds the reference's separate NaN sweep
    (`solver_explicit_euler.c:560-575`) into the stats reductions.
    """
    m2 = jnp.max(field.u ** 2 + field.v ** 2 + field.w ** 2)
    pabs = jnp.max(jnp.abs(field.p))
    pmax = jnp.max(field.p)
    tmax = jnp.max(field.T)
    finite = jnp.isfinite(m2) & jnp.isfinite(pabs)
    return finite, jnp.sqrt(m2), pmax, tmax


def compute_dt(field: FlowField, grid: Grid, params: NSParams) -> float:
    """CFL-stable dt (compute_time_step, `solver_explicit_euler.c:162-229`):

      dt = clip(cfl·dmin / max(|u| + c), 1e-6, 0.01)

    with sound speed c = sqrt(gamma·p/rho), the thermal-diffusion bound when
    alpha > 0, and max speed floored at 1 when the field is quiescent.

    Deviation from the reference: the wave-speed max scans the whole 3D field
    (the C loop only visits the k=0 plane) — strictly more conservative.
    """
    sound = jnp.sqrt(params.gamma * field.p / jnp.maximum(field.rho, 1e-300))
    vel_sq = field.u ** 2 + field.v ** 2 + field.w ** 2
    vel = jnp.where(vel_sq > VELOCITY_EPSILON, jnp.sqrt(vel_sq), 0.0)
    max_speed = float(jnp.max(vel + sound))
    if max_speed < SPEED_EPSILON:
        max_speed = 1.0
    dmin = min(float(np.min(grid.dx)), float(np.min(grid.dy)))
    if grid.nz > 1:
        dmin = min(dmin, float(np.min(grid.dz)))
    dt_cfl = params.cfl * dmin / max_speed
    ndim = 3 if grid.nz > 1 else 2
    dt_stable = min(dt_cfl, thermal_dt_limit(params.alpha, dmin, ndim,
                                             params.cfl))
    return max(DT_MIN_LIMIT, min(DT_MAX_LIMIT, dt_stable))


def iterate_with_divergence_guard(step_once, field: FlowField, dt, max_iter: int):
    """Run ``max_iter`` steps via lax.scan, freezing state once a step fails
    (the scan-friendly version of the reference's early-return on
    CFD_ERROR_DIVERGED / CFD_ERROR_MAX_ITER)."""

    def body(carry, iter_idx):
        field, status, applied, res = carry
        new_field, step_res = step_once(field, dt, iter_idx)
        keep_new = status == 0
        field = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep_new, new, old), new_field, field)
        status = jnp.where(keep_new, step_res.status, status)
        applied = applied + jnp.where(keep_new, 1, 0).astype(jnp.int32)
        res = jnp.where(keep_new, step_res.residual, res)
        return (field, status, applied, res), None

    init = (field, jnp.int32(0), jnp.int32(0), jnp.zeros((), field.u.dtype))
    (field, status, applied, res), _ = lax.scan(
        body, init, jnp.arange(max_iter))
    vmax, pmax, tmax = field_diagnostics(field)
    return field, StepResult(iterations=applied, status=status,
                             residual=res, max_velocity=vmax,
                             max_pressure=pmax, max_temperature=tmax)
