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


def consistent_triples(spacing):
    """Exact 3-point nonuniform derivative weights, one sextuple of
    length-n numpy arrays (wm, wc, wp, lm, lc, lp).

    At interior point i with h_m = x[i]−x[i−1], h_p = x[i+1]−x[i]:

      f'  ≈ wm·f[i−1] + wc·f[i] + wp·f[i+1],
            wm = −h_p/(h_m·s), wc = (h_p−h_m)/(h_m·h_p), wp = h_m/(h_p·s)
      f'' ≈ lm·f[i−1] + lc·f[i] + lp·f[i+1],
            lm = 2/(h_m·s),    lc = −2/(h_m·h_p),        lp = 2/(h_p·s)

    with s = h_m + h_p — exact for quadratics on ANY grid and O(h²) on
    smoothly graded (tanh) grids, vs the reference's forward-spacing
    stencils which are only O(h)-consistent off uniform grids.  Edge
    entries substitute the edge spacing for the missing one-sided gap
    (finite values only; solvers consume interior points).  Numpy on
    purpose (build-time constants must not be jnp — docs/design.md)."""
    h = np.asarray(spacing, np.float64)
    hm = np.concatenate([h[:1], h])       # h_m at point i = h[i-1]
    hp = np.concatenate([h, h[-1:]])      # h_p at point i = h[i]
    s = hm + hp
    return (-hp / (hm * s), (hp - hm) / (hm * hp), hm / (hp * s),
            2.0 / (hm * s), -2.0 / (hm * hp), 2.0 / (hp * s))


def spacing_operators(grid: Grid, dtype, scheme: str = "parity"):
    """(d1x, d1y, d2x, d2y, spacing_ok): x/y derivative operators as
    functions of the shifted views ``(f_minus, f_center, f_plus)``.

    ``scheme="parity"`` (default) reproduces the reference's per-point
    forward-spacing stencils (`solver_explicit_euler.c:409`,
    `spacing_arrays`).  ``scheme="consistent"`` — a framework extension
    beyond the limitation the reference documents at
    `poiseuille_stretched_grid.c:5-10` — uses the exact 3-point
    nonuniform weights (`consistent_triples`); on uniform grids the two
    schemes coincide and the parity path is used verbatim."""
    if scheme not in ("parity", "consistent"):
        raise CFDError(Status.ERROR_INVALID,
                       f"nonuniform_scheme must be 'parity' or "
                       f"'consistent', got {scheme!r}")
    if scheme == "parity" or (grid.is_uniform("x") and grid.is_uniform("y")):
        inv_2dx, inv_2dy, inv_dx2, inv_dy2, ok = spacing_arrays(grid, dtype)

        def d1x(fm, fc, fp):
            return (fp - fm) * inv_2dx

        def d1y(fm, fc, fp):
            return (fp - fm) * inv_2dy

        def d2x(fm, fc, fp):
            return (fp - 2.0 * fc + fm) * inv_dx2

        def d2y(fm, fc, fp):
            return (fp - 2.0 * fc + fm) * inv_dy2

        return d1x, d1y, d2x, d2y, ok

    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    xw = [np.asarray(a, np_dtype)[None, None, :]
          for a in consistent_triples(grid.dx)]
    yw = [np.asarray(a, np_dtype)[None, :, None]
          for a in consistent_triples(grid.dy)]
    wxm, wxc, wxp, lxm, lxc, lxp = xw
    wym, wyc, wyp, lym, lyc, lyp = yw

    hx = np.concatenate([grid.dx, grid.dx[-1:]])
    hy = np.concatenate([grid.dy, grid.dy[-1:]])
    ok = jnp.asarray((np.abs(hx)[None, None, :] >= 1e-10)
                     & (np.abs(hy)[None, :, None] >= 1e-10))

    def d1x(fm, fc, fp):
        return fm * wxm + fc * wxc + fp * wxp

    def d1y(fm, fc, fp):
        return fm * wym + fc * wyc + fp * wyp

    def d2x(fm, fc, fp):
        return fm * lxm + fc * lxc + fp * lxp

    def d2y(fm, fc, fp):
        return fm * lym + fc * lyc + fp * lyp

    return d1x, d1y, d2x, d2y, ok


def z_constants(grid: Grid):
    """Branch-free z constants (inv_2dz, inv_dz2); zeros in 2D."""
    if grid.nz > 1:
        return 1.0 / (2.0 * grid.dz0), 1.0 / (grid.dz0 * grid.dz0)
    return 0.0, 0.0


def stretch_gate(grid: Grid, params: NSParams):
    """(stretch, reason) — THE spacing gate for the fused euler/RK paths,
    single-chip and sharded (one predicate set, so dispatch can't drift).

    ``stretch`` is the kernels' ``(dx, dy, x, y)`` numpy tuple for the
    pinned coefficient inputs (`ops/pallas/stretch.py`), None on uniform
    x/y.  ``reason`` is None when the fused kernels may engage, else the
    human-readable disqualifier.  Both ``nonuniform_scheme`` values
    qualify (the kernels implement parity AND consistent stencils);
    energy + stretched requires the consistent scheme (parity thermal
    stencils are invalid off uniform grids, `energy_solver.c:55-91`)."""
    if grid.is_uniform("x") and grid.is_uniform("y"):
        if min(grid.dx0, grid.dy0) > 1e-10:
            return None, None
        return None, "degenerate grid spacing (|h| <= 1e-10)"
    if params.energy_enabled and params.nonuniform_scheme != "consistent":
        return None, ("stretched x/y with the energy equation needs "
                      "nonuniform_scheme='consistent'")
    from ...ops.pallas.stretch import stretch_spacing_ok
    if not stretch_spacing_ok(grid.dx, grid.dy):
        return None, "stretched spacing below the 1e-10 validity guard"
    return (grid.dx, grid.dy, grid.x, grid.y), None


def stretch_pin_count(grid: Grid, params: NSParams) -> int:
    """Extra pinned VMEM inputs the fused kernels consume for this
    grid/scheme — used by capacity gates (`euler_kernel_supported`)."""
    if grid.is_uniform("x") and grid.is_uniform("y"):
        return 0
    return 7 if params.nonuniform_scheme == "consistent" else 3


def stretch_mode(grid: Grid, params: NSParams):
    """(stretch, fuse_ok) — `stretch_gate` for boolean dispatchers."""
    stretch, reason = stretch_gate(grid, params)
    return stretch, reason is None


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
