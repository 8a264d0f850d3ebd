"""Explicit Euler Navier-Stokes integrator.

Re-design of `cpu/solver_explicit_euler.c:337-582` as a single jitted step:
the C triple loop with per-point clamps becomes one fused vectorized update;
the whole multi-iteration solve is a ``lax.scan``.

Semantics preserved (the reference's deliberate quirks, SURVEY.md §7):

* conservative dt cap ``min(dt, 1e-4)`` (`:389`);
* derivative/update/velocity clamps (±100, ±1000, ±1, ±100; `:24-55`);
* artificial pressure coupling dp = −0.1·dt·ρ·clamp(div) (`:515-520`);
* per-point ρ ≤ 1e-10 and tiny-spacing guards skip the update (`:397-401`);
* after each iteration: energy step → periodic BCs on all variables →
  caller's *velocity* boundaries restored (p, ρ, T keep the periodic wrap) →
  thermal BCs on T → NaN/Inf divergence check (`:546-575`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...boundary.apply import apply_periodic_field, copy_boundary_velocities
from ...core.field import FlowField
from ...core.grid import Grid
from ...ops import stencils
from ..energy import apply_thermal_bcs, compute_buoyancy, make_energy_step, \
    validate_thermal_bc
from .common import (clamp, field_status_and_diagnostics,
                     iterate_with_divergence_guard, spacing_operators,
                     stretch_mode, validate_grid_for_solver, z_constants)
from .params import (DT_CONSERVATIVE_LIMIT, MAX_DERIVATIVE_LIMIT,
                     MAX_DIVERGENCE_LIMIT, MAX_SECOND_DERIVATIVE_LIMIT,
                     MAX_VELOCITY_LIMIT, UPDATE_LIMIT, NSParams, StepResult,
                     source_terms)


def make_euler_step(grid: Grid, params: NSParams, dtype=None,
                    use_pallas=None, pallas_interpret: bool = False,
                    differentiable: bool = False):
    """Build the jitted one-iteration Euler step: (field, dt, iter) → (field,
    StepResult).

    ``use_pallas=None`` (auto) enables the fused single-pass rolling kernel
    on TPU backends for float32 3D grids (uniform, or tanh-stretched x/y
    with the energy equation off) with the built-in
    (amplitude/decay) sources — including Boussinesq buoyancy, the energy
    equation, and thermal BCs, which are fused into the same pass; only
    custom ``source_func``/``heat_source_func`` callbacks (or an unsupported
    shape) keep the jnp step.  The kernel is consistency-tested against the
    jnp path (tests/math/test_euler_fused.py).

    The jnp path is reverse-differentiable as-is; ``differentiable=True``
    pins it (the fused kernels have no transpose rule) unless
    ``use_pallas=True`` is also passed explicitly, which builds the hybrid
    step instead — fused kernel forward, jnp adjoint (`.hybrid.pair_vjp`;
    exact, the two paths are bit-identical on TPU)."""
    if differentiable:
        if use_pallas:
            from .hybrid import pair_vjp
            return pair_vjp(
                make_euler_step(grid, params, dtype, use_pallas=True,
                                pallas_interpret=pallas_interpret),
                make_euler_step(grid, params, dtype, use_pallas=False))
        use_pallas = False
    validate_grid_for_solver(grid, grid.shape)
    if params.energy_enabled:
        validate_thermal_bc(params.thermal_bc, grid)
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if (use_pallas and dtype == jnp.float32 and grid.nz <= 2
            and params.source_func is None
            and params.heat_source_func is None):
        # uniform x/y, or stretched with per-point weights riding a
        # pinned x-row input + streamed y-weight planes (stretch.py).
        stretch2d, fuse2d_ok = stretch_mode(grid, params)
        if fuse2d_ok:
            from ...ops.pallas.euler2d import make_euler2d_fused
            fused2d = make_euler2d_fused(
                grid.ny, grid.nx, grid.dx0, grid.dy0, grid.xmin, grid.ymin,
                params.mu, params.pressure_coupling, alpha=params.alpha,
                beta=params.beta, T_ref=params.T_ref, gravity=params.gravity,
                thermal_bc=params.thermal_bc, stretch=stretch2d,
                scheme=params.nonuniform_scheme, dtype=dtype,
                interpret=pallas_interpret)
            if fused2d is not None:
                return _make_fused_euler2d_step(fused2d, grid, params, dtype)
    if (use_pallas and dtype == jnp.float32 and grid.nz > 2
            and grid.dz0 > 1e-10
            and params.source_func is None
            and params.heat_source_func is None):
        # z is uniform here (validate_grid_for_solver); x/y may be
        # stretched — per-point coefficients then ride pinned VMEM inputs.
        stretch, fuse_ok = stretch_mode(grid, params)
        if fuse_ok:
            from ...ops.pallas.euler_kernels import make_euler_fused
            fused = make_euler_fused(
                grid.nz, grid.ny, grid.nx, grid.dx0, grid.dy0, grid.dz0,
                grid.xmin, grid.ymin, params.mu, params.pressure_coupling,
                alpha=params.alpha, beta=params.beta, T_ref=params.T_ref,
                gravity=params.gravity, thermal_bc=params.thermal_bc,
                stretch=stretch, scheme=params.nonuniform_scheme,
                dtype=dtype, interpret=pallas_interpret)
            if fused is not None:
                return _make_fused_euler_step(fused, params, dtype)

    d1x, d1y, d2x, d2y, spacing_ok = spacing_operators(
        grid, dtype, params.nonuniform_scheme)
    inv_2dz, inv_dz2 = z_constants(grid)
    coords = grid.coordinate_arrays(dtype)
    energy_step = make_energy_step(grid, params.alpha, params.heat_source_func,
                                   scheme=params.nonuniform_scheme)

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(dt, DT_CONSERVATIVE_LIMIT)
        u, v, w, p, rho = field.u, field.v, field.w, field.p, field.rho

        d1 = functools.partial(clamp, limit=MAX_DERIVATIVE_LIMIT)
        d2 = functools.partial(clamp, limit=MAX_SECOND_DERIVATIVE_LIMIT)

        def shifts(f):
            return (stencils.sx_m(f), stencils.sx_p(f),
                    stencils.sy_m(f), stencils.sy_p(f))

        ul, ur, ud, uu = shifts(u)
        vl, vr, vd, vu = shifts(v)
        wl, wr, wd, wu = shifts(w)
        pl, pr, pd, pu = shifts(p)

        du_dx = d1(d1x(ul, u, ur))
        du_dy = d1(d1y(ud, u, uu))
        du_dz = d1(stencils.ddz(u, inv_2dz))
        dv_dx = d1(d1x(vl, v, vr))
        dv_dy = d1(d1y(vd, v, vu))
        dv_dz = d1(stencils.ddz(v, inv_2dz))
        dw_dx = d1(d1x(wl, w, wr))
        dw_dy = d1(d1y(wd, w, wu))
        dw_dz = d1(stencils.ddz(w, inv_2dz))
        dp_dx = d1(d1x(pl, p, pr))
        dp_dy = d1(d1y(pd, p, pu))
        dp_dz = d1(stencils.ddz(p, inv_2dz))

        lap_u = (d2(d2x(ul, u, ur)) + d2(d2y(ud, u, uu))
                 + d2(stencils.d2dz2(u, inv_dz2)))
        lap_v = (d2(d2x(vl, v, vr)) + d2(d2y(vd, v, vu))
                 + d2(stencils.d2dz2(v, inv_dz2)))
        lap_w = (d2(d2x(wl, w, wr)) + d2(d2y(wd, w, wu))
                 + d2(stencils.d2dz2(w, inv_dz2)))

        nu = jnp.minimum(params.mu / jnp.maximum(rho, 1e-10), 1.0)

        su, sv, sw = source_terms(coords, params, iter_idx, cdt)
        if params.buoyancy_enabled:
            bu, bv, bw = compute_buoyancy(field.T, params.beta, params.T_ref,
                                          params.gravity)
            su, sv, sw = su + bu, sv + bv, sw + bw

        du = cdt * (-u * du_dx - v * du_dy - w * du_dz - dp_dx / rho
                    + nu * lap_u + su)
        dv = cdt * (-u * dv_dx - v * dv_dy - w * dv_dz - dp_dy / rho
                    + nu * lap_v + sv)
        dw = cdt * (-u * dw_dx - v * dw_dy - w * dw_dz - dp_dz / rho
                    + nu * lap_w + sw)

        du = clamp(du, UPDATE_LIMIT)
        dv = clamp(dv, UPDATE_LIMIT)
        dw = clamp(dw, UPDATE_LIMIT)

        u_new = clamp(u + du, MAX_VELOCITY_LIMIT)
        v_new = clamp(v + dv, MAX_VELOCITY_LIMIT)
        w_new = clamp(w + dw, MAX_VELOCITY_LIMIT)

        divergence = clamp(du_dx + dv_dy + dw_dz, MAX_DIVERGENCE_LIMIT)
        dp = clamp(-params.pressure_coupling * cdt * rho * divergence,
                   UPDATE_LIMIT)
        p_new = p + dp

        # Per-point guards: rho or spacing invalid → keep old value (`:397-401`).
        ok = spacing_ok & (rho > 1e-10)
        u_new = jnp.where(ok, u_new, u)
        v_new = jnp.where(ok, v_new, v)
        w_new = jnp.where(ok, w_new, w)
        p_new = jnp.where(ok, p_new, p)

        # Interior-only update.
        new_field = field.replace(
            u=stencils.set_interior(u, u_new),
            v=stencils.set_interior(v, v_new),
            w=stencils.set_interior(w, w_new),
            p=stencils.set_interior(p, p_new))

        # Energy equation with updated velocity (`:534-544`).
        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, cdt, iter_idx * cdt)
            new_field = new_field.replace(T=T)

        # Boundary dance (`:546-553`): periodic on everything, then restore
        # the caller's velocity boundaries, then thermal BCs on T.
        saved_u, saved_v, saved_w = new_field.u, new_field.v, new_field.w
        per = apply_periodic_field(new_field)
        ru, rv, rw = copy_boundary_velocities(per.u, per.v, per.w,
                                              saved_u, saved_v, saved_w)
        new_field = per.replace(u=ru, v=rv, w=rw)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(finite, jnp.int32(0),
                           jnp.int32(-6))  # Status.ERROR_DIVERGED
        return new_field, StepResult(iterations=jnp.int32(1),
                                     status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def _make_fused_euler_step(fused, params: NSParams, dtype):
    """Wrap the single-pass fused kernel into the step contract: scalar
    prep (conservative dt cap, decayed source amplitudes), z-shell
    diagnostic folding, StepResult assembly — exact parity with the jnp
    body (the kernel reproduces its math term by term)."""

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.asarray(DT_CONSERVATIVE_LIMIT, dtype))
        t = jnp.asarray(iter_idx, dtype) * cdt
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        scal = jnp.stack([cdt,
                          jnp.asarray(params.source_amplitude_u, dtype)
                          * decay,
                          jnp.asarray(params.source_amplitude_v, dtype)
                          * decay, t])
        (u, v, w, p, rho, T, m2i, pmaxi, pabsi, tmaxi) = fused(
            scal, field.u, field.v, field.w, field.p, field.T, field.rho)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)

        # Kernel max-reductions cover the computed planes (p/rho/T z-shells
        # are periodic copies of those planes); fold in the velocity
        # z-shells, which pass through from the input.
        def m2_face(k):
            return jnp.max(u[k] ** 2 + v[k] ** 2 + w[k] ** 2)

        m2 = jnp.maximum(m2i, jnp.maximum(m2_face(0), m2_face(-1)))
        tmax = jnp.maximum(tmaxi, jnp.maximum(jnp.max(T[0]),
                                              jnp.max(T[-1])))
        finite = jnp.isfinite(m2) & jnp.isfinite(pabsi)
        status = jnp.where(finite, jnp.int32(0), jnp.int32(-6))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=jnp.sqrt(m2),
                                     max_pressure=pmaxi,
                                     max_temperature=tmax)

    return step


def _make_fused_euler2d_step(fused, grid: Grid, params: NSParams, dtype):
    """Wrap the single-pass 2D marching kernel into the step contract.
    The kernel handles the interior update and the X half of the boundary
    dance; the global y-face rows (whose periodic wrap sources can live
    in a different marching block) are restored here: p/rho/T wrap rows
    ny−2 / 1, T's thermal bottom/top faces per config, velocities keep
    their input faces via the kernel's interior mask."""
    from ...boundary.types import thermal_y_specs

    t_yspec = ("periodic", "periodic")
    if params.energy_enabled:
        t_yspec = thermal_y_specs(params.thermal_bc)
    ny = grid.ny

    def wrap_y(q, yspec=("periodic", "periodic")):
        lo_spec, hi_spec = yspec
        if lo_spec == "periodic":
            src_lo = q[:, ny - 2]
        elif lo_spec == "neumann":
            src_lo = q[:, 1]
        else:
            src_lo = jnp.full_like(q[:, 0], lo_spec)
        if hi_spec == "periodic":
            src_hi = q[:, 1]
        elif hi_spec == "neumann":
            src_hi = q[:, ny - 2]
        else:
            src_hi = jnp.full_like(q[:, 0], hi_spec)
        return q.at[:, 0].set(src_lo).at[:, ny - 1].set(src_hi)

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.asarray(DT_CONSERVATIVE_LIMIT, dtype))
        t = jnp.asarray(iter_idx, dtype) * cdt
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        scal = jnp.stack([cdt,
                          jnp.asarray(params.source_amplitude_u, dtype)
                          * decay,
                          jnp.asarray(params.source_amplitude_v, dtype)
                          * decay])
        u, v, w, p, rho, T = (o[None] for o in fused(
            scal, field.u[0], field.v[0], field.w[0], field.p[0],
            field.T[0], field.rho[0]))
        p = wrap_y(p)
        rho = wrap_y(rho)
        T = wrap_y(T, t_yspec)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(finite, jnp.int32(0), jnp.int32(-6))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def make_euler_solve(grid: Grid, params: NSParams, dtype=None):
    """Multi-iteration solve (explicit_euler_impl's iter loop) as one jit."""
    step = make_euler_step(grid, params, dtype)

    @jax.jit
    def solve(field: FlowField, dt):
        return iterate_with_divergence_guard(step, field, dt, params.max_iter)

    return solve
