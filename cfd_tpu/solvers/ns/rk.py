"""RK2 (Heun) and RK4 (classical) Navier-Stokes integrators.

Re-design of `cpu/solver_rk2.c` / `cpu/solver_rk4.c` and the shared momentum
RHS kernel `momentum_rhs/ns_momentum_rhs_scalar.h` (which the reference also
instantiates for AVX2/OMP — here one vectorized function serves all).

Semantics preserved:

* the RHS uses **periodic interior stencils** that wrap skipping the ghost
  layer (i==1 → nx−2; `ns_momentum_rhs_scalar.h:78-90`) so intermediate RK
  stages never read stale ghost cells — critical for temporal order;
* derivative clamps ±100 / ±1000, divergence clamp ±10, pressure RHS
  dp/dt = −0.1·ρ·div (`ns_momentum_rhs_scalar.h:128-186`);
* per-point ρ ≤ 1e-10 / tiny-spacing guards zero the RHS (`:62-76`);
* stage updates touch ALL points (k arrays are zero on the shell, so
  boundaries only move through the ±100 velocity clamp), with NO BC
  application between stages (`solver_rk2.c` "Do NOT apply BCs between RK
  stages");
* after the full step: energy step → periodic BCs on everything → thermal
  BCs → NaN check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...boundary.apply import apply_periodic_field
from ...core.field import FlowField
from ...core.grid import Grid
from ...ops import stencils
from ..energy import apply_thermal_bcs, compute_buoyancy, make_energy_step, \
    validate_thermal_bc
from .common import (clamp, field_status_and_diagnostics,
                     iterate_with_divergence_guard, spacing_operators,
                     stretch_mode, validate_grid_for_solver, z_constants)
from .params import (MAX_DERIVATIVE_LIMIT, MAX_DIVERGENCE_LIMIT,
                     MAX_SECOND_DERIVATIVE_LIMIT, MAX_VELOCITY_LIMIT,
                     NSParams, StepResult, source_terms)


def _periodic_shifts(f):
    """(left, right, down, up, back, front) periodic-interior neighbors."""
    return (stencils.sx_m_periodic_interior(f),
            stencils.sx_p_periodic_interior(f),
            stencils.sy_m_periodic_interior(f),
            stencils.sy_p_periodic_interior(f),
            stencils.sz_m_periodic_interior(f),
            stencils.sz_p_periodic_interior(f))


def make_momentum_rhs(grid: Grid, params: NSParams, dtype):
    """The shared semi-discrete RHS: (u,v,w,p,rho,T, iter, dt) →
    (rhs_u, rhs_v, rhs_w, rhs_p), nonzero on interior points only."""
    d1x, d1y, d2x, d2y, spacing_ok = spacing_operators(
        grid, dtype, params.nonuniform_scheme)
    inv_2dz, inv_dz2 = z_constants(grid)
    coords = grid.coordinate_arrays(dtype)

    def d1(x):
        return clamp(x, MAX_DERIVATIVE_LIMIT)

    def d2(x):
        return clamp(x, MAX_SECOND_DERIVATIVE_LIMIT)

    def rhs(u, v, w, p, rho, T, iter_idx, dt):
        ul, ur, ud, uu, ub, uf = _periodic_shifts(u)
        vl, vr, vd, vu, vb, vf = _periodic_shifts(v)
        wl, wr, wd, wu, wb, wf = _periodic_shifts(w)
        pl, pr, pd, pu, pb, pf = _periodic_shifts(p)

        du_dx = d1(d1x(ul, u, ur))
        du_dy = d1(d1y(ud, u, uu))
        du_dz = d1((uf - ub) * inv_2dz)
        dv_dx = d1(d1x(vl, v, vr))
        dv_dy = d1(d1y(vd, v, vu))
        dv_dz = d1((vf - vb) * inv_2dz)
        dw_dx = d1(d1x(wl, w, wr))
        dw_dy = d1(d1y(wd, w, wu))
        dw_dz = d1((wf - wb) * inv_2dz)
        dp_dx = d1(d1x(pl, p, pr))
        dp_dy = d1(d1y(pd, p, pu))
        dp_dz = d1((pf - pb) * inv_2dz)

        lap_u = (d2(d2x(ul, u, ur)) + d2(d2y(ud, u, uu))
                 + d2((uf - 2 * u + ub) * inv_dz2))
        lap_v = (d2(d2x(vl, v, vr)) + d2(d2y(vd, v, vu))
                 + d2((vf - 2 * v + vb) * inv_dz2))
        lap_w = (d2(d2x(wl, w, wr)) + d2(d2y(wd, w, wu))
                 + d2((wf - 2 * w + wb) * inv_dz2))

        nu = jnp.minimum(params.mu / jnp.maximum(rho, 1e-10), 1.0)

        su, sv, sw = source_terms(coords, params, iter_idx, dt)
        if params.buoyancy_enabled:
            bu, bv, bw = compute_buoyancy(T, params.beta, params.T_ref,
                                          params.gravity)
            su, sv, sw = su + bu, sv + bv, sw + bw

        rhs_u = (-u * du_dx - v * du_dy - w * du_dz - dp_dx / rho
                 + nu * lap_u + su)
        rhs_v = (-u * dv_dx - v * dv_dy - w * dv_dz - dp_dy / rho
                 + nu * lap_v + sv)
        rhs_w = (-u * dw_dx - v * dw_dy - w * dw_dz - dp_dz / rho
                 + nu * lap_w + sw)

        div = clamp(du_dx + dv_dy + dw_dz, MAX_DIVERGENCE_LIMIT)
        rhs_p = -params.pressure_coupling * rho * div

        # Safety guards zero the RHS (`ns_momentum_rhs_scalar.h:62-76`);
        # k arrays are zero outside the interior (memset + interior loop).
        ok = spacing_ok & (rho > 1e-10)
        mask = stencils.interior_mask(u.shape, dtype=u.dtype) * ok
        return rhs_u * mask, rhs_v * mask, rhs_w * mask, rhs_p * mask

    return rhs


def _make_fused_rk_step(mid, final, params: NSParams, order: int, nz, dtype):
    """Chain the fused stage kernels into a full RK step (see
    `ops/pallas/rk_kernels.py`); exact parity with the jnp body."""

    def pins(state):
        return [jnp.stack([s[nz - 2], s[1]]) for s in state]

    def step(field: FlowField, dt, iter_idx):
        dtc = jnp.asarray(dt, dtype)
        t = jnp.asarray(iter_idx, dtype) * dtc
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

        def scal(factor, acc_mix, weight):
            return jnp.stack([jnp.asarray(factor, dtype),
                              jnp.asarray(acc_mix, dtype),
                              jnp.asarray(weight, dtype), su, sv, dtc,
                              jnp.zeros((), dtype)])

        q0 = (field.u, field.v, field.w, field.p)
        rho, T = field.rho, field.T
        acc0 = tuple(jnp.zeros_like(field.u) for _ in range(4))

        def run_mid(state, acc, factor, weight):
            outs = mid(scal(factor, zero, weight),
                       *state, T, *q0, rho, *acc, *pins(state))
            return tuple(outs[:4]), tuple(outs[4:8])

        if order == 2:
            s1, acc1 = run_mid(q0, acc0, dtc, one)
            outs = final(scal(0.5 * dtc, one, zero),
                         *s1, T, *q0, rho, *acc1, *pins(s1))
        else:
            s1, acc1 = run_mid(q0, acc0, 0.5 * dtc, one)
            s2, acc2 = run_mid(s1, acc1, 0.5 * dtc, 2.0 * one)
            s3, acc3 = run_mid(s2, acc2, dtc, 2.0 * one)
            outs = final(scal(dtc / 6.0, one, zero),
                         *s3, T, *q0, rho, *acc3, *pins(s3))
        u, v, w, p, rho_o, T_o, m2, pmax, pabs, tmax = outs
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho_o, T=T_o)
        finite = jnp.isfinite(m2) & jnp.isfinite(pabs)
        status = jnp.where(finite, jnp.int32(0), jnp.int32(-6))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=jnp.sqrt(m2),
                                     max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def _make_fused_rk2d_step(mid, final, grid: Grid, params: NSParams,
                          order: int, dtype):
    """Chain the fused 2D marching stage kernels (`ops/pallas/rk2d.py`)
    into a full RK step.  The kernels handle the interior stages and the
    X half of the final periodic wrap; the global y-face rows (whose wrap
    sources can live in a different marching block) are restored here —
    periodic on everything (RK wraps velocities too), then T's thermal
    bottom/top faces."""
    from ...boundary.types import thermal_y_specs

    ny = grid.ny
    t_yspec = ("periodic", "periodic")
    if params.energy_enabled:
        t_yspec = thermal_y_specs(params.thermal_bc)

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

    def pins(state):
        # (8, nx): rows 0-3 = (u,v,w,p) at global row ny−2 ("far"),
        # rows 4-7 = the same fields at global row 1 ("near").
        return jnp.concatenate([jnp.stack([s[ny - 2] for s in state]),
                                jnp.stack([s[1] for s in state])])

    def step(field: FlowField, dt, iter_idx):
        dtc = jnp.asarray(dt, dtype)
        t = jnp.asarray(iter_idx, dtype) * dtc
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

        def scal(factor, acc_mix, weight):
            return jnp.stack([jnp.asarray(factor, dtype),
                              jnp.asarray(acc_mix, dtype),
                              jnp.asarray(weight, dtype), su, sv, dtc])

        q0 = (field.u[0], field.v[0], field.w[0], field.p[0])
        rho, T = field.rho[0], field.T[0]
        acc0 = tuple(jnp.zeros_like(q0[0]) for _ in range(4))

        def run_mid(state, acc, factor, weight):
            outs = mid(scal(factor, zero, weight),
                       *state, T, *q0, rho, *acc, pins(state))
            return tuple(outs[:4]), tuple(outs[4:8])

        if order == 2:
            s1, acc1 = run_mid(q0, acc0, dtc, one)
            outs = final(scal(0.5 * dtc, one, zero),
                         *s1, T, *q0, rho, *acc1, pins(s1))
        else:
            s1, acc1 = run_mid(q0, acc0, 0.5 * dtc, one)
            s2, acc2 = run_mid(s1, acc1, 0.5 * dtc, 2.0 * one)
            s3, acc3 = run_mid(s2, acc2, dtc, 2.0 * one)
            outs = final(scal(dtc / 6.0, one, zero),
                         *s3, T, *q0, rho, *acc3, pins(s3))
        u, v, w, p, rho_o, T_o = (o[None] for o in outs)
        u, v, w = wrap_y(u), wrap_y(v), wrap_y(w)
        p, rho_o = wrap_y(p), wrap_y(rho_o)
        T_o = wrap_y(T_o, t_yspec)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho_o, T=T_o)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(finite, jnp.int32(0), jnp.int32(-6))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def _make_rk_step(grid: Grid, params: NSParams, order: int, dtype=None,
                  use_pallas=None, pallas_interpret: bool = False,
                  differentiable: bool = False):
    # The jnp path is reverse-differentiable as-is; differentiable=True
    # pins it unless use_pallas=True is explicit, which pairs the fused
    # stage kernels with the jnp adjoint (`.hybrid.pair_vjp`).
    if differentiable:
        if use_pallas:
            from .hybrid import pair_vjp
            return pair_vjp(
                _make_rk_step(grid, params, order, dtype, use_pallas=True,
                              pallas_interpret=pallas_interpret),
                _make_rk_step(grid, params, order, dtype, use_pallas=False))
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
            from ...ops.pallas.rk2d import make_rk2d_stage
            kw2 = dict(alpha=params.alpha, beta=params.beta,
                       T_ref=params.T_ref, gravity=params.gravity,
                       thermal_bc=params.thermal_bc, stretch=stretch2d,
                       scheme=params.nonuniform_scheme,
                       dtype=dtype, interpret=pallas_interpret)
            mid2 = make_rk2d_stage(grid.ny, grid.nx, grid.dx0, grid.dy0,
                                   grid.xmin, grid.ymin, params.mu,
                                   params.pressure_coupling, final=False,
                                   **kw2)
            fin2 = make_rk2d_stage(grid.ny, grid.nx, grid.dx0, grid.dy0,
                                   grid.xmin, grid.ymin, params.mu,
                                   params.pressure_coupling, final=True,
                                   **kw2)
            if mid2 is not None and fin2 is not None:
                return _make_fused_rk2d_step(mid2, fin2, grid, params,
                                             order, dtype)
    if (use_pallas and dtype == jnp.float32 and grid.nz > 2
            and grid.dz0 > 1e-10
            and params.source_func is None
            and params.heat_source_func is None):
        # z is uniform here (validate_grid_for_solver); stretched x/y
        # coefficients ride pinned VMEM inputs (ops/pallas/stretch.py).
        stretch, fuse_ok = stretch_mode(grid, params)
        if fuse_ok:
            from ...ops.pallas.rk_kernels import make_rk_stage
            kw = dict(alpha=params.alpha, beta=params.beta,
                      T_ref=params.T_ref, gravity=params.gravity,
                      thermal_bc=params.thermal_bc, stretch=stretch,
                      scheme=params.nonuniform_scheme,
                      dtype=dtype, interpret=pallas_interpret)
            mid = make_rk_stage(grid.nz, grid.ny, grid.nx, grid.dx0,
                                grid.dy0, grid.dz0, grid.xmin, grid.ymin,
                                params.mu, params.pressure_coupling,
                                final=False, **kw)
            fin = make_rk_stage(grid.nz, grid.ny, grid.nx, grid.dx0,
                                grid.dy0, grid.dz0, grid.xmin, grid.ymin,
                                params.mu, params.pressure_coupling,
                                final=True, **kw)
            if mid is not None and fin is not None:
                return _make_fused_rk_step(mid, fin, params, order, grid.nz,
                                           dtype)

    rhs = make_momentum_rhs(grid, params, dtype)
    energy_step = make_energy_step(grid, params.alpha, params.heat_source_func,
                                   scheme=params.nonuniform_scheme)

    def stage_state(q0, k, factor):
        """Q = Q⁰ + factor·k with velocity clamping (apply_stage_update,
        `solver_rk4.c:47-63`; identical to the RK2 intermediate)."""
        u0, v0, w0, p0 = q0
        ku, kv, kw, kp = k
        return (clamp(u0 + factor * ku, MAX_VELOCITY_LIMIT),
                clamp(v0 + factor * kv, MAX_VELOCITY_LIMIT),
                clamp(w0 + factor * kw, MAX_VELOCITY_LIMIT),
                p0 + factor * kp)

    def step(field: FlowField, dt, iter_idx):
        q0 = (field.u, field.v, field.w, field.p)
        rho, T = field.rho, field.T

        def K(state):
            return rhs(state[0], state[1], state[2], state[3], rho, T,
                       iter_idx, dt)

        k1 = K(q0)
        if order == 2:
            # Heun: Q ← Q⁰ + (dt/2)(k1 + k2) (`solver_rk2.c` header)
            k2 = K(stage_state(q0, k1, dt))
            ks = jax.tree_util.tree_map(lambda a, b: a + b, k1, k2)
            u_n, v_n, w_n, p_n = stage_state(q0, ks, 0.5 * dt)
        else:
            # Classical RK4 (`solver_rk4.c:152-214`)
            k2 = K(stage_state(q0, k1, 0.5 * dt))
            k3 = K(stage_state(q0, k2, 0.5 * dt))
            k4 = K(stage_state(q0, k3, dt))
            ks = jax.tree_util.tree_map(
                lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
            u_n, v_n, w_n, p_n = stage_state(q0, ks, dt / 6.0)

        new_field = field.replace(u=u_n, v=v_n, w=w_n, p=p_n)

        if energy_step is not None:
            Tn = energy_step(new_field.T, new_field.u, new_field.v,
                             new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=Tn)

        # BCs on the final state only (`solver_rk2.c` stage-BC note).
        new_field = apply_periodic_field(new_field)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(finite, jnp.int32(0), jnp.int32(-6))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=jnp.zeros((), dtype),
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def make_rk2_step(grid: Grid, params: NSParams, dtype=None,
                  use_pallas=None, pallas_interpret: bool = False,
                  differentiable: bool = False):
    return _make_rk_step(grid, params, 2, dtype, use_pallas,
                         pallas_interpret, differentiable)


def make_rk4_step(grid: Grid, params: NSParams, dtype=None,
                  use_pallas=None, pallas_interpret: bool = False,
                  differentiable: bool = False):
    return _make_rk_step(grid, params, 4, dtype, use_pallas,
                         pallas_interpret, differentiable)


def make_rk2_solve(grid: Grid, params: NSParams, dtype=None):
    step = make_rk2_step(grid, params, dtype)

    @jax.jit
    def solve(field: FlowField, dt):
        return iterate_with_divergence_guard(step, field, dt, params.max_iter)

    return solve


def make_rk4_solve(grid: Grid, params: NSParams, dtype=None):
    step = make_rk4_step(grid, params, dtype)

    @jax.jit
    def solve(field: FlowField, dt):
        return iterate_with_divergence_guard(step, field, dt, params.max_iter)

    return solve
