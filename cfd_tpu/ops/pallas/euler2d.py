"""Fused single-pass 2D explicit-Euler kernel (block-marching engine).

The 2D sibling of `euler_kernels.make_euler_fused`: one sweep reads
(u, v, w, p, T) once (±1-row windows) plus rho and emits the complete
post-step state — clamped derivatives, momentum + artificial-pressure
updates (`cpu/solver_explicit_euler.c:337-582` with the inv_dz2 = 0
branch-free 2D idiom), per-point rho guards, the fused energy update and
Boussinesq sources, and the X half of the boundary dance.  The reference's
published performance tables are 2D (`README.md:225-231`); this gives the
explicit-Euler rows the same fused treatment the 2D projection already
has (`projection2d.py`).

Boundary split (the marching engine exposes only neighbor blocks, so the
global y wrap rows — row 0 ↔ row ny−2, row ny−1 ↔ row 1 — can live in a
DIFFERENT block):

* in-kernel: interior masks and the x faces (periodic wrap of p/rho/T,
  thermal L/R for T) — all decided on GLOBAL row indices (``global_ny``
  mode for y-sharding; single-chip global == local);
* at the jnp level (the step wrapper, or the shard_map wrapper's
  edge-to-edge ppermutes): the y-face rows of p/rho/T and T's thermal
  bottom/top faces.  Velocity shells keep the caller's input everywhere
  via the interior mask (wrap-then-restore ≡ passthrough).

Consistency vs the jnp step: tests/math/test_euler2d_fused.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .marching2d import make_marching_stencil_2d, marching2d_supported

_D1_LIMIT = 100.0
_D2_LIMIT = 1000.0
_VEL_LIMIT = 100.0
_DIV_LIMIT = 10.0
_UPDATE_LIMIT = 1.0


def euler2d_supported(ny: int, nx: int, n_stretch_planes: int = 0) -> bool:
    return marching2d_supported(ny, nx, 5, 1 + n_stretch_planes, 6)


def make_euler2d_fused(ny, nx, dx, dy, xmin, ymin,
                       mu: float, pressure_coupling: float,
                       alpha: float = 0.0, beta: float = 0.0,
                       T_ref: float = 0.0, gravity=(0.0, 0.0, 0.0),
                       thermal_bc=None, stretch=None,
                       scheme: str = "parity", dtype=jnp.float32,
                       interpret: bool = False, global_ny=None):
    """Build fn(scalars=(cdt, src_u_eff, src_v_eff[, y_off]),
    u, v, w, p, T, rho) → (u', v', w', p', rho', T'), each (ny, nx),
    or None.  ``global_ny``: y-sharded mode (rows are a halo-padded local
    block; the trailing y_off scalar is the global row of row 0).

    ``stretch``: per-point spacing on stretched x/y grids — the
    ``(dx_arr, dy_arr, x, y)`` tuple (`stretch_gate`).  x-dependent
    weights ride one pinned (8, nx) VMEM input; y-dependent weights ride
    streamed plane inputs (`.stretch.stretch_inputs_2d`).  Single-chip
    the wrapper closes over the numpy inputs; in global-row mode the
    kernel only RESERVES the slots and the shard_map wrapper supplies
    per-shard row slices.  ``scheme="consistent"`` swaps in the exact
    3-point nonuniform weights and supports ``alpha > 0``; parity +
    stretch + energy returns None (`energy_solver.c:55-91`)."""
    consistent = stretch is not None and scheme == "consistent"
    n_yw = 0 if stretch is None else (7 if consistent else 3)
    if not euler2d_supported(ny, nx, n_yw):
        return None
    if stretch is not None and alpha > 0.0 and not consistent:
        return None
    from ...boundary.types import BCType

    sharded_y = global_ny is not None
    gny = ny if global_ny is None else global_ny
    stretch_inputs = ()
    if stretch is not None:
        inv_2dx = inv_2dy = inv_dx2 = inv_dy2 = None
        if not sharded_y:
            from .stretch import stretch_inputs_2d
            dx_arr, dy_arr, x_coords, y_coords = stretch
            xrows, yplanes = stretch_inputs_2d(
                ny, nx, dx_arr, dy_arr, x_coords, y_coords, scheme,
                np_dtype=jnp.zeros((), dtype).dtype)
            stretch_inputs = (*yplanes, xrows)
    else:
        inv_2dx = 1.0 / (2.0 * dx)
        inv_2dy = 1.0 / (2.0 * dy)
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
    energy_on = alpha > 0.0
    buoy_on = beta != 0.0

    def clampv(a, lim):
        return jnp.clip(a, -dtype(lim), dtype(lim))

    def shx(a, sign):
        return jnp.roll(a, -sign, axis=1)

    def compute(row0, scalars, halos, planes, pinned=None):
        if sharded_y:
            cdt, su_amp, sv_amp, y_off = scalars
            row0 = row0 + y_off.astype(jnp.int32)
        else:
            cdt, su_amp, sv_amp = scalars
        rho = planes[0]
        B = halos[0][1].shape[0]

        def ext(h):
            """(B+2)-row window [row0−1, row0+B+1) from the resident
            neighbor blocks (the first/last global block's outer rows are
            uninitialized VMEM — every consumer where-selects them)."""
            m, c, p = h
            return jnp.concatenate([m[-1:], c, p[:1]], axis=0)

        ue, ve, we, pe, Te = (ext(h) for h in halos[:5])
        uc, vc, wc, pc, Tc = (e[1:-1] for e in (ue, ve, we, pe, Te))

        # Iotas at (B, nx) directly — building (B+2, nx) and slicing
        # [1:-1] crashes Mosaic's ApplyVectorLayout on real hardware
        # ("Check failed: limits[i] <= dim(i)"); interpret mode can't see
        # it.  Bisected /tmp-style on-chip, 2026-08-18.
        jg = row0 + jax.lax.broadcasted_iota(jnp.int32, (B, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (B, nx), 1)
        maskb = (jg > 0) & (jg < gny - 1) & (ii > 0) & (ii < nx - 1)

        if stretch is None:
            c2x, cx2, sx2 = inv_2dx, inv_dx2, None
            c2y, cy2, sy = inv_2dy, inv_dy2, None
        elif consistent:
            wym, wyc, wyp, lym, lyc, lyp, sy = planes[1:8]
            (xpin,) = pinned
            wxm, wxc, wxp, lxm, lxc, lxp, sx2 = (
                xpin[r:r + 1] for r in range(7))
        else:
            c2y, cy2, sy = planes[1:4]
            (xpin,) = pinned
            c2x, cx2, sx2 = (xpin[r:r + 1] for r in range(3))

        if consistent:
            def d1x(e):
                c = e[1:-1]
                return clampv(shx(c, -1) * wxm + c * wxc
                              + shx(c, 1) * wxp, _D1_LIMIT)

            def d1y(e):
                return clampv(e[:-2] * wym + e[1:-1] * wyc
                              + e[2:] * wyp, _D1_LIMIT)

            def lap_clamped(e):
                c = e[1:-1]
                return (clampv(shx(c, -1) * lxm + c * lxc
                               + shx(c, 1) * lxp, _D2_LIMIT)
                        + clampv(e[:-2] * lym + c * lyc
                                 + e[2:] * lyp, _D2_LIMIT))
        else:
            def d1x(e):
                c = e[1:-1]
                return clampv((shx(c, 1) - shx(c, -1)) * c2x, _D1_LIMIT)

            def d1y(e):
                return clampv((e[2:] - e[:-2]) * c2y, _D1_LIMIT)

            def lap_clamped(e):
                c = e[1:-1]
                return (clampv((shx(c, 1) - 2.0 * c + shx(c, -1)) * cx2,
                               _D2_LIMIT)
                        + clampv((e[2:] - 2.0 * c + e[:-2]) * cy2,
                                 _D2_LIMIT))

        du_dx, du_dy = d1x(ue), d1y(ue)
        dv_dx, dv_dy = d1x(ve), d1y(ve)
        dw_dx, dw_dy = d1x(we), d1y(we)
        dp_dx, dp_dy = d1x(pe), d1y(pe)

        nu = jnp.minimum(dtype(mu) / jnp.maximum(rho, dtype(1e-10)),
                         dtype(1.0))
        if stretch is None:
            y = ymin + jg.astype(dtype) * dtype(dy)
            x = xmin + ii.astype(dtype) * dtype(dx)
            sy = jnp.sin(jnp.asarray(jnp.pi, dtype) * y)
            sx2 = jnp.sin(jnp.asarray(2.0 * jnp.pi, dtype) * x)
        su = su_amp * sy
        sv = sv_amp * sx2
        sw = jnp.zeros((), dtype)
        if buoy_on:
            dT = Tc - dtype(T_ref)
            su = su + (-dtype(beta) * dtype(gravity[0])) * dT
            sv = sv + (-dtype(beta) * dtype(gravity[1])) * dT
            sw = sw + (-dtype(beta) * dtype(gravity[2])) * dT

        du = cdt * (-uc * du_dx - vc * du_dy - dp_dx / rho
                    + nu * lap_clamped(ue) + su)
        dv = cdt * (-uc * dv_dx - vc * dv_dy - dp_dy / rho
                    + nu * lap_clamped(ve) + sv)
        dw = cdt * (-uc * dw_dx - vc * dw_dy
                    + nu * lap_clamped(we) + sw)

        u_new = clampv(uc + clampv(du, _UPDATE_LIMIT), _VEL_LIMIT)
        v_new = clampv(vc + clampv(dv, _UPDATE_LIMIT), _VEL_LIMIT)
        w_new = clampv(wc + clampv(dw, _UPDATE_LIMIT), _VEL_LIMIT)

        divergence = clampv(du_dx + dv_dy, _DIV_LIMIT)
        dp = clampv(-dtype(pressure_coupling) * cdt * rho * divergence,
                    _UPDATE_LIMIT)

        ok = maskb & (rho > dtype(1e-10))
        u_out = jnp.where(ok, u_new, uc)
        v_out = jnp.where(ok, v_new, vc)
        w_out = jnp.where(ok, w_new, wc)
        p_upd = jnp.where(ok, pc + dp, pc)

        # Energy: T advected by the UPDATED velocities, interior-only and
        # unguarded (`energy_solver.c:120-160`; w·dT/dz ≡ 0 in 2D).
        if energy_on:
            Txm, Txp = shx(Tc, -1), shx(Tc, 1)
            Tym, Typ = Te[:-2], Te[2:]
            if consistent:
                # unclamped consistent stencils, term order matching the
                # jnp `energy.make_energy_step` stretched branch
                dT_dx = Txm * wxm + Tc * wxc + Txp * wxp
                dT_dy = Tym * wym + Tc * wyc + Typ * wyp
                lapT = (Txm * lxm + Tc * lxc + Txp * lxp
                        + Tym * lym + Tc * lyc + Typ * lyp)
            else:
                dT_dx = (Txp - Txm) * inv_2dx
                dT_dy = (Typ - Tym) * inv_2dy
                lapT = ((Txp - 2.0 * Tc + Txm) * inv_dx2
                        + (Typ - 2.0 * Tc + Tym) * inv_dy2)
            adv = u_out * dT_dx + v_out * dT_dy
            T_upd = jnp.where(maskb,
                              Tc + cdt * (-adv + dtype(alpha) * lapT), Tc)
        else:
            T_upd = Tc

        # X half of the boundary dance: periodic x faces of p/rho/T (the
        # y faces are wrapper-restored — their wrap rows can live in a
        # different block/shard).  Velocities keep their input faces via
        # the interior mask above.
        def xwrap(q):
            q = jnp.where(ii == 0, shx(q, -2), q)
            return jnp.where(ii == nx - 1, shx(q, 2), q)

        p_out = xwrap(p_upd)
        rho_out = xwrap(rho)
        T_out = xwrap(T_upd)
        if energy_on:
            v_ = thermal_bc.dirichlet_values
            for bc, where_mask, neumann_src, value in (
                    (thermal_bc.left, ii == 0, shx(T_out, 1), v_.left),
                    (thermal_bc.right, ii == nx - 1, shx(T_out, -1),
                     v_.right)):
                bc = BCType(bc)
                if bc == BCType.PERIODIC:
                    continue
                src = (jnp.full_like(T_out, dtype(value))
                       if bc == BCType.DIRICHLET else neumann_src)
                T_out = jnp.where(where_mask, src, T_out)
        return [u_out, v_out, w_out, p_out, rho_out, T_out]

    run = make_marching_stencil_2d(
        ny, nx, 5, 1 + n_yw, 6, compute, dtype,
        n_scalars=4 if sharded_y else 3,
        n_pinned=1 if stretch is not None else 0, interpret=interpret)
    if run is None or not stretch_inputs:
        return run

    def with_stretch(scalars, u, v, w, p, T, rho):
        return run(scalars, u, v, w, p, T, rho, *stretch_inputs)

    return with_stretch
