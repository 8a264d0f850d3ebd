"""Fused RK2/RK4 stage kernels for 2D grids (block-marching engine).

The 2D sibling of `rk_kernels.make_rk_stage`: each RK stage is ONE
marching pass that reads the stage state (±1-row windows), the step-start
state q0, rho, T, and the running k-accumulator, and emits the next stage
state plus the updated accumulator

    k      = RHS(stage state)          (periodic-interior stencils,
                                        `momentum_rhs/ns_momentum_rhs_scalar.h:49-120`
                                        with the inv_dz2 = 0 branch-free 2D idiom)
    next   = clamp(q0 + factor·(acc_mix·acc + k))   [velocities ±100]
    acc'   = acc + weight·k

With (factor, acc_mix, weight) scalars one kernel covers every Butcher
position; the final stage (`final=True`) emits the FINISHED state — the
fused energy update (T advected by the final velocities), the x half of
the periodic wrap on ALL variables (RK applies periodic BCs to the final
state only, velocities included — `solver_rk2.c` stage-BC note), and T's
thermal left/right faces.  The global y-face rows are wrapper-restored
(their wrap sources can live in a different marching block / shard).

Periodic-interior y-wrap rows: at global row 1 the down-neighbor is row
gny−2 and at row gny−2 the up-neighbor is row 1 (`:78-90`) — rows that
live in non-neighboring marching blocks, so they ride ONE pinned VMEM
input of shape (8, nx): rows 0-3 = (u,v,w,p) at global row gny−2 ("far"),
rows 4-7 = (u,v,w,p) at global row 1 ("near").  In x the wrap stays
in-row (masked 3-lane circular shifts).

``global_ny``: y-sharded mode — rows are a halo-padded local block and
the trailing ``y_off`` scalar is the global row index of local row 0; all
row decisions (interior mask, wrap substitutions, source coordinates,
thermal faces) key on global rows.  The wrapper supplies the pin rows
(broadcast across shards) and restores the y faces cross-shard.

Consistency vs the jnp step: tests/math/test_rk2d_fused.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .marching2d import make_marching_stencil_2d, marching2d_supported

_D1_LIMIT = 100.0
_D2_LIMIT = 1000.0
_VEL_LIMIT = 100.0
_DIV_LIMIT = 10.0


def rk2d_supported(ny: int, nx: int, n_stretch_planes: int = 0) -> bool:
    # worst case (mid stage): 5 halos, 9 planes (+stretch), 8 outs
    return marching2d_supported(ny, nx, 5, 9 + n_stretch_planes, 8)


def make_rk2d_stage(ny, nx, dx, dy, xmin, ymin,
                    mu: float, pressure_coupling: float, final: bool,
                    alpha: float = 0.0, beta: float = 0.0,
                    T_ref: float = 0.0, gravity=(0.0, 0.0, 0.0),
                    thermal_bc=None, stretch=None, scheme: str = "parity",
                    dtype=jnp.float32,
                    interpret: bool = False, global_ny=None):
    """Build one 2D RK stage pass.

    final=False: fn(scalars=(factor, acc_mix, weight, su, sv, cdt[, y_off]),
                    u, v, w, p, T, q0u, q0v, q0w, q0p, rho,
                    accu, accv, accw, accp, wrap_pins) →
                 (next_u, next_v, next_w, next_p, acc_u', …, acc_p')
    final=True:  same inputs → (u, v, w, p, rho, T)

    All marched fields are (ny, nx); ``wrap_pins`` is (8, nx) — see module
    docstring.  Returns None when unsupported.

    ``stretch``/``scheme``: per-point spacing on stretched x/y grids —
    same input design as `euler2d.make_euler2d_fused` (pinned x-row
    weights + streamed y-weight planes, `.stretch.stretch_inputs_2d`).
    Single-chip the stage binds the numpy inputs internally (callers keep
    the uniform signature); in global-row mode the kernel only RESERVES
    the slots and the shard_map wrapper passes per-shard slices as
    ``(..., *yplanes, wrap_pins, xrows)``.  Energy + stretch requires
    ``scheme="consistent"`` (returns None otherwise)."""
    consistent = stretch is not None and scheme == "consistent"
    n_yw = 0 if stretch is None else (7 if consistent else 3)
    if not rk2d_supported(ny, nx, n_yw):
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
            stretch_inputs = (yplanes, xrows)
    else:
        inv_2dx = 1.0 / (2.0 * dx)
        inv_2dy = 1.0 / (2.0 * dy)
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
    energy_on = final and alpha > 0.0
    buoy_on = beta != 0.0

    def clampv(a, lim):
        return jnp.clip(a, -dtype(lim), dtype(lim))

    def shx(a, sign):
        return jnp.roll(a, -sign, axis=1)

    def compute(row0, scalars, halos, planes, pinned):
        if sharded_y:
            factor, acc_mix, weight, su_amp, sv_amp, cdt, y_off = scalars
            row0 = row0 + y_off.astype(jnp.int32)
        else:
            factor, acc_mix, weight, su_amp, sv_amp, cdt = scalars
        (q0u, q0v, q0w, q0p, rho, accu, accv, accw, accp) = planes[:9]
        wrap = pinned[0]
        B = halos[0][1].shape[0]
        if stretch is None:
            sy = sx2 = None
        elif consistent:
            wym, wyc, wyp, lym, lyc, lyp, sy = planes[9:16]
            xpin = pinned[1]
            wxm, wxc, wxp, lxm, lxc, lxp, sx2 = (
                xpin[r:r + 1] for r in range(7))
        else:
            c2y, cy2, sy = planes[9:12]
            xpin = pinned[1]
            c2x, cx2, sx2 = (xpin[r:r + 1] for r in range(3))

        def ext(h):
            """(B+2)-row window [row0−1, row0+B+1) — the first/last global
            block's outer rows are uninitialized VMEM; every consumer
            where-selects them."""
            m, c, p = h
            return jnp.concatenate([m[-1:], c, p[:1]], axis=0)

        ue, ve, we, pe, Te = (ext(h) for h in halos)
        Tc = Te[1:-1]

        # Iotas at (B, nx) directly — building (B+2, nx) and slicing
        # [1:-1] crashes Mosaic's ApplyVectorLayout on real hardware
        # ("Check failed: limits[i] <= dim(i)"); interpret mode can't see
        # it.
        jg = row0 + jax.lax.broadcasted_iota(jnp.int32, (B, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (B, nx), 1)
        maskb = (jg > 0) & (jg < gny - 1) & (ii > 0) & (ii < nx - 1)

        def neighbors(e, pin_far, pin_near):
            """Periodic-interior 4-neighborhood of one stage field
            (`ns_momentum_rhs_scalar.h:78-90`): x wraps in-row, the y wrap
            rows come from the pinned input."""
            c = e[1:-1]
            xl = jnp.where(ii == 1, shx(c, -3), shx(c, -1))
            xr = jnp.where(ii == nx - 2, shx(c, 3), shx(c, 1))
            yd = jnp.where(jg == 1, pin_far, e[:-2])
            yu = jnp.where(jg == gny - 2, pin_near, e[2:])
            return c, xl, xr, yd, yu

        u, ul, ur, ud, uu = neighbors(ue, wrap[0], wrap[4])
        v, vl, vr, vd, vu = neighbors(ve, wrap[1], wrap[5])
        w, wl, wr, wd, wu = neighbors(we, wrap[2], wrap[6])
        p, pl_, pr_, pd_, pu_ = neighbors(pe, wrap[3], wrap[7])

        def d1(a):
            return clampv(a, _D1_LIMIT)

        def d2(a):
            return clampv(a, _D2_LIMIT)

        if consistent:
            def d1x_(l, c, r):
                return d1(l * wxm + c * wxc + r * wxp)

            def d1y_(lo, c, hi):
                return d1(lo * wym + c * wyc + hi * wyp)

            def lap_(l, c, r, lo, hi):
                return (d2(l * lxm + c * lxc + r * lxp)
                        + d2(lo * lym + c * lyc + hi * lyp))
        else:
            c2x_ = inv_2dx if stretch is None else c2x
            c2y_ = inv_2dy if stretch is None else c2y
            cx2_ = inv_dx2 if stretch is None else cx2
            cy2_ = inv_dy2 if stretch is None else cy2

            def d1x_(l, c, r):
                return d1((r - l) * c2x_)

            def d1y_(lo, c, hi):
                return d1((hi - lo) * c2y_)

            def lap_(l, c, r, lo, hi):
                return (d2((r - 2 * c + l) * cx2_)
                        + d2((hi - 2 * c + lo) * cy2_))

        du_dx = d1x_(ul, u, ur)
        du_dy = d1y_(ud, u, uu)
        dv_dx = d1x_(vl, v, vr)
        dv_dy = d1y_(vd, v, vu)
        dw_dx = d1x_(wl, w, wr)
        dw_dy = d1y_(wd, w, wu)
        dp_dx = d1x_(pl_, p, pr_)
        dp_dy = d1y_(pd_, p, pu_)

        lap_u = lap_(ul, u, ur, ud, uu)
        lap_v = lap_(vl, v, vr, vd, vu)
        lap_w = lap_(wl, w, wr, wd, wu)

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

        # Shell rows read uninitialized window rows — select, never
        # mask-multiply (0·NaN = NaN; marching2d docstring).
        ok = maskb & (rho > dtype(1e-10))
        zero = jnp.zeros((), dtype)
        ku = jnp.where(ok, -u * du_dx - v * du_dy - dp_dx / rho
                       + nu * lap_u + su, zero)
        kv = jnp.where(ok, -u * dv_dx - v * dv_dy - dp_dy / rho
                       + nu * lap_v + sv, zero)
        kw = jnp.where(ok, -u * dw_dx - v * dw_dy
                       + nu * lap_w + sw, zero)
        div = clampv(du_dx + dv_dy, _DIV_LIMIT)
        kp = jnp.where(ok, -dtype(pressure_coupling) * rho * div, zero)

        next_u = clampv(q0u + factor * (acc_mix * accu + ku), _VEL_LIMIT)
        next_v = clampv(q0v + factor * (acc_mix * accv + kv), _VEL_LIMIT)
        next_w = clampv(q0w + factor * (acc_mix * accw + kw), _VEL_LIMIT)
        next_p = q0p + factor * (acc_mix * accp + kp)

        if not final:
            return [next_u, next_v, next_w, next_p,
                    accu + weight * ku, accv + weight * kv,
                    accw + weight * kw, accp + weight * kp]

        # Energy (final stage only): T advected by the FINAL velocities,
        # plain stencils, interior-only (`solver_rk2.c` post-step order).
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
            adv = next_u * dT_dx + next_v * dT_dy
            T_upd = jnp.where(maskb,
                              Tc + cdt * (-adv + dtype(alpha) * lapT), Tc)
        else:
            T_upd = Tc

        # X half of the periodic wrap, ALL variables (RK wraps velocities
        # too); y faces are wrapper-restored.
        def xwrap(q):
            q = jnp.where(ii == 0, shx(q, -2), q)
            return jnp.where(ii == nx - 1, shx(q, 2), q)

        u_out, v_out, w_out = xwrap(next_u), xwrap(next_v), xwrap(next_w)
        p_out, rho_out, T_out = xwrap(next_p), xwrap(rho), xwrap(T_upd)
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
        ny, nx, 5, 9 + n_yw, 6 if final else 8, compute, dtype,
        n_scalars=7 if sharded_y else 6,
        n_pinned=1 if stretch is None else 2,
        interpret=interpret)
    if run is None or not stretch_inputs:
        return run
    yplanes, xrows = stretch_inputs

    def with_stretch(scalars, u, v, w, p, T, q0u, q0v, q0w, q0p, rho,
                     accu, accv, accw, accp, wrap_pins):
        return run(scalars, u, v, w, p, T, q0u, q0v, q0w, q0p, rho,
                   accu, accv, accw, accp, *yplanes, wrap_pins, xrows)

    return with_stretch
