"""Fused RK2/RK4 stage kernels (3D rolling-plane, one pass per stage).

The jnp RK path (`solvers/ns/rk.py`, mirroring `cpu/solver_rk{2,4}.c` +
`momentum_rhs/ns_momentum_rhs_scalar.h`) evaluates the momentum RHS with
~30 roll-sweeps per stage.  Here each stage is ONE streaming pass that
reads the stage state (halo windows), the step-start state q0, rho/T, and
the running k-accumulator, and emits the next stage state plus the updated
accumulator:

    k      = RHS(stage state)          (periodic-interior stencils)
    next   = clamp(q0 + factor·(acc_mix·acc + k))   [velocities ±100]
    acc'   = acc + weight·k

With (factor, acc_mix, weight) scalars this one kernel covers every
Butcher position: intermediate stages use acc_mix=0, the final stage uses
acc_mix=1 with factor dt/6 (RK4) or dt/2 (RK2) and emits the FINISHED
state — including the full periodic boundary wrap (in-plane here, z-faces
via the engine's ``shell_periodic``), rho/T wrap, and the step's fused
max-reduction diagnostics.

Periodic-interior stencils (`ns_momentum_rhs_scalar.h:78-90`): at i==1 the
left neighbor is nx−2 and at i==nx−2 the right is 1 — expressed as masked
3-lane shifts in-plane; the z wrap neighbors (planes nz−2 and 1 of the
stage state) ride the engine's pinned inputs since the streaming window
can't see the far end of the array.

Boussinesq buoyancy enters every stage's sources; the energy equation
(T advected by the FINAL velocities, `solver_rk*.c` post-step order) and
the per-face thermal BCs fuse into the final-stage pass, exactly as in
the fused Euler kernel.

Gating matches the fused Euler kernel: float32, uniform z, nz ≥ 3,
aligned dims, default sources, no custom heat source; stretched x/y via
pinned coefficient planes (parity 3 pins, consistent 7 — consistent
also carries the energy equation on stretched grids).  Consistency vs
the jnp step: tests/math/test_rk_fused.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rolling import make_rolling_stencil, plane_masks, rolling_supported, \
    shift_x, shift_y

_D1_LIMIT = 100.0
_D2_LIMIT = 1000.0
_VEL_LIMIT = 100.0
_DIV_LIMIT = 10.0


def rk_kernel_supported(nz: int, ny: int, nx: int,
                        n_coef_pins: int = 0) -> bool:
    # worst case (final stage): 5 halos, 9 planes, 6 outs + 6 shell
    # snapshots + 4 z-wrap pins + any stretch coefficient pins
    # (`solvers.ns.common.stretch_pin_count`)
    return rolling_supported(nz, ny, nx, 5, 9, 6 + 6 + 4 + n_coef_pins)


def make_rk_stage(nz, ny, nx, dx, dy, dz, xmin, ymin,
                  mu: float, pressure_coupling: float, final: bool,
                  alpha: float = 0.0, beta: float = 0.0,
                  T_ref: float = 0.0, gravity=(0.0, 0.0, 0.0),
                  thermal_bc=None, global_nz=None, global_ny=None,
                  stretch=None, scheme: str = "parity",
                  dtype=jnp.float32, interpret: bool = False):
    """Build one RK stage pass.

    ``global_nz``: sharded mode — the kernel operates on a halo-padded
    local block; scalar 7 (z_offset) is the global plane index of padded
    plane 0, so the periodic-interior z-wrap substitutions land on the
    GLOBAL k = 1 and k = global_nz − 2 planes.  Single-chip: omit (the
    wrapper passes z_offset = −1 so global k == local k).

    ``global_ny``: (z, y) 2D-mesh mode — ``ny`` is the local y-padded row
    count, a trailing ``y_off`` scalar (appended after z_offset) gives
    the global row of padded row 0.  The y periodic-interior
    substitutions key on global
    rows and resolve INSIDE the 4-row halo *provided the wrapper's y-halo
    exchange is a periodic ring* (the wraparound pair carries global rows
    ny−4..ny−1 to the first shard and 0..3 to the last, so shift ∓3 at
    global rows 1 / ny−2 lands on ny−2 / 1 exactly as the single-chip
    circular roll does).  The y boundary dance (periodic face rows /
    thermal y faces) is wrapper-restored.  With ``stretch`` the kernel
    only RESERVES the coefficient pins — the wrapper appends per-shard
    local row slices of the global pin planes after the wrap pins.

    final=False: fn(scalars=(factor, acc_mix, weight, su, sv, cdt,
                    z_offset),
                    u, v, w, p, T, q0u, q0v, q0w, q0p, rho,
                    accu, accv, accw, accp, pin_u, pin_v, pin_w, pin_p)
                 → (next_u, next_v, next_w, next_p,
                    acc_u', acc_v', acc_w', acc_p')
    final=True:  same inputs → (u, v, w, p, rho, T,
                                m2max, pmax, pabsmax, tmax)
    Pinned inputs are (2, ny, nx): [plane nz−2, plane 1] of each stage-
    state halo field.  ``stretch``: per-point x/y spacing on stretched
    grids — a ``(dx_arr, dy_arr, x_coords, y_coords)`` numpy tuple; the
    coefficient/source-basis planes ride three extra pinned inputs
    (`.stretch.stretch_pins`), or seven with ``scheme="consistent"``
    (exact 3-point nonuniform weights,
    `.stretch.stretch_pins_consistent` — the only mode that permits
    ``alpha > 0`` on stretched grids).  Returns None when unsupported.
    """
    consistent = stretch is not None and scheme == "consistent"
    n_coef = 0 if stretch is None else (7 if consistent else 3)
    if not rk_kernel_supported(nz, ny, nx, n_coef):
        return None
    sharded_y = global_ny is not None
    if stretch is not None and alpha > 0.0 and not consistent:
        # parity + stretched + energy is invalid (energy_solver.c:55-91)
        return None
    from ...boundary.types import BCType
    coef_pins = ()
    if stretch is not None:
        if sharded_y:
            # (z, y) mode: the caller appends per-shard LOCAL coefficient
            # pin slices after the wrap pins at call time.
            inv_2dx = inv_2dy = inv_dx2 = inv_dy2 = None
        else:
            from .stretch import stretch_pins, stretch_pins_consistent
            dx_arr, dy_arr, x_coords, y_coords = stretch
            mk = stretch_pins_consistent if consistent else stretch_pins
            coef_pins = mk(ny, nx, dx_arr, dy_arr, x_coords, y_coords,
                           np_dtype=jnp.zeros((), dtype).dtype)
            inv_2dx = inv_2dy = inv_dx2 = inv_dy2 = None  # pins in-body
    else:
        inv_2dx = 1.0 / (2.0 * dx)
        inv_2dy = 1.0 / (2.0 * dy)
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
    inv_2dz = 1.0 / (2.0 * dz)
    inv_dz2 = 1.0 / (dz * dz)

    def clampv(a, lim):
        return jnp.clip(a, -dtype(lim), dtype(lim))

    def source_planes(y_off=None):
        jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        jjf = jj.astype(dtype) if y_off is None else jj.astype(dtype) + y_off
        y = ymin + jjf * dtype(dy)
        x = xmin + ii.astype(dtype) * dtype(dx)
        return (jnp.sin(jnp.asarray(jnp.pi, dtype) * y),
                jnp.sin(jnp.asarray(2.0 * jnp.pi, dtype) * x))

    def periodic_wrap(q, jj, ii):
        # global-row mode skips y faces (wrapper-restored cross-shard)
        q = jnp.where(ii == 0, shift_x(q, -2), q)
        q = jnp.where(ii == nx - 1, shift_x(q, 2), q)
        if sharded_y:
            return q
        q2 = jnp.where(jj == 0, shift_y(q, -2, ny), q)
        q2 = jnp.where(jj == ny - 1, shift_y(q, 2, ny), q2)
        return q2

    energy_on = final and alpha > 0.0
    buoy_on = beta != 0.0

    def thermal_faces(q, jj, ii):
        v = thermal_bc.dirichlet_values
        faces = [
            (thermal_bc.left, ii == 0, shift_x(q, 1), v.left),
            (thermal_bc.right, ii == nx - 1, shift_x(q, -1), v.right),
        ]
        if not sharded_y:   # y faces are wrapper-restored in global mode
            faces += [
                (thermal_bc.bottom, jj == 0, None, v.bottom),
                (thermal_bc.top, jj == ny - 1, None, v.top),
            ]
        for i, (bc, where_mask, neumann_src, value) in enumerate(faces):
            bc = BCType(bc)
            if bc == BCType.PERIODIC:
                continue
            if neumann_src is None:
                neumann_src = shift_y(q, 1 if i == 2 else -1, ny)
            src = (jnp.full((ny, nx), dtype(value), dtype)
                   if bc == BCType.DIRICHLET else neumann_src)
            q = jnp.where(where_mask, src, q)
        return q

    gnz = nz if global_nz is None else global_nz
    gny = ny if global_ny is None else global_ny

    def compute(k, scalars, halos, planes, pinned):
        if sharded_y:
            (factor, acc_mix, weight, src_u_eff, src_v_eff, cdt,
             z_off, y_off) = scalars
        else:
            (factor, acc_mix, weight, src_u_eff, src_v_eff, cdt,
             z_off) = scalars
            y_off = None
        gk = k + z_off.astype(jnp.int32)   # global plane index
        mask, jj, ii = plane_masks(ny, nx, dtype)
        if sharded_y:
            # interior + wrap substitutions decided on GLOBAL rows;
            # halo-row outputs are discarded by the wrapper
            jj = jj + y_off.astype(jnp.int32)
            maskb = ((jj > 0) & (jj < gny - 1) & (ii > 0) & (ii < nx - 1))
        else:
            maskb = mask > 0
        (q0u, q0v, q0w, q0p, rho, accu, accv, accw, accp) = planes
        (Tm, Tc, Tp) = halos[4]
        T = Tc
        if consistent:
            ((wxm, wxp), (wxc, lxc), (lxm, lxp),
             (wym, wyp), (wyc, lyc), (lym, lyp), (sy, sx2)) = pinned[4:11]

            def dx1(fm, fc, fp):
                return fm * wxm + fc * wxc + fp * wxp

            def dy1(fm, fc, fp):
                return fm * wym + fc * wyc + fp * wyp

            def dx2(fm, fc, fp):
                return fm * lxm + fc * lxc + fp * lxp

            def dy2(fm, fc, fp):
                return fm * lym + fc * lyc + fp * lyp
        else:
            if stretch is not None:
                (c2x, cx2), (c2y, cy2), (sy, sx2) = pinned[4:7]
            else:
                c2x, cx2, c2y, cy2 = inv_2dx, inv_dx2, inv_2dy, inv_dy2
                sy, sx2 = source_planes(y_off)

            def dx1(fm, fc, fp):
                return (fp - fm) * c2x

            def dy1(fm, fc, fp):
                return (fp - fm) * c2y

            def dx2(fm, fc, fp):
                return (fp - 2 * fc + fm) * cx2

            def dy2(fm, fc, fp):
                return (fp - 2 * fc + fm) * cy2

        def neighbors(h, pin):
            """Periodic-interior 6-neighborhood of one stage field."""
            (zm, c, zp) = h
            wrap_far, wrap_near = pin   # planes nz−2 and 1
            xl = jnp.where(ii == 1, shift_x(c, -3), shift_x(c, -1))
            xr = jnp.where(ii == nx - 2, shift_x(c, 3), shift_x(c, 1))
            yd = jnp.where(jj == 1, shift_y(c, -3, ny), shift_y(c, -1, ny))
            yu = jnp.where(jj == gny - 2, shift_y(c, 3, ny),
                           shift_y(c, 1, ny))
            zmm = jnp.where(gk == 1, wrap_far, zm)
            zpp = jnp.where(gk == gnz - 2, wrap_near, zp)
            return c, xl, xr, yd, yu, zmm, zpp

        u, ul, ur, ud, uu, ub, uf = neighbors(halos[0], pinned[0])
        v, vl, vr, vd, vu, vb, vf = neighbors(halos[1], pinned[1])
        w, wl, wr, wd, wu, wb, wf = neighbors(halos[2], pinned[2])
        p, pl_, pr_, pd_, pu_, pb_, pf_ = neighbors(halos[3], pinned[3])

        def d1(a):
            return clampv(a, _D1_LIMIT)

        def d2(a):
            return clampv(a, _D2_LIMIT)

        du_dx = d1(dx1(ul, u, ur))
        du_dy = d1(dy1(ud, u, uu))
        du_dz = d1((uf - ub) * inv_2dz)
        dv_dx = d1(dx1(vl, v, vr))
        dv_dy = d1(dy1(vd, v, vu))
        dv_dz = d1((vf - vb) * inv_2dz)
        dw_dx = d1(dx1(wl, w, wr))
        dw_dy = d1(dy1(wd, w, wu))
        dw_dz = d1((wf - wb) * inv_2dz)
        dp_dx = d1(dx1(pl_, p, pr_))
        dp_dy = d1(dy1(pd_, p, pu_))
        dp_dz = d1((pf_ - pb_) * inv_2dz)

        lap_u = (d2(dx2(ul, u, ur))
                 + d2(dy2(ud, u, uu))
                 + d2((uf - 2 * u + ub) * inv_dz2))
        lap_v = (d2(dx2(vl, v, vr))
                 + d2(dy2(vd, v, vu))
                 + d2((vf - 2 * v + vb) * inv_dz2))
        lap_w = (d2(dx2(wl, w, wr))
                 + d2(dy2(wd, w, wu))
                 + d2((wf - 2 * w + wb) * inv_dz2))

        nu = jnp.minimum(dtype(mu) / jnp.maximum(rho, dtype(1e-10)),
                         dtype(1.0))
        su = src_u_eff * sy
        sv = src_v_eff * sx2
        sw = jnp.zeros((), dtype)
        if buoy_on:
            dT = Tc - dtype(T_ref)
            su = su + (-dtype(beta) * dtype(gravity[0])) * dT
            sv = sv + (-dtype(beta) * dtype(gravity[1])) * dT
            sw = sw + (-dtype(beta) * dtype(gravity[2])) * dT

        ok = maskb & (rho > dtype(1e-10))
        okf = ok.astype(dtype)
        ku = (-u * du_dx - v * du_dy - w * du_dz - dp_dx / rho
              + nu * lap_u + su) * okf
        kv = (-u * dv_dx - v * dv_dy - w * dv_dz - dp_dy / rho
              + nu * lap_v + sv) * okf
        kw = (-u * dw_dx - v * dw_dy - w * dw_dz - dp_dz / rho
              + nu * lap_w + sw) * okf
        div = clampv(du_dx + dv_dy + dw_dz, _DIV_LIMIT)
        kp = (-dtype(pressure_coupling) * rho * div) * okf

        eu = factor * (acc_mix * accu + ku)
        ev = factor * (acc_mix * accv + kv)
        ew = factor * (acc_mix * accw + kw)
        ep = factor * (acc_mix * accp + kp)
        next_u = clampv(q0u + eu, _VEL_LIMIT)
        next_v = clampv(q0v + ev, _VEL_LIMIT)
        next_w = clampv(q0w + ew, _VEL_LIMIT)
        next_p = q0p + ep

        if not final:
            return ([next_u, next_v, next_w, next_p,
                     accu + weight * ku, accv + weight * kv,
                     accw + weight * kw, accp + weight * kp], None)

        # Energy (final stage only): T advected by the FINAL velocities,
        # interior-only (`solver_rk2.c` post-step order).
        if energy_on:
            Txm, Txp = shift_x(Tc, -1), shift_x(Tc, 1)
            Tym, Typ = shift_y(Tc, -1, ny), shift_y(Tc, 1, ny)
            if consistent:
                # unclamped consistent stencils (jnp stretched-branch order)
                dT_dx = Txm * wxm + Tc * wxc + Txp * wxp
                dT_dy = Tym * wym + Tc * wyc + Typ * wyp
                lapT = (Txm * lxm + Tc * lxc + Txp * lxp
                        + Tym * lym + Tc * lyc + Typ * lyp
                        + (Tp - 2.0 * Tc + Tm) * inv_dz2)
            else:
                dT_dx = (Txp - Txm) * inv_2dx
                dT_dy = (Typ - Tym) * inv_2dy
                lapT = ((Txp - 2.0 * Tc + Txm) * inv_dx2
                        + (Typ - 2.0 * Tc + Tym) * inv_dy2
                        + (Tp - 2.0 * Tc + Tm) * inv_dz2)
            dT_dz = (Tp - Tm) * inv_2dz
            adv = next_u * dT_dx + next_v * dT_dy + next_w * dT_dz
            T_upd = jnp.where(maskb,
                              Tc + cdt * (-adv + dtype(alpha) * lapT), Tc)
        else:
            T_upd = Tc

        u_out = periodic_wrap(next_u, jj, ii)
        v_out = periodic_wrap(next_v, jj, ii)
        w_out = periodic_wrap(next_w, jj, ii)
        p_out = periodic_wrap(next_p, jj, ii)
        rho_out = periodic_wrap(rho, jj, ii)
        T_out = periodic_wrap(T_upd, jj, ii)
        if energy_on:
            T_out = thermal_faces(T_out, jj, ii)
        m2 = jnp.max(u_out * u_out + v_out * v_out + w_out * w_out)
        return ([u_out, v_out, w_out, p_out, rho_out, T_out],
                (m2, jnp.max(p_out), jnp.max(jnp.abs(p_out)),
                 jnp.max(T_out)))

    if final:
        t_src = ("pN2", "p1")
        if energy_on:
            from ...boundary.types import thermal_z_specs
            t_src = thermal_z_specs(thermal_bc, periodic=("pN2", "p1"),
                                    neumann=("p1", "pN2"))
        run = make_rolling_stencil(
            nz, ny, nx, 5, 9, 6, compute, dtype, n_scalars=8 if sharded_y else 7,
            reductions=("max", "max", "max", "max"),
            shell_sources={0: ("pN2", "p1"), 1: ("pN2", "p1"),
                           2: ("pN2", "p1"), 3: ("pN2", "p1"),
                           4: ("pN2", "p1"), 5: t_src},
            n_pinned=4 + n_coef, interpret=interpret)
        if run is None or not coef_pins:
            return run
        return lambda scalars, *fields: run(scalars, *fields, *coef_pins)
    run = make_rolling_stencil(
        nz, ny, nx, 5, 9, 8, compute, dtype, n_scalars=8 if sharded_y else 7,
        shell_passthrough=[5, 6, 7, 8, None, None, None, None],
        n_pinned=4 + n_coef, interpret=interpret)
    if run is None or not coef_pins:
        return run
    return lambda scalars, *fields: run(scalars, *fields, *coef_pins)
