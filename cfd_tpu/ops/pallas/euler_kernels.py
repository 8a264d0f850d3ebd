"""Fused explicit-Euler step kernel (3D rolling-plane, single streaming pass).

The jnp Euler step (`solvers/ns/euler.py`, mirroring
`cpu/solver_explicit_euler.c:337-582`) costs ~25 roll-based sweeps; this
kernel streams u, v, w, p (±1 halo windows) plus rho, T (plane inputs)
through HBM exactly once and emits the complete post-step state —
clamped derivatives, momentum + artificial-pressure updates, per-point
rho guards, the full periodic boundary dance, and the step's max-reduction
diagnostics — in ONE pass on the rolling engine.

Boundary semantics reproduced exactly (`solver_explicit_euler.c:546-553`):

* interior update on [1, n-2]³ only;
* periodic wrap x→y→z sequentially on u, v, w, p, rho, T
  (`apply_periodic_scalar`: face = opposite interior, later faces own
  corners);
* caller VELOCITY shells restored afterwards — net effect: u/v/w shells
  pass through from the input (engine ``shell_passthrough``), while
  p/rho/T shells keep the periodic wrap (in-plane wrap computed per
  plane; z-faces via the engine's ``shell_periodic`` snapshots).

The energy equation and Boussinesq buoyancy fuse into the same pass
(`energy_solver.c` semantics: T advected by the UPDATED velocities,
interior-only, then the thermal per-face BCs applied after the wrap —
in-plane faces in-compute, z-faces via the engine's generalized
``shell_sources``).

Gating (callers fall back to the jnp step): float32, uniform z,
nz ≥ 3, nx % 128 == 0, ny % 8 == 0, default sources only (the decayed
amplitudes enter as scalars), no custom heat-source callable.  Stretched
x/y grids are supported via pinned per-point coefficient planes
(``stretch=``, `.stretch.stretch_pins`); ``scheme="consistent"`` swaps
in the exact 3-point nonuniform weights (7 pins) and also enables the
fused energy equation on stretched grids — parity+stretched+energy
stays invalid (`energy_solver.c:55-91`).

Consistency vs the jnp step is enforced by tests/math/test_euler_fused.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rolling import make_rolling_stencil, plane_masks, rolling_supported, \
    shift_x, shift_y

# Reference clamp constants (`solver_explicit_euler.c:24-55`) — duplicated
# here rather than imported so ops/ stays below solvers/ in the layering.
_D1_LIMIT = 100.0
_D2_LIMIT = 1000.0
_VEL_LIMIT = 100.0
_DIV_LIMIT = 10.0
_UPDATE_LIMIT = 1.0


def euler_kernel_supported(nz: int, ny: int, nx: int,
                           n_pinned: int = 0) -> bool:
    # 5 halo inputs (u, v, w, p, T), 1 plane input (rho), 6 outputs
    # + 3 shell snapshot buffers + any stretch coefficient pins
    # (`solvers.ns.common.stretch_pin_count` — keep capacity gates in
    # sync with the actual build or marginal grids raise instead of
    # falling back).
    return rolling_supported(nz, ny, nx, 5, 1, 6 + 3 + n_pinned)


def make_euler_fused(nz, ny, nx, dx, dy, dz, xmin, ymin,
                     mu: float, pressure_coupling: float,
                     alpha: float = 0.0, beta: float = 0.0,
                     T_ref: float = 0.0, gravity=(0.0, 0.0, 0.0),
                     thermal_bc=None, stretch=None, scheme: str = "parity",
                     dtype=jnp.float32, interpret: bool = False,
                     global_ny=None):
    """Build fn(scalars=(cdt, src_u_eff, src_v_eff, time[, y_off]),
    u, v, w, p, T, rho) →
    (u', v', w', p', rho', T', m2max, pmax, pabsmax, tmax), or None.

    ``global_ny``: global-row mode for (z, y) 2D-mesh sharding (the same
    convention as `ProjectionKernels(global_ny=...)`): ``ny`` is the
    local y-padded row count, a trailing ``y_off`` scalar gives the
    global row of padded row 0, and every row-dependent decision
    (interior mask, sin(πy) source) uses global rows.  The y boundary
    dance (periodic wrap rows / thermal y faces) is SKIPPED in-kernel —
    its source rows live on other shards; the shard_map wrapper restores
    them (`parallel.fused`).  With ``stretch`` the kernel only RESERVES
    the pinned coefficient inputs — the wrapper appends per-shard local
    row slices of the global pin planes at call time.

    ``alpha > 0`` fuses the energy update; ``beta != 0`` the Boussinesq
    sources; ``thermal_bc`` (a ThermalBCConfig) the per-face T BCs —
    required when alpha > 0, ignored otherwise (T then keeps the plain
    periodic wrap, matching the jnp boundary dance).

    ``stretch``: per-point spacing on tanh-stretched grids — a
    ``(dx_arr, dy_arr, x_coords, y_coords)`` numpy tuple (see
    `.stretch.stretch_pins`).  The 1/(2h), 1/h² coefficients and the
    source basis then ride three pinned VMEM inputs instead of compiled
    constants; z spacing stays uniform (validated by the solver layer).
    ``scheme="consistent"`` (with stretch) uses the exact 3-point
    nonuniform weights instead — seven pins
    (`.stretch.stretch_pins_consistent`) — and supports ``alpha > 0``
    (the thermal stencils reuse the weight pins); parity + stretch +
    energy returns None (`energy_solver.c:55-91`)."""
    consistent = stretch is not None and scheme == "consistent"
    n_pins = 0 if stretch is None else (7 if consistent else 3)
    if not euler_kernel_supported(nz, ny, nx, n_pins):
        return None
    sharded_y = global_ny is not None
    gny = ny if global_ny is None else global_ny
    if stretch is not None and alpha > 0.0 and not consistent:
        # parity + stretched + energy is invalid (energy_solver.c:55-91);
        # the consistent weights make the thermal stencils well-defined.
        return None
    from ...boundary.types import BCType
    pins = ()
    if stretch is not None:
        if sharded_y:
            # (z, y) mode: the caller supplies per-shard LOCAL pin slices
            # (rows of the global pin planes) at call time — the kernel
            # only reserves the pinned inputs (see `parallel.fused`).
            inv_2dx = inv_2dy = inv_dx2 = inv_dy2 = None
        else:
            from .stretch import stretch_pins, stretch_pins_consistent
            dx_arr, dy_arr, x_coords, y_coords = stretch
            mk = stretch_pins_consistent if consistent else stretch_pins
            pins = mk(ny, nx, dx_arr, dy_arr, x_coords, y_coords,
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

    def make_derivs(c2x, cx2, c2y, cy2):
        """Derivative helpers over the plane coefficients — compiled
        floats on uniform grids, pinned (ny, nx) planes on stretched."""

        def d1x(c):
            return clampv((shift_x(c, 1) - shift_x(c, -1)) * c2x, _D1_LIMIT)

        def d1y(c):
            return clampv((shift_y(c, 1, ny) - shift_y(c, -1, ny)) * c2y,
                          _D1_LIMIT)

        def d1z(m, p):
            return clampv((p - m) * inv_2dz, _D1_LIMIT)

        def lap_clamped(m, c, p):
            # the jnp path clamps EACH second-derivative term before summing
            return (clampv((shift_x(c, 1) - 2.0 * c + shift_x(c, -1)) * cx2,
                           _D2_LIMIT)
                    + clampv((shift_y(c, 1, ny) - 2.0 * c
                              + shift_y(c, -1, ny)) * cy2, _D2_LIMIT)
                    + clampv((p - 2.0 * c + m) * inv_dz2, _D2_LIMIT))

        return d1x, d1y, d1z, lap_clamped

    def make_derivs_consistent(xw, yw):
        """Exact 3-point nonuniform weights (pinned planes), term order
        matching the jnp `common.spacing_operators` consistent path."""
        wxm, wxc, wxp, lxm, lxc, lxp = xw
        wym, wyc, wyp, lym, lyc, lyp = yw

        def d1x(c):
            return clampv(shift_x(c, -1) * wxm + c * wxc
                          + shift_x(c, 1) * wxp, _D1_LIMIT)

        def d1y(c):
            return clampv(shift_y(c, -1, ny) * wym + c * wyc
                          + shift_y(c, 1, ny) * wyp, _D1_LIMIT)

        def d1z(m, p):
            return clampv((p - m) * inv_2dz, _D1_LIMIT)

        def lap_clamped(m, c, p):
            return (clampv(shift_x(c, -1) * lxm + c * lxc
                           + shift_x(c, 1) * lxp, _D2_LIMIT)
                    + clampv(shift_y(c, -1, ny) * lym + c * lyc
                             + shift_y(c, 1, ny) * lyp, _D2_LIMIT)
                    + clampv((p - 2.0 * c + m) * inv_dz2, _D2_LIMIT))

        return d1x, d1y, d1z, lap_clamped

    def periodic_wrap(q, jj, ii):
        # x faces first, then y faces read the x-wrapped values
        # (`core_impl.h:92-120` sequential order).  Global-row mode skips
        # the y faces — their wrap rows live on the opposite y-edge shard
        # and are restored by the shard_map wrapper.
        q = jnp.where(ii == 0, shift_x(q, -2), q)
        q = jnp.where(ii == nx - 1, shift_x(q, 2), q)
        if sharded_y:
            return q
        q2 = jnp.where(jj == 0, shift_y(q, -2, ny), q)
        q2 = jnp.where(jj == ny - 1, shift_y(q, 2, ny), q2)
        return q2

    energy_on = alpha > 0.0
    buoy_on = beta != 0.0

    def thermal_faces(q, jj, ii):
        """In-plane thermal BCs applied after the wrap, reference order
        L, R, B, T (`energy_solver.c:246-331`); PERIODIC faces are no-ops
        on a wrapped field."""
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
            if neumann_src is None:   # y faces read the current q
                neumann_src = shift_y(q, 1 if i == 2 else -1, ny)
            src = (jnp.full((ny, nx), dtype(value), dtype)
                   if bc == BCType.DIRICHLET else neumann_src)
            q = jnp.where(where_mask, src, q)
        return q

    def compute(k, scalars, halos, planes, pinned=None):
        if sharded_y:
            cdt, src_u_eff, src_v_eff, _time, y_off = scalars
        else:
            cdt, src_u_eff, src_v_eff, _time = scalars
            y_off = None
        (um, uc, up) = halos[0]
        (vm, vc, vp) = halos[1]
        (wm, wc, wp) = halos[2]
        (pm, pc, pp) = halos[3]
        (Tm, Tc, Tp) = halos[4]
        (rho,) = planes
        T = Tc
        mask, jj, ii = plane_masks(ny, nx, dtype)
        if sharded_y:
            # interior decided on GLOBAL rows; halo-row outputs discarded
            jg = jj + y_off.astype(jnp.int32)
            maskb = ((jg > 0) & (jg < gny - 1) & (ii > 0) & (ii < nx - 1))
            jj = jg
        else:
            maskb = mask > 0

        if consistent:
            ((wxm, wxp), (wxc, lxc), (lxm, lxp),
             (wym, wyp), (wyc, lyc), (lym, lyp), (sy, sx2)) = pinned
            d1x, d1y, d1z, lap_clamped = make_derivs_consistent(
                (wxm, wxc, wxp, lxm, lxc, lxp),
                (wym, wyc, wyp, lym, lyc, lyp))
        else:
            if stretch is not None:
                (c2x, cx2), (c2y, cy2), (sy, sx2) = pinned
            else:
                c2x, cx2, c2y, cy2 = inv_2dx, inv_dx2, inv_2dy, inv_dy2
                sy, sx2 = source_planes(y_off)
            d1x, d1y, d1z, lap_clamped = make_derivs(c2x, cx2, c2y, cy2)

        du_dx, du_dy, du_dz = d1x(uc), d1y(uc), d1z(um, up)
        dv_dx, dv_dy, dv_dz = d1x(vc), d1y(vc), d1z(vm, vp)
        dw_dx, dw_dy, dw_dz = d1x(wc), d1y(wc), d1z(wm, wp)
        dp_dx, dp_dy, dp_dz = d1x(pc), d1y(pc), d1z(pm, pp)

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

        du = cdt * (-uc * du_dx - vc * du_dy - wc * du_dz - dp_dx / rho
                    + nu * lap_clamped(um, uc, up) + su)
        dv = cdt * (-uc * dv_dx - vc * dv_dy - wc * dv_dz - dp_dy / rho
                    + nu * lap_clamped(vm, vc, vp) + sv)
        dw = cdt * (-uc * dw_dx - vc * dw_dy - wc * dw_dz - dp_dz / rho
                    + nu * lap_clamped(wm, wc, wp) + sw)

        u_new = clampv(uc + clampv(du, _UPDATE_LIMIT), _VEL_LIMIT)
        v_new = clampv(vc + clampv(dv, _UPDATE_LIMIT), _VEL_LIMIT)
        w_new = clampv(wc + clampv(dw, _UPDATE_LIMIT), _VEL_LIMIT)

        divergence = clampv(du_dx + dv_dy + dw_dz, _DIV_LIMIT)
        dp = clampv(-dtype(pressure_coupling) * cdt * rho * divergence,
                    _UPDATE_LIMIT)
        p_new = pc + dp

        ok = rho > dtype(1e-10)
        u_out = jnp.where(maskb & ok, u_new, uc)
        v_out = jnp.where(maskb & ok, v_new, vc)
        w_out = jnp.where(maskb & ok, w_new, wc)
        p_upd = jnp.where(maskb & ok, p_new, pc)

        # Energy: T advected by the UPDATED velocities, diffused by
        # alpha, interior-only and unguarded (`energy_solver.c:120-160`).
        if energy_on:
            Txm, Txp = shift_x(Tc, -1), shift_x(Tc, 1)
            Tym, Typ = shift_y(Tc, -1, ny), shift_y(Tc, 1, ny)
            if consistent:
                # unclamped consistent stencils, term order matching the
                # jnp `energy.make_energy_step` stretched branch
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
            adv = u_out * dT_dx + v_out * dT_dy + w_out * dT_dz
            T_upd = jnp.where(maskb,
                              Tc + cdt * (-adv + dtype(alpha) * lapT), Tc)
        else:
            T_upd = Tc

        # p / rho / T take the in-plane periodic wrap; velocities keep
        # their input edges (wrap-then-restore ≡ passthrough).
        p_out = periodic_wrap(p_upd, jj, ii)
        rho_out = periodic_wrap(rho, jj, ii)
        T_out = periodic_wrap(T_upd, jj, ii)
        if energy_on:
            T_out = thermal_faces(T_out, jj, ii)

        m2 = jnp.max(u_out * u_out + v_out * v_out + w_out * w_out)
        return ([u_out, v_out, w_out, p_out, rho_out, T_out],
                (m2, jnp.max(p_out), jnp.max(jnp.abs(p_out)),
                 jnp.max(T_out)))

    # z-shell sources: p/rho always periodic; T per thermal config when
    # the energy equation is on (z faces own the corners, reference order)
    t_src = ("pN2", "p1")
    if energy_on:
        from ...boundary.types import thermal_z_specs
        t_src = thermal_z_specs(thermal_bc, periodic=("pN2", "p1"),
                                neumann=("p1", "pN2"))

    run = make_rolling_stencil(
        nz, ny, nx, 5, 1, 6, compute, dtype,
        n_scalars=5 if sharded_y else 4,
        reductions=("max", "max", "max", "max"),
        shell_passthrough=[0, 1, 2, None, None, None],
        shell_sources={3: ("pN2", "p1"), 4: ("pN2", "p1"), 5: t_src},
        n_pinned=n_pins, interpret=interpret)
    if run is None or not pins:
        return run
    return lambda scalars, *fields: run(scalars, *fields, *pins)
