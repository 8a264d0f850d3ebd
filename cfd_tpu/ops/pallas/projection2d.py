"""Fused 2D projection kernels on the block-marching engine.

Two kernels per step (vs seven in 3D — 2D has no w-halo structure, so the
whole predictor fuses with the Poisson-input pass):

* ``pred_bt``: one sweep reading (u, v, w, p) once, producing
  (u*, v*, w*, b̃) — predictor with clamps/sources and the spectral-solve
  input b̃ = M·p − (ρ/dt)∇·u* (or the plain rhs = (ρ/dt)∇·u* for iterative
  solvers).  The divergence needs u* one row beyond the block, so the
  predictor is evaluated on a two-row-extended window recomputed from the
  neighbor blocks already resident in VMEM — still read-amplification 1.0
  from HBM.
* ``corrector``: reads (p, u*, v*) once, producing (u, v); in 2D the
  w-correction is identically zero (`solver_projection.c:230-250` with
  inv_dz2 = 0), so w = w* passes through at the jnp level.

Semantics match the jnp 2D step exactly: interior-only updates with ±100
clamps, caller shells preserved (the reference's save/restore idiom,
`solver_projection.c:187-189,277-278`), decaying sinusoidal sources
(`solver_explicit_euler.c:317-333`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .marching2d import make_marching_stencil_2d, marching2d_supported

CLAMP = 100.0  # PROJ_MAX_VELOCITY


def projection2d_supported(ny: int, nx: int, buoyant: bool = False,
                           dst: bool = False, split: bool = False) -> bool:
    ok = (marching2d_supported(ny, nx, 4 if buoyant else 3, 1, 4)
          and marching2d_supported(ny, nx, 1, 2, 3 if dst else 2))
    if split:
        ok = ok and (marching2d_supported(ny, nx, 4 if buoyant else 3, 0, 3)
                     and marching2d_supported(ny, nx, 1, 2, 1))
    return ok


class Projection2DKernels:
    """The two fused kernels for one (2D grid geometry, dtype)."""

    def __init__(self, ny, nx, dx, dy, xmin, ymin, dtype=jnp.float32,
                 emit="btilde", with_sources=True, interpret=False,
                 global_ny=None, beta=0.0, T_ref=0.0,
                 gravity=(0.0, 0.0, 0.0), dst_mats=None,
                 dst_precision=None, split=False):
        """``global_ny``: sharded (y-decomposed) mode — the kernels operate
        on a halo-padded local row block of ``ny`` rows belonging to a
        global ``global_ny``-row domain; each kernel takes the shard's
        global row offset as an extra trailing scalar so interior masks,
        b̃ face coefficients, and source coordinates land on GLOBAL rows.
        Used by ``cfd_tpu.parallel.fused`` inside ``shard_map``.

        ``beta != 0`` fuses Boussinesq buoyancy into the predictor: T rides
        as a fourth halo input and −β·g·(T−T_ref) joins the sources (the
        2D de Vahl Davis configuration keeps the fused path).

        ``dst_mats``: the DST-fused 2D path — an (FxT, GxT) pair of host
        numpy sine factors (`spectral.make_dst2d_fused_pieces`).  The
        predictor then emits the **x-transformed** b̃ (one in-kernel MXU
        dot per block, riding the otherwise-idle MXU while the engine
        streams), and the corrector inverse-transforms the y-line-solve
        output x̂ as blocks ARRIVE in its halo ring (once per block) and
        emits the physical pressure as a third output.  Only the TDMA-y
        stage (+ dense low-mode rescue) runs between the two sweeps —
        the 2D twin of the 3D mega DST fusion (r4).  Requires the x mode
        dim to equal nx (nx % 1024 == 0).  Composes with ``global_ny``
        (r5): the x transforms are row-local, so the sharded wrapper
        exchanges 4-row halos in transform space and the per-shard y
        solve (`spectral.make_dst2d_fused_sharded_pieces`) is the only
        cross-shard stage.
        ``dst_precision`` sets the in-kernel contraction precision
        (default HIGHEST, matching the eigen pipeline).

        ``split=True`` additionally builds the two-pass (``bc_refresh``)
        kernels: ``pred_only`` (predictor sweep, no Poisson input) and
        ``bt_only`` (b̃/rhs from the refreshed predictor state) — caller
        BCs re-apply between the sweeps while both stay on the marching
        engine.  Single-chip only; composes with ``dst_mats``."""
        self.shape = (ny, nx)
        self.global_ny = global_ny
        buoy = beta != 0.0
        self.buoyant = buoy
        self.dst = dst_mats is not None
        if self.dst:
            if emit != "btilde":
                raise ValueError("dst_mats requires emit='btilde'")
            fxt, gxt = dst_mats
            self._fx = fxt     # host numpy (trace safety)
            self._gx = gxt
        dst_prec = dst_precision or jax.lax.Precision.HIGHEST

        def block_dot(block, mat):
            """block · mat — one x DST stage on the MXU.

            Routed through :func:`rolling.hp_dot_general` so HIGH lowers
            as a manual bf16_3x (Mosaic only lowers DEFAULT/HIGHEST).
            """
            from .rolling import hp_dot_general
            return hp_dot_general(
                block, mat, (((1,), (0,)), ((), ())),
                precision=dst_prec, preferred_element_type=dtype)
        gn = ny if global_ny is None else global_ny
        inv_2dx = 1.0 / (2.0 * dx)
        inv_2dy = 1.0 / (2.0 * dy)
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)

        def d1x(a):
            return (jnp.roll(a, -1, 1) - jnp.roll(a, 1, 1)) * inv_2dx

        def iotas(row0, rows, nx_):
            jg = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, nx_), 0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (rows, nx_), 1)
            return jg, ii

        def interior(jg, ii):
            return (jg > 0) & (jg < gn - 1) & (ii > 0) & (ii < nx - 1)

        def predict_ext(row0, dt, nu, su_amp, sv_amp, halos):
            """Shared predictor on the two-row-extended window: rows
            [row0−2, row0+B+2) from the resident neighbor blocks.  The
            first/last global block's outer rows are uninitialized VMEM —
            every consumer jnp.where-selects them away (mask-multiplying
            would propagate NaN garbage).  Returns the (B+2)-row starred
            fields (u*, v*, w*)."""
            (um, uc, up), (vm, vc, vp), (wm, wc, wp) = halos[:3]
            B = uc.shape[0]

            def ext(m, c, p):
                return jnp.concatenate([m[-2:], c, p[:2]], axis=0)

            ue, ve, we = ext(um, uc, up), ext(vm, vc, vp), ext(wm, wc, wp)
            if buoy:
                Te = ext(*halos[3])

            # Predictor on the (B+2)-row window [row0−1, row0+B+1).
            jg_e, ii_e = iotas(row0 - 1, B + 2, nx)
            mask_e = interior(jg_e, ii_e)
            if with_sources:
                y = ymin + jg_e.astype(dtype) * dtype(dy)
                x = xmin + ii_e.astype(dtype) * dtype(dx)
                src_u = su_amp * jnp.sin(jnp.asarray(jnp.pi, dtype) * y)
                src_v = sv_amp * jnp.sin(jnp.asarray(2.0 * jnp.pi, dtype)
                                         * x)
            else:
                # Amplitudes statically zero at build time: skip the two
                # transcendental sweeps (VPU sin is the costliest op here).
                src_u = src_v = 0.0

            def star(fe, src):
                fc_ = fe[1:-1]
                dfdx = d1x(fc_)
                dfdy = (fe[2:] - fe[:-2]) * inv_2dy
                conv = ue[1:-1] * dfdx + ve[1:-1] * dfdy
                lap = ((jnp.roll(fc_, -1, 1) - 2.0 * fc_
                        + jnp.roll(fc_, 1, 1)) * inv_dx2
                       + (fe[2:] - 2.0 * fc_ + fe[:-2]) * inv_dy2)
                s = fc_ + dt * (-conv + nu * lap + src)
                return jnp.where(mask_e, jnp.clip(s, -CLAMP, CLAMP), fc_)

            def bsrc(component):
                """−β·g[c]·(T−T_ref) on the extended window (Te rows at the
                padded-array edges are where-selected away by mask_e)."""
                if not (buoy and gravity[component] != 0.0):
                    return 0.0
                return ((-dtype(beta) * dtype(gravity[component]))
                        * (Te[1:-1] - dtype(T_ref)))

            us_e = star(ue, src_u + bsrc(0))
            vs_e = star(ve, src_v + bsrc(1))
            ws_e = star(we, bsrc(2))
            return us_e, vs_e, ws_e

        def poisson_input_block(row0, rod, pc, div, pinned):
            """b̃ (optionally x-DST-transformed in-kernel) or plain rhs
            from a block's divergence."""
            B = pc.shape[0]
            jg, ii = iotas(row0, B, nx)
            mask = interior(jg, ii)
            zero = jnp.zeros((), dtype)
            if emit == "btilde":
                coeff = (inv_dx2 * ((ii == 1).astype(dtype)
                                    + (ii == nx - 2).astype(dtype))
                         + inv_dy2 * ((jg == 1).astype(dtype)
                                      + (jg == gn - 2).astype(dtype)))
                out = jnp.where(mask, coeff * pc - rod * div, zero)
                if self.dst:
                    # forward x-DST of the b̃ block, in-kernel on the MXU
                    # (overlaps the block streaming for free)
                    out = block_dot(out, pinned[0])
            else:
                out = jnp.where(mask, rod * div, zero)
            return out

        def pred_bt_compute(row0, scalars, halos, planes, pinned=None):
            dt, nu, su_amp, sv_amp, rod = scalars[:5]
            if global_ny is not None:
                row0 = row0 + scalars[5].astype(jnp.int32)
            (pc,) = planes
            us_e, vs_e, ws_e = predict_ext(row0, dt, nu, su_amp, sv_amp,
                                           halos)
            # Divergence of u* on the block's own B rows.
            div = d1x(us_e[1:-1]) + (vs_e[2:] - vs_e[:-2]) * inv_2dy
            out = poisson_input_block(row0, rod, pc, div, pinned)
            return [us_e[1:-1], vs_e[1:-1], ws_e[1:-1], out]

        self.pred_bt = make_marching_stencil_2d(
            ny, nx, 4 if buoy else 3, 1, 4, pred_bt_compute, dtype,
            n_scalars=5 if global_ny is None else 6,
            pinned_mats=[self._fx.shape] if self.dst else None,
            interpret=interpret)

        # Two-pass (bc_refresh) variant: predictor-only and b̃-only
        # kernels, so caller BCs can be re-applied to the predictor state
        # between the sweeps while both sweeps stay on the marching
        # engine (r4 verdict item 5 — previously a jnp-body cliff).
        self.pred_only = None
        self.bt_only = None
        if split:
            if global_ny is not None:
                raise ValueError("split (two-pass) 2D kernels are "
                                 "single-chip only")

            def pred_only_compute(row0, scalars, halos, planes,
                                  pinned=None):
                dt, nu, su_amp, sv_amp = scalars[:4]
                us_e, vs_e, ws_e = predict_ext(row0, dt, nu, su_amp,
                                               sv_amp, halos)
                return [us_e[1:-1], vs_e[1:-1], ws_e[1:-1]]

            def bt_only_compute(row0, scalars, halos, planes, pinned=None):
                rod = scalars[0]
                (vm, vc, vp) = halos[0]
                us, pc = planes
                ve = jnp.concatenate([vm[-1:], vc, vp[:1]], axis=0)
                div = d1x(us) + (ve[2:] - ve[:-2]) * inv_2dy
                return [poisson_input_block(row0, rod, pc, div, pinned)]

            self.pred_only = make_marching_stencil_2d(
                ny, nx, 4 if buoy else 3, 0, 3, pred_only_compute, dtype,
                n_scalars=4, interpret=interpret)
            self.bt_only = make_marching_stencil_2d(
                ny, nx, 1, 2, 1, bt_only_compute, dtype, n_scalars=1,
                pinned_mats=[self._fx.shape] if self.dst else None,
                interpret=interpret)

        def corr_compute(row0, scalars, halos, planes, pinned=None):
            dt_over_rho = scalars[0]
            if global_ny is not None:
                row0 = row0 + scalars[1].astype(jnp.int32)
            (pm, pc, pp) = halos[0]
            us, vs = planes
            B = pc.shape[0]
            pe = jnp.concatenate([pm[-1:], pc, pp[:1]], axis=0)
            jg, ii = iotas(row0, B, nx)
            mask = interior(jg, ii)
            dpdx = d1x(pe[1:-1])
            dpdy = (pe[2:] - pe[:-2]) * inv_2dy
            u = jnp.where(mask, jnp.clip(us - dt_over_rho * dpdx,
                                         -CLAMP, CLAMP), us)
            v = jnp.where(mask, jnp.clip(vs - dt_over_rho * dpdy,
                                         -CLAMP, CLAMP), vs)
            # in DST mode pc is already physical (arrival hook below) —
            # it rides out as the pressure result
            return [u, v] + ([pc] if self.dst else [])

        def corr_inverse_dst(block, mats):
            """Arrival hook: x̂ block (y-line-solve output, transform
            space) → physical p block via the mirror-extended inverse."""
            return block_dot(block, mats[0])

        self.corr = make_marching_stencil_2d(
            ny, nx, 1, 2, 3 if self.dst else 2, corr_compute, dtype,
            n_scalars=1 if global_ny is None else 2,
            pinned_mats=[self._gx.shape] if self.dst else None,
            halo_transform={0: corr_inverse_dst} if self.dst else None,
            interpret=interpret)

        self.ok = self.pred_bt is not None and self.corr is not None
        self.split_ok = (self.ok and self.pred_only is not None
                         and self.bt_only is not None)

    # ---- step pieces -------------------------------------------------------

    def predictor_and_poisson_input(self, u, v, w, p, dt, nu,
                                    src_u_amp, src_v_amp, rho_over_dt,
                                    y_offset=None, T=None):
        """(u*, v*, w*, b̃-or-rhs), each (1, ny, nx); one HBM sweep.

        In sharded mode (``global_ny`` set) pass ``y_offset`` — the global
        row index of the local block's first row.  With buoyancy compiled
        in, pass the step-start temperature ``T``.  In DST mode the
        fourth output is the x-transformed b̃ (TDMA-y input)."""
        parts = [jnp.asarray(dt), jnp.asarray(nu),
                 jnp.asarray(src_u_amp), jnp.asarray(src_v_amp),
                 jnp.asarray(rho_over_dt)]
        if self.global_ny is not None:
            parts.append(jnp.asarray(y_offset).astype(parts[0].dtype))
        s = jnp.stack(parts)
        extra = (T[0].astype(u.dtype),) if self.buoyant else ()
        mats = (self._fx,) if self.dst else ()
        us, vs, ws, bt = self.pred_bt(s, u[0], v[0], w[0], *extra, p[0],
                                      *mats)
        return us[None], vs[None], ws[None], bt[None]

    def predictor(self, u, v, w, dt, nu, src_u_amp, src_v_amp, T=None):
        """Two-pass mode: (u*, v*, w*) only — caller BCs (``bc_refresh``)
        re-apply before :meth:`poisson_input`.  Requires ``split=True``."""
        s = jnp.stack([jnp.asarray(dt), jnp.asarray(nu),
                       jnp.asarray(src_u_amp), jnp.asarray(src_v_amp)])
        extra = (T[0].astype(u.dtype),) if self.buoyant else ()
        us, vs, ws = self.pred_only(s, u[0], v[0], w[0], *extra)
        return us[None], vs[None], ws[None]

    def poisson_input(self, us, vs, p, rho_over_dt):
        """Two-pass mode: b̃-or-rhs from the (refreshed) predictor state —
        in DST mode the x-transformed b̃, as in the single-sweep kernel."""
        s = jnp.asarray(rho_over_dt)[None]
        mats = (self._fx,) if self.dst else ()
        (bt,) = self.bt_only(s, vs[0], us[0], p[0], *mats)
        return bt[None]

    def corrector(self, us, vs, p, dt_over_rho, y_offset=None):
        """(u, v) corrected; w is identity in 2D (handled by the caller).

        In DST mode ``p`` is the y-line-solve output x̂ (transform
        space): blocks are inverse-DSTed on ring arrival and the physical
        pressure comes back as a third output: (u, v, p)."""
        s = jnp.asarray(dt_over_rho)
        if self.global_ny is not None:
            s = jnp.stack([s, jnp.asarray(y_offset).astype(s.dtype)])
        else:
            s = s[None]
        if self.dst:
            u, v, pn = self.corr(s, p[0], us[0], vs[0], self._gx)
            return u[None], v[None], pn[None]
        u, v = self.corr(s, p[0], us[0], vs[0])
        return u[None], v[None]
