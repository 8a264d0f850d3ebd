"""Fused Pallas kernels for the projection predictor / divergence / corrector.

Built on the rolling-plane engine; replaces ~15 XLA roll-sweeps of the
jnp projection step with 7 streaming kernels (per-velocity-component
predictor ×3, divergence, corrector ×3), each reading every input plane
exactly once.

Semantics match `cfd_tpu.solvers.ns.projection` (and therefore
`solver_projection.c`) exactly:

* interior-only updates with ±100 velocity clamps;
* j/i-shell and z-shell values pass through from the predictor input (the
  reference's copy_boundary_velocities save/restore idiom becomes shell
  passthrough in the kernels);
* default decaying sinusoidal sources computed in-kernel from (amp·decay)
  scalars (`solver_explicit_euler.c:317-333`).

The fused path is gated to: float32, 3D, nx % 128 == 0, ny % 8 == 0, no
custom source callables.  Boussinesq buoyancy (``beta != 0``) fuses into the
predictor passes — T rides along as one extra streamed input.  Everything
else falls back to the jnp step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rolling import make_rolling_stencil, plane_masks, rolling_supported, \
    shift_x, shift_y

CLAMP = 100.0  # PROJ_MAX_VELOCITY


def projection_kernels_supported(nz: int, ny: int, nx: int) -> bool:
    return (rolling_supported(nz, ny, nx, 1, 2, 1)
            and rolling_supported(nz, ny, nx, 0, 2, 1)
            and rolling_supported(nz, ny, nx, 1, 1, 1))


class ProjectionKernels:
    """The seven fused kernels for one (grid geometry, dtype)."""

    def __init__(self, nz, ny, nx, dx, dy, dz, xmin, ymin,
                 dtype=jnp.float32, interpret=False, global_nz=None,
                 emit="btilde", with_sources=True,
                 beta=0.0, T_ref=0.0, gravity=(0.0, 0.0, 0.0),
                 global_ny=None, dst_mats=None, dst_precision=None,
                 tdma_fwd=None, tdma_bwd="stored",
                 stretch_consistent=None, face_coeffs=None):
        """``global_nz``: sharded (z-decomposed) mode — the kernels operate
        on a halo-padded local block of ``nz`` planes belonging to a global
        ``global_nz``-plane domain; the btilde kernel then takes the shard's
        global plane offset as an extra scalar so its Neumann face
        coefficients land on the *global* k = 1 and k = global_nz − 2
        planes.  Used by ``cfd_tpu.parallel.fused`` inside ``shard_map``.

        ``global_ny``: additionally y-decomposed ((z, y) 2D device mesh) —
        the local block carries 4 halo rows per side (keeping ny % 8) and
        every per-component kernel takes the shard's global row offset
        (global row of padded local row 0) as one more trailing scalar;
        interior masks, the sin(πy) source coordinate, and the b̃ Neumann
        face coefficients all evaluate at *global* row indices, so the
        in-plane save/restore shells land on the true domain faces only.

        ``dst_mats``: the DST-fused mega path — a (FxT, Fy, GxT, Gy) tuple
        of host numpy sine matrices (see ``spectral.make_dst_fused_mats``).
        The predictor mega kernel then emits the **xy-transformed** b̃
        (two in-kernel MXU dots per plane, riding the otherwise-idle MXU
        while the engine streams — measured overlap in
        artifacts/overlap_probe.py), and the corrector mega kernel
        inverse-transforms the z-TDMA output as planes ARRIVE in its
        rolling window (once per plane) and emits the physical pressure as
        a fourth output with mirror z-shells.  Only the z line solve
        remains between the two sweeps: the whole spectral projection step
        is two marching kernels plus one TDMA.  Requires the mode dims to
        equal the grid dims (guaranteed by the engine's nx%128 / ny%8
        gates: ceil(nx−2, 128) == nx).
        ``dst_precision`` sets the in-kernel contraction precision
        (default HIGHEST, matching the eigen pipeline).

        ``dst_mats`` composes with ``global_nz`` (z-sharded): the xy
        transforms are plane-local, so the mega kernels run unchanged per
        shard — the predictor takes a ±2-plane halo block (nzl+4 planes,
        two exchanged planes per side) plus the shard's global plane
        offset as a 6th scalar, computes planes 1..nzl+2 (owned:
        2..nzl+1 — the callers trim [2:-2]), and the corrector streams a
        1-halo x̂ block exchanged in TRANSFORM space (arrival hooks
        inverse-DST neighbor halos exactly once).  Only the z line solve
        crosses shards (all_to_all y-pencils in `parallel.fused`).
        ``tdma_fwd`` stays single-chip — the Thomas recurrence is
        sequential in global z.  Sharded mega kernels carry no in-kernel
        reductions (the wrapper's GSPMD diagnostics cover the field).

        ``dst_mats`` also composes with ``global_ny`` (the (z, y) 2D
        device mesh): only the x DST is row-local under y decomposition,
        so the mats become the x-only ``(FxT, GxT)`` pair
        (`spectral.make_dst_fused_sharded_zy_pieces`) — the predictor
        emits the x-transformed b̃ and the corrector inverse-x-DSTs x̂
        planes on arrival, with the y/z spectral stages (four
        all_to_alls) as the wrapper's only cross-shard solve stage.
        Blocks carry the global-row 4-halo-row structure of the
        per-component kernels plus the mega ±2-plane z halos.

        ``tdma_fwd``: a ``(mu, w)`` pair (host numpy (ny, nx) eigenvalue
        plane, scalar 1/dz²) — fuses the Thomas FORWARD sweep of the
        z line solve into the predictor sweep as well: the transformed b̃
        plane feeds the (t, d′) recurrence carried across plane
        iterations (the engine's ``carry_planes``), and the kernel emits
        d′ and t as 4th/5th outputs.  Only the backward substitution
        (`tdma.make_tdma_z_bwd`) remains between the sweeps — the
        standalone forward kernel's 3 HBM passes disappear, and the
        recurrence itself is VPU work fully hidden under the MXU dots.
        Requires ``dst_mats``.  Bit-identical to the standalone forward
        kernel (same op sequence, same f32 coefficients).

        ``stretch_consistent``: the consistent-scheme (stretched-grid)
        projection — a ``(dx_arr, dy_arr, x_coords, y_coords)`` numpy
        tuple.  The MEGA kernels then evaluate momentum / divergence /
        pressure-gradient stencils with the exact 3-point nonuniform
        weights riding pinned VMEM inputs
        (`.stretch.stretch_pins_consistent` for the predictor,
        `.stretch.stretch_pins_grad` for the corrector), the default
        source basis reads true coordinates from the pins, and the b̃
        Neumann face term uses ``face_coeffs`` — the four nonuniform
        off-diagonal scalars ``(cxm, cxp, cym, cyp)`` from
        `solvers.poisson.nonuniform.nonuniform_face_coeffs` (required
        with ``emit='btilde'``).  ``dst_mats`` then carries the
        generalized eigenbasis factors
        (`nonuniform.make_nonuniform_fused_pieces`) instead of sines —
        the kernels don't care which.  Mega kernels only (``ok`` stays
        False: the per-component kernels keep uniform constants);
        composes with ``global_nz`` (z-sharded — the x/y weight pins are
        z-invariant, so every shard pins the same planes) but not
        ``global_ny``; z stays uniform (framework-wide rule)."""
        self.shape = (nz, ny, nx)
        self.global_nz = global_nz
        self.global_ny = global_ny
        sharded_y = global_ny is not None
        gny = ny if global_ny is None else global_ny
        buoy = beta != 0.0
        self.buoyant = buoy
        self.dst = dst_mats is not None
        if self.dst:
            if emit != "btilde":
                raise ValueError("dst_mats requires emit='btilde'")
            # host numpy on purpose (trace safety, docs/design.md); the
            # engine's run() converts per call.
            if sharded_y:
                # (z, y) 2D-mesh mode: only the x DST is row-local under
                # y decomposition, so the kernels carry x-only factors —
                # (FxT, GxT) from `spectral.make_dst_fused_sharded_zy_
                # pieces`; the y/z spectral stages run between the sweeps
                # (four all_to_alls in `parallel.fused`).
                if global_nz is None:
                    raise ValueError("y-sharded dst_mats requires "
                                     "global_nz (the zy mega kernels "
                                     "ride the 2D-mesh wrapper)")
                if len(dst_mats) != 2:
                    raise ValueError("y-sharded dst_mats must be the "
                                     "(FxT, GxT) x-only pair")
                fxt, gxt = dst_mats
                self._pred_mats = (fxt,)
                self._corr_mats = (gxt,)
            else:
                fxt, fyl, gxt, gyl = dst_mats
                self._pred_mats = (fxt, fyl)
                self._corr_mats = (gxt, gyl)
        self.tdma_fused = tdma_fwd is not None
        tdma_w = 0.0
        if self.tdma_fused:
            if not self.dst:
                raise ValueError("tdma_fwd requires dst_mats")
            if global_nz is not None:
                raise ValueError("tdma_fwd is single-chip only (the "
                                 "Thomas recurrence is sequential in "
                                 "global z)")
            mu_plane, tdma_w = tdma_fwd
            if mu_plane.shape != (ny, nx):
                raise ValueError("tdma_fwd mu plane must be (ny, nx)")
            self._pred_mats = self._pred_mats + (mu_plane,)
            tdma_w = float(tdma_w)
        if tdma_bwd not in ("stored", "analytic"):
            raise ValueError(f"unknown tdma_bwd {tdma_bwd!r}")
        # ``tdma_bwd="analytic"``: the reverse-march corrector rebuilds
        # the Thomas t coefficients from their closed form
        # (t_k = sinh(kφ)/sinh((k+1)φ), one in-kernel exp per plane —
        # `tdma._bwd_coeff_planes`) instead of streaming them, so the
        # predictor drops its t output entirely: one 0.5 GB/step HBM
        # write and one read disappear at 512³.  Costs the analytic
        # variant's ~4e-6 relative t error (e^{−2kφ}−1 cancellation in
        # f32, tdma.py module docs) — below the HIGH transform budget
        # (~2e-5), which is why the projection factory selects it for
        # ``spectral_precision=HIGH`` and keeps "stored" (bit-identical)
        # for HIGHEST.  Demoted to "stored" when the reverse-march
        # corrector itself can't build (the three-pass fallback needs t).
        self.bwd_analytic = self.tdma_fused and tdma_bwd == "analytic"
        consistent = stretch_consistent is not None
        self.consistent = consistent
        self._pred_pins = ()
        self._corr_pins = ()
        if consistent:
            # z-sharded composition is sound: the consistent weights are
            # x/y per-point planes, identical on every z plane, so the
            # same pins serve every shard; only y sharding would need
            # row-sliced pins (as the euler/RK kernels do) and stays
            # unsupported here.
            if global_ny is not None:
                raise ValueError("stretch_consistent does not support "
                                 "y-sharded (global_ny) mode")
            if emit == "btilde" and face_coeffs is None:
                raise ValueError("stretch_consistent with emit='btilde' "
                                 "needs face_coeffs")
            from .stretch import stretch_pins_consistent, stretch_pins_grad
            c_dx, c_dy, c_x, c_y = stretch_consistent
            np_dt = jnp.zeros((), dtype).dtype
            self._pred_pins = stretch_pins_consistent(
                ny, nx, c_dx, c_dy, c_x, c_y, np_dtype=np_dt)
            self._corr_pins = stretch_pins_grad(ny, nx, c_dx, c_dy,
                                                np_dtype=np_dt)
        n_spin_pred = len(self._pred_pins)
        n_spin_corr = len(self._corr_pins)
        dst_prec = dst_precision or jax.lax.Precision.HIGHEST

        def plane_dot_rl(plane, right, left):
            """left · (plane · right) — one xy DST stage pair on the MXU.

            Routed through :func:`rolling.hp_dot_general` so HIGH lowers
            as a manual bf16_3x (Mosaic only lowers DEFAULT/HIGHEST).
            """
            from .rolling import hp_dot_general
            t = hp_dot_general(
                plane, right, (((1,), (0,)), ((), ())),
                precision=dst_prec, preferred_element_type=dtype)
            return hp_dot_general(
                left, t, (((1,), (0,)), ((), ())),
                precision=dst_prec, preferred_element_type=dtype)

        def plane_dot_mats(plane, m0, *rest):
            """One transform application from the pinned mats: the full
            xy pair single-chip / z-sharded, or the x-only dot in
            y-sharded ((z, y)-mesh) mode — rows are sharded there, so the
            y stages run between the sweeps at the wrapper level."""
            if sharded_y:
                from .rolling import hp_dot_general
                return hp_dot_general(
                    plane, m0, (((1,), (0,)), ((), ())),
                    precision=dst_prec, preferred_element_type=dtype)
            return plane_dot_rl(plane, m0, rest[0])
        inv_2dx = 1.0 / (2.0 * dx)
        inv_2dy = 1.0 / (2.0 * dy)
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
        inv_2dz = 1.0 / (2.0 * dz) if dz > 0 else 0.0
        inv_dz2 = 1.0 / (dz * dz) if dz > 0 else 0.0

        # Masks and source-coordinate fields are rebuilt inside each kernel
        # body from iota (pallas kernels cannot capture array constants).
        # In y-sharded mode the row iota shifts by the shard's global row
        # offset (a trailing scalar, exact in f32 below 2^24 rows).
        def rows_cols(y_off=None):
            jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
            if sharded_y:
                jj = jj + y_off.astype(jnp.int32)
            return jj, ii

        def interior_mask(y_off=None):
            jj, ii = rows_cols(y_off)
            return ((jj > 0) & (jj < gny - 1) & (ii > 0)
                    & (ii < nx - 1)).astype(dtype)

        def source_plane(component, y_off=None):
            if component == 0:
                jj, _ = rows_cols(y_off)
                y = ymin + jj.astype(dtype) * dtype(dy)
                return jnp.sin(jnp.asarray(jnp.pi, dtype) * y)
            ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
            x = xmin + ii.astype(dtype) * dtype(dx)
            return jnp.sin(jnp.asarray(2.0 * jnp.pi, dtype) * x)

        def d1x(c):
            return (shift_x(c, 1) - shift_x(c, -1)) * inv_2dx

        def d1y(c):
            return (shift_y(c, 1, ny) - shift_y(c, -1, ny)) * inv_2dy

        def lap(m, c, p):
            out = ((shift_x(c, 1) - 2.0 * c + shift_x(c, -1)) * inv_dx2
                   + (shift_y(c, 1, ny) - 2.0 * c
                      + shift_y(c, -1, ny)) * inv_dy2)
            if inv_dz2:
                out = out + (p - 2.0 * c + m) * inv_dz2
            return out

        def make_predictor(component):
            """component 0: halo=u, planes=(v,w[,T]), source amp_u·sin(πy)
               component 1: halo=v, planes=(u,w[,T]), source amp_v·sin(2πx)
               component 2: halo=w, planes=(u,v[,T]), source 0.
               With buoyancy on, T rides as the last plane input and
               −β·g[component]·(T−T_ref) joins the source."""

            def compute(k, scalars, halos, planes):
                dt, nu, src_u, src_v = scalars[:4]
                y_off = scalars[4] if sharded_y else None
                fm, fc, fp = halos[0]
                a, b = planes[:2]
                mask = interior_mask(y_off)
                if component == 0:
                    uc, vc, wc = fc, a, b
                    src = src_u * source_plane(0, y_off)
                elif component == 1:
                    uc, vc, wc = a, fc, b
                    src = src_v * source_plane(1)
                else:
                    uc, vc, wc = a, b, fc
                    src = 0.0
                if buoy and gravity[component] != 0.0:
                    src = src + ((-dtype(beta) * dtype(gravity[component]))
                                 * (planes[2] - dtype(T_ref)))
                conv = (uc * d1x(fc) + vc * d1y(fc)
                        + wc * ((fp - fm) * inv_2dz))
                star = fc + dt * (-conv + nu * lap(fm, fc, fp) + src)
                star = jnp.clip(star, -CLAMP, CLAMP)
                out = mask * star + (1.0 - mask) * fc
                return [out], None

            return make_rolling_stencil(
                nz, ny, nx, 1, 3 if buoy else 2, 1, compute, dtype,
                n_scalars=5 if sharded_y else 4,
                shell_passthrough=[0], interpret=interpret)

        # Per-component kernels keep uniform compiled constants — in
        # consistent (stretched) mode only the mega kernels are built.
        self.pred_u = None if consistent else make_predictor(0)
        self.pred_v = None if consistent else make_predictor(1)
        self.pred_w = None if consistent else make_predictor(2)

        def div_compute(k, scalars, halos, planes):
            (wm, wc, wp) = halos[0]
            us, vs = planes
            y_off = scalars[1] if sharded_y else None
            mask = interior_mask(y_off)
            div = d1x(us) + d1y(vs) + (wp - wm) * inv_2dz
            return [mask * scalars[0] * div], None

        self.divergence = None if consistent else make_rolling_stencil(
            nz, ny, nx, 1, 2, 1, div_compute, dtype,
            n_scalars=2 if sharded_y else 1,
            interpret=interpret)

        # ---- reverse-march corrector (single-chip DST + Thomas family):
        # the Thomas BACKWARD substitution rides a reverse z-march as an
        # engine carry — the corrector consumes the predictor's (d′[, t])
        # outputs directly and the standalone backward-substitution
        # kernel's 3 HBM passes disappear.  Each x̂ plane is computed by
        # the same zero-initialized x = d′ + t·x recurrence as
        # `tdma._build_bwd` (bit-identical op order in "stored" mode) and
        # inverse-DSTed exactly once; the peeled first/last steps carry
        # the mirror z-shell semantics (p[0] = p[1], p[nz−1] = p[nz−2]).
        # In analytic mode t is rebuilt in-kernel from the closed form
        # (same formula and f64 host coefficient planes as
        # `tdma._build_bwd`'s analytic variant) and the t stream
        # disappears from the step entirely.  Built BEFORE btilde_k and
        # pred_bt: they emit t only when this kernel doesn't replace it.
        self.corr_bwd = None
        self._corr_aux = ()
        if self.tdma_fused and nz >= 4:
            if self.bwd_analytic:
                from .tdma import _bwd_coeff_planes
                np_dt = np.dtype(jnp.zeros((), dtype).dtype)
                # f64 chain from the f32 mu plane (mu's own rounding is
                # ~1e-7 relative — negligible vs the 4e-6 exp error)
                self._corr_aux = (_bwd_coeff_planes(
                    np.asarray(mu_plane, np.float64), tdma_w, np_dt),)

            def invdst(x, mats):
                return plane_dot_rl(x, mats[0], mats[1])

            def corr_bwd_compute(k, scalars, halos, planes, pinned=None,
                                 carry=None, stage=None):
                (d_m, d_c, _d_p) = halos[0]   # d′ window (k−1, k, k+1)
                if self.bwd_analytic:
                    einv, p2 = pinned[n_spin_corr]
                    mats = pinned[n_spin_corr + 1:n_spin_corr + 3]
                else:
                    (t_m, t_c, _t_p) = halos[1]   # t window
                    mats = pinned[n_spin_corr:n_spin_corr + 2]
                us, vs, ws = planes
                mask, _, _ = plane_masks(ny, nx, dtype)
                maskb = mask > 0
                s = scalars[0]
                xh_c, p_k, p_kp1 = carry
                if stage == "first":
                    if self.bwd_analytic:
                        # x̂[nz−2] = d′ (zero-initialized carry; t·0
                        # vanishes, so no t needed at the top plane)
                        xh_c = d_c
                    else:
                        # x̂[nz−2] = d′ + t·0 (same op order as the
                        # standalone backward kernel)
                        xh_c = d_c + t_c * xh_c
                    p_k = invdst(xh_c, mats)
                    p_kp1 = p_k               # mirror p[nz−1] = p[nz−2]
                if stage == "last":
                    p_km1 = p_k               # mirror p[0] = p[1]
                    xh_m = xh_c
                else:
                    if self.bwd_analytic:
                        # t_{k−1} = e^{−φ}(e^{−2(k−1)φ}−1)/(e^{−2kφ·…}−1)
                        # — identical formula to `tdma._build_bwd`'s
                        # analytic variant (underflow at large kφ is ok)
                        kf = (jnp.asarray(k, jnp.int32)
                              - jnp.int32(1)).astype(dtype)
                        e = jnp.exp(-kf * p2)
                        t_m = einv * (e - 1.0) / (e * (einv * einv) - 1.0)
                    xh_m = d_m + t_m * xh_c   # x̂[k−1]
                    p_km1 = invdst(xh_m, mats)
                if consistent:
                    (gxm, gxp), (gxc, gyc), (gym, gyp) = pinned[:3]
                    gradx = (shift_x(p_k, -1) * gxm + p_k * gxc
                             + shift_x(p_k, 1) * gxp)
                    grady = (shift_y(p_k, -1, ny) * gym + p_k * gyc
                             + shift_y(p_k, 1, ny) * gyp)
                else:
                    gradx, grady = d1x(p_k), d1y(p_k)
                u = jnp.where(maskb,
                              jnp.clip(us - s * gradx, -CLAMP, CLAMP), us)
                v = jnp.where(maskb,
                              jnp.clip(vs - s * grady, -CLAMP, CLAMP), vs)
                w = jnp.where(maskb,
                              jnp.clip(ws - s * (p_kp1 - p_km1) * inv_2dz,
                                       -CLAMP, CLAMP), ws)
                m2 = jnp.max(u * u + v * v + w * w)
                return ([u, v, w, p_k],
                        (m2, jnp.max(p_k), jnp.max(jnp.abs(p_k))),
                        [xh_m, p_km1, p_k])

            # input order is [halos..., planes...]: dropping the t halo
            # in analytic mode shifts the us/vs/ws passthrough indices
            n_bh = 1 if self.bwd_analytic else 2
            self.corr_bwd = make_rolling_stencil(
                nz, ny, nx, n_bh, 3, 4,
                corr_bwd_compute, dtype,
                n_scalars=1, reductions=("max", "max", "max"),
                shell_passthrough=[n_bh, n_bh + 1, n_bh + 2, None],
                shell_sources={3: ("p1", "pN2")},
                n_pinned=n_spin_corr + len(self._corr_aux),
                pinned_mats=[m.shape for m in self._corr_mats],
                carry_planes=3, reverse=True, peel_ends=True,
                interpret=interpret)
        if self.corr_bwd is None:
            # three-pass fallback (standalone bwd TDMA) needs t streamed
            self.bwd_analytic = False
            self._corr_aux = ()

        # In single-chip DST mode the standalone b̃ kernel carries the
        # same in-kernel forward transforms (and, with ``tdma_fwd``, the
        # Thomas forward recurrence) as the mega predictor — this is what
        # keeps ``bc_refresh`` steps on the DST-fused family: predictor
        # kernels → refresh hook → this kernel → backward substitution →
        # DST corrector (r4 verdict item 5).
        bt_dst = self.dst and global_nz is None

        def btilde_compute(k, scalars, halos, planes, pinned=None,
                           carry=None):
            """Spectral-solve input in one pass: b̃ = M·p − (ρ/dt)∇·u*,
            M the Neumann-mirror face coefficients (see
            `solvers/poisson/spectral.py`) — skips materializing the
            Poisson rhs and the face-coefficient pass entirely."""
            (wm, wc, wp) = halos[0]
            us, vs, p = planes
            n_base = 1 if global_nz is None else 2
            y_off = scalars[n_base] if sharded_y else None
            mask = interior_mask(y_off)
            div = d1x(us) + d1y(vs) + (wp - wm) * inv_2dz
            jj, ii = rows_cols(y_off)
            coeff = (inv_dx2 * ((ii == 1).astype(dtype)
                                + (ii == nx - 2).astype(dtype))
                     + inv_dy2 * ((jj == 1).astype(dtype)
                                  + (jj == gny - 2).astype(dtype)))
            if inv_dz2:
                if global_nz is None:
                    kg, nz_g = k, nz
                else:
                    # local padded plane k ↔ global plane offset + k − 1
                    kg = scalars[1].astype(jnp.int32) + k - 1
                    nz_g = global_nz
                kf = ((kg == 1).astype(dtype)
                      + (kg == nz_g - 2).astype(dtype))
                coeff = coeff + inv_dz2 * kf
            out = mask * (coeff * p - scalars[0] * div)
            if bt_dst:
                out = plane_dot_rl(out, pinned[0], pinned[1])
            if self.tdma_fused:
                t_c, dp_c = carry
                wf = dtype(tdma_w)
                rec = 1.0 / (pinned[2] + 2.0 * wf - wf * t_c)
                t_c = wf * rec
                dp_c = (out + wf * dp_c) * rec
                outs = ([dp_c] if self.bwd_analytic else [dp_c, t_c])
                return outs, None, [t_c, dp_c]
            return [out], None

        n_bt_out = (1 if self.bwd_analytic else 2) if self.tdma_fused else 1
        self.btilde_k = None if consistent else make_rolling_stencil(
            nz, ny, nx, 1, 3, n_bt_out,
            btilde_compute, dtype,
            n_scalars=(1 if global_nz is None else 2) + int(sharded_y),
            pinned_mats=([m.shape for m in self._pred_mats]
                         if bt_dst else None),
            carry_planes=2 if self.tdma_fused else 0,
            interpret=interpret)

        def corr_xy(component):
            def compute(k, scalars, halos, planes):
                star, p = planes
                y_off = scalars[1] if sharded_y else None
                mask = interior_mask(y_off)
                grad = d1x(p) if component == 0 else d1y(p)
                corr = jnp.clip(star - scalars[0] * grad, -CLAMP, CLAMP)
                return [mask * corr + (1.0 - mask) * star], None

            return make_rolling_stencil(
                nz, ny, nx, 0, 2, 1, compute, dtype,
                n_scalars=2 if sharded_y else 1,
                shell_passthrough=[0], interpret=interpret)

        self.corr_u = None if consistent else corr_xy(0)
        self.corr_v = None if consistent else corr_xy(1)

        def corr_w_compute(k, scalars, halos, planes):
            pm, pc, pp = halos[0]
            (star,) = planes
            y_off = scalars[1] if sharded_y else None
            mask = interior_mask(y_off)
            corr = jnp.clip(star - scalars[0] * (pp - pm) * inv_2dz,
                            -CLAMP, CLAMP)
            return [mask * corr + (1.0 - mask) * star], None

        self.corr_w = None if consistent else make_rolling_stencil(
            nz, ny, nx, 1, 1, 1, corr_w_compute, dtype,
            n_scalars=2 if sharded_y else 1,
            shell_passthrough=[1], interpret=interpret)

        self.ok = all(f is not None for f in
                      (self.pred_u, self.pred_v, self.pred_w,
                       self.divergence, self.corr_u, self.corr_v,
                       self.corr_w))

        # ---- mega kernels (single-chip + z-sharded fast path) ---------------
        # One ±2-window sweep for the whole predictor + Poisson input
        # (8 HBM passes instead of 17: the divergence's off-plane w* values
        # are recomputed from neighbor planes already resident in VMEM),
        # and one corrector sweep producing (u, v, w) plus — single-chip —
        # the step diagnostics as fused max-reductions.  Enabled by the
        # real v5e VMEM budget (~128 MiB); the per-component kernels above
        # remain for the y-sharded path and as fallback.
        #
        # In z-sharded mode (``global_nz``) the predictor operates on a
        # 2-halo local block of nz planes (the wrapper passes nz = nzl+4):
        # local plane k ↔ global plane z_off + k − 2, owned planes are
        # k = 2..nz−3; the computed edge planes k=1 / nz−2 read garbage
        # ring slots and are trimmed by the caller.  The corrector keeps a
        # 1-halo block (local k ↔ global z_off + k − 1, all computed
        # planes owned) and carries no reductions.
        sharded_z = global_nz is not None
        nz_pred = nz + 2 if sharded_z else nz
        nz_g = global_nz if sharded_z else nz

        def pred_bt_compute(k, scalars, halos, planes, pinned=None,
                            carry=None):
            dt_, nu_, su_amp, sv_amp, rod = scalars[:5]
            uw, vw, ww = halos[:3]  # 5-plane windows (k−2 … k+2)
            Tw = halos[3] if buoy else None
            (pc,) = planes
            if sharded_y:
                # global-row mode ((z, y) mesh): masks / sources / face
                # coefficients at global row indices, like the
                # per-component kernels above
                y_off = scalars[6 if sharded_z else 5]
                jj, ii = rows_cols(y_off)
                maskb = ((jj > 0) & (jj < gny - 1) & (ii > 0)
                         & (ii < nx - 1))
            else:
                y_off = None
                mask, jj, ii = plane_masks(ny, nx, dtype)
                maskb = mask > 0
            # global plane index of local plane k (2-halo block)
            kg = (scalars[5].astype(jnp.int32) + k - 2 if sharded_z
                  else k)

            if consistent:
                # exact 3-point nonuniform weights from the pinned planes
                # (`.stretch.stretch_pins_consistent` layout); z uniform
                ((wxm, wxp), (wxc, lxc), (lxm, lxp),
                 (wym, wyp), (wyc, lyc), (lym, lyp),
                 (sy_pin, sx2_pin)) = pinned[:7]

                def d1x_(c):
                    return (shift_x(c, -1) * wxm + c * wxc
                            + shift_x(c, 1) * wxp)

                def d1y_(c):
                    return (shift_y(c, -1, ny) * wym + c * wyc
                            + shift_y(c, 1, ny) * wyp)

                def lap_(m, c, p):
                    out = (shift_x(c, -1) * lxm + c * lxc
                           + shift_x(c, 1) * lxp
                           + shift_y(c, -1, ny) * lym + c * lyc
                           + shift_y(c, 1, ny) * lyp)
                    if inv_dz2:
                        out = out + (p - 2.0 * c + m) * inv_dz2
                    return out
            else:
                d1x_, d1y_, lap_ = d1x, d1y, lap

            if with_sources:
                if consistent:
                    src_u = su_amp * sy_pin
                    src_v = sv_amp * sx2_pin
                else:
                    src_u = su_amp * source_plane(0, y_off)
                    src_v = sv_amp * source_plane(1)
            else:
                src_u = src_v = 0.0

            def bsrc(component, wslot):
                """−β·g[c]·(T−T_ref) at window slot ``wslot`` (2 ≡ plane k)."""
                if not (buoy and gravity[component] != 0.0):
                    return 0.0
                return ((-dtype(beta) * dtype(gravity[component]))
                        * (Tw[wslot] - dtype(T_ref)))

            def star(f3, uc_, vc_, wc_, src, kq):
                fm, fc, fp = f3
                conv = uc_ * d1x_(fc) + vc_ * d1y_(fc) + wc_ * ((fp - fm)
                                                                * inv_2dz)
                s = fc + dt_ * (-conv + nu_ * lap_(fm, fc, fp) + src)
                s = jnp.clip(s, -CLAMP, CLAMP)
                # in-plane shell passthrough + global z-shell select (the
                # k±1 w-stars touch garbage edge planes at k=1 / nz−2;
                # where-select keeps NaN garbage out).
                s = jnp.where(maskb, s, fc)
                interior_z = (kq > 0) & (kq < nz_g - 1)
                return jnp.where(interior_z, s, fc)

            us = star(uw[1:4], uw[2], vw[2], ww[2], src_u + bsrc(0, 2), kg)
            vs = star(vw[1:4], uw[2], vw[2], ww[2], src_v + bsrc(1, 2), kg)
            ws = star(ww[1:4], uw[2], vw[2], ww[2], bsrc(2, 2), kg)
            ws_m = star(ww[0:3], uw[1], vw[1], ww[1], bsrc(2, 1), kg - 1)
            ws_p = star(ww[2:5], uw[3], vw[3], ww[3], bsrc(2, 3), kg + 1)

            div = d1x_(us) + d1y_(vs) + (ws_p - ws_m) * inv_2dz
            if emit == "btilde":
                if consistent:
                    # nonuniform off-diagonal face weights toward the
                    # dropped shell neighbor (nonuniform_face_coeffs)
                    coeff = (dtype(face_coeffs[0])
                             * (ii == 1).astype(dtype)
                             + dtype(face_coeffs[1])
                             * (ii == nx - 2).astype(dtype)
                             + dtype(face_coeffs[2])
                             * (jj == 1).astype(dtype)
                             + dtype(face_coeffs[3])
                             * (jj == ny - 2).astype(dtype))
                else:
                    coeff = (inv_dx2 * ((ii == 1).astype(dtype)
                                        + (ii == nx - 2).astype(dtype))
                             + inv_dy2 * ((jj == 1).astype(dtype)
                                          + (jj == gny - 2).astype(dtype)))
                if inv_dz2:
                    kf = ((kg == 1).astype(dtype)
                          + (kg == nz_g - 2).astype(dtype))
                    coeff = coeff + inv_dz2 * kf
                out = jnp.where(maskb, coeff * pc - rod * div, 0.0)
                if self.dst:
                    # forward DST of the b̃ plane, in-kernel on the MXU
                    # (overlaps the window streaming for free): the xy
                    # pair single-chip / z-sharded, x-only on (z, y)
                    # meshes (rows sharded — the y stage runs outside)
                    out = plane_dot_mats(
                        out, *pinned[n_spin_pred:n_spin_pred + 2])
                if self.tdma_fused:
                    # Thomas forward step on the transformed plane: the
                    # (t, d′) recurrence rides the engine carry; padded
                    # modes have r = 0 (zero F rows) → d′ = 0 there.
                    t_c, dp_c = carry
                    wf = dtype(tdma_w)
                    rec = 1.0 / (pinned[n_spin_pred + 2]
                                 + 2.0 * wf - wf * t_c)
                    t_c = wf * rec
                    dp_c = (out + wf * dp_c) * rec
                    outs = ([us, vs, ws, dp_c] if self.bwd_analytic
                            else [us, vs, ws, dp_c, t_c])
                    return outs, None, [t_c, dp_c]
            else:
                out = jnp.where(maskb, rod * div, 0.0)
            return [us, vs, ws, out], None

        self.pred_bt = None
        # The mega kernels ride single-chip + z-sharded always, and the
        # (z, y) 2D mesh in DST mode (global-row structure + in-kernel
        # x-only transforms; the per-component kernels keep the non-DST
        # zy path).
        build_mega = global_ny is None or self.dst
        if build_mega:
            n_pred_out = ((4 if self.bwd_analytic else 5)
                          if self.tdma_fused else 4)
            self.pred_bt = make_rolling_stencil(
                nz_pred, ny, nx, 4 if buoy else 3, 1, n_pred_out,
                pred_bt_compute, dtype,
                n_scalars=5 + int(sharded_z) + int(sharded_y),
                shell_passthrough=[0, 1, 2, None, None][:n_pred_out],
                halo_window=2,
                n_pinned=n_spin_pred,
                pinned_mats=([m.shape for m in self._pred_mats]
                             if self.dst else None),
                carry_planes=2 if self.tdma_fused else 0,
                interpret=interpret)

        def corr_all_compute(k, scalars, halos, planes, pinned=None):
            (pm, pc, pp) = halos[0]
            us, vs, ws = planes
            if sharded_y:
                jj, ii = rows_cols(scalars[1])
                maskb = ((jj > 0) & (jj < gny - 1) & (ii > 0)
                         & (ii < nx - 1))
            else:
                mask, _, _ = plane_masks(ny, nx, dtype)
                maskb = mask > 0
            s = scalars[0]
            if consistent:
                # consistent pressure gradient from the pinned
                # first-derivative triples (`.stretch.stretch_pins_grad`)
                (gxm, gxp), (gxc, gyc), (gym, gyp) = pinned[:3]
                gradx = (shift_x(pc, -1) * gxm + pc * gxc
                         + shift_x(pc, 1) * gxp)
                grady = (shift_y(pc, -1, ny) * gym + pc * gyc
                         + shift_y(pc, 1, ny) * gyp)
            else:
                gradx, grady = d1x(pc), d1y(pc)
            u = jnp.where(maskb,
                          jnp.clip(us - s * gradx, -CLAMP, CLAMP), us)
            v = jnp.where(maskb,
                          jnp.clip(vs - s * grady, -CLAMP, CLAMP), vs)
            w = jnp.where(maskb,
                          jnp.clip(ws - s * (pp - pm) * inv_2dz,
                                   -CLAMP, CLAMP), ws)
            outs = [u, v, w] + ([pc] if self.dst else [])
            if sharded_z or sharded_y:
                return outs, None
            m2 = jnp.max(u * u + v * v + w * w)
            return outs, (m2, jnp.max(pc), jnp.max(jnp.abs(pc)))

        def corr_inverse_dst(plane, mats):
            """Arrival hook: x̂ plane (z-line-solve output, transform
            space) → physical p plane via the mirror-extended inverse —
            the xy pair single-chip / z-sharded, x-only on (z, y) meshes
            (y already inverse-transformed by the wrapper's cross-shard
            stage; the halo rows arrive in x-transform space and convert
            here too)."""
            return plane_dot_mats(plane, *mats)

        self.corr_all = None
        if build_mega:
            self.corr_all = make_rolling_stencil(
                nz, ny, nx, 1, 3, 4 if self.dst else 3, corr_all_compute,
                dtype, n_scalars=1 + int(sharded_y),
                reductions=(None if sharded_z or sharded_y
                            else ("max", "max", "max")),
                shell_passthrough=([1, 2, 3, None] if self.dst
                                   else [1, 2, 3]),
                shell_sources=({3: ("p1", "pN2")}
                               if self.dst and not sharded_z else None),
                n_pinned=n_spin_corr,
                pinned_mats=([m.shape for m in self._corr_mats]
                             if self.dst else None),
                halo_transform={0: corr_inverse_dst} if self.dst else None,
                interpret=interpret)

        self.mega_ok = (self.pred_bt is not None
                        and self.corr_all is not None)

    # ---- step pieces -------------------------------------------------------

    def predictor_poisson_input(self, u, v, w, p, dt, nu,
                                src_u_amp, src_v_amp, rho_over_dt, T=None,
                                z_offset=None, y_offset=None):
        """Mega path: (u*, v*, w*, b̃-or-rhs) in ONE sweep.  With buoyancy
        compiled in, pass the step-start temperature ``T``.  In DST mode
        the fourth output is the xy-transformed b̃ (z-TDMA input); with
        ``tdma_fwd`` also set, outputs are (u*, v*, w*, d′, t) — the
        Thomas-forward-swept planes ready for backward substitution.

        In z-sharded mode (``global_nz``) the field arguments are 2-halo
        local blocks (nzl+4 planes) and ``z_offset`` is the global plane
        index of the shard's first OWNED plane; output planes 2..nzl+1
        are valid (callers trim [2:-2]).  On a (z, y) 2D mesh
        (``global_ny`` also set) the blocks additionally carry 4 halo
        rows per y side and ``y_offset`` is the global row index of
        padded local row 0 (callers trim [2:-2, 4:-4]); the fourth output
        is the **x-only**-transformed b̃ for the wrapper's cross-shard
        y/z solve."""
        parts = [jnp.asarray(dt), jnp.asarray(nu),
                 jnp.asarray(src_u_amp), jnp.asarray(src_v_amp),
                 jnp.asarray(rho_over_dt)]
        if self.global_nz is not None:
            parts.append(jnp.asarray(z_offset).astype(parts[0].dtype))
        s = self._with_y(parts, y_offset)
        extras = (tuple(self._pred_pins)
                  + (tuple(self._pred_mats) if self.dst else ()))
        if self.buoyant:
            return self.pred_bt(s, u, v, w, T, p, *extras)
        return self.pred_bt(s, u, v, w, p, *extras)

    def corrector_diag(self, us, vs, ws, p, dt_over_rho, y_offset=None):
        """Mega path: (u, v, w, max|vel|² , max p, max|p|) in ONE sweep.

        The reductions cover the computed interior planes; callers fold in
        the two z-shell planes with cheap jnp face maxima.  In DST mode
        ``p`` is the z-TDMA output x̂ (transform space): planes are
        inverse-DSTed on window arrival, and the physical pressure comes
        back as a fourth output (mirror z-shells) before the reductions:
        (u, v, w, p, max|vel|², max p, max|p|).

        In z-sharded mode the arguments are 1-halo local blocks (x̂ halos
        exchanged in transform space), no reductions are accumulated, and
        the return is just (u, v, w[, p]) — trim [1:-1] for owned
        planes.  On a (z, y) 2D mesh the blocks also carry 4 y-halo rows
        (x̂ rows exchanged in x-transform space; the arrival hook
        inverse-x-DSTs whole padded planes once) and ``y_offset`` is
        required — trim [1:-1, 4:-4]."""
        s = self._with_y([jnp.asarray(dt_over_rho)], y_offset)
        extras = (tuple(self._corr_pins)
                  + (tuple(self._corr_mats) if self.dst else ()))
        return self.corr_all(s, p, us, vs, ws, *extras)

    def corrector_bwd_diag(self, us, vs, ws, *args):
        """Reverse-march mega corrector (single-chip DST + Thomas
        family): consumes the predictor's (d′, t) — or just (d′,) in
        analytic mode, where the t coefficients are rebuilt in-kernel
        from their closed form — directly: the Thomas backward
        substitution rides the reverse z-march as an engine carry and
        each x̂ plane is inverse-DSTed exactly once in-sweep, so the
        standalone backward-substitution kernel (and its 3 HBM passes)
        disappears: the whole spectral projection step is TWO marching
        kernels.  Call as ``(us, vs, ws, *pin, dt_over_rho)``.  Returns
        (u, v, w, p, max|vel|², max p, max|p|)."""
        *pin, dt_over_rho = args
        s = jnp.asarray(dt_over_rho)[None]
        extras = (tuple(self._corr_pins) + tuple(self._corr_aux)
                  + tuple(self._corr_mats))
        return self.corr_bwd(s, *pin, us, vs, ws, *extras)

    def _with_y(self, parts, y_offset):
        """Append the global-row-offset scalar in y-sharded mode."""
        if self.global_ny is None:
            return jnp.stack(parts)
        return jnp.stack(parts
                         + [jnp.asarray(y_offset).astype(parts[0].dtype)])

    def predictor(self, u, v, w, dt, nu, src_u_amp, src_v_amp, T=None,
                  y_offset=None):
        """(u*, v*, w*) with caller shells preserved.  With buoyancy
        compiled in, pass the step-start temperature ``T``; in y-sharded
        mode (``global_ny`` set) pass ``y_offset`` — the global row index
        of padded local row 0."""
        s = self._with_y([jnp.asarray(dt), jnp.asarray(nu),
                          jnp.asarray(src_u_amp), jnp.asarray(src_v_amp)],
                         y_offset)
        extra = (T,) if self.buoyant else ()
        (us,) = self.pred_u(s, u, v, w, *extra)
        (vs,) = self.pred_v(s, v, u, w, *extra)
        (ws,) = self.pred_w(s, w, u, v, *extra)
        return us, vs, ws

    def rhs(self, us, vs, ws, rho_over_dt, y_offset=None):
        s = self._with_y([jnp.asarray(rho_over_dt)], y_offset)
        (out,) = self.divergence(s, ws, us, vs)
        return out

    def btilde(self, us, vs, ws, p, rho_over_dt, z_offset=None,
               y_offset=None):
        """Fused spectral-solve input (zero shell, full shape).

        In sharded mode (``global_nz`` set) pass ``z_offset`` — the global
        plane index of the shard's first real plane; in y-sharded mode
        (``global_ny`` set) also ``y_offset``.  In single-chip DST mode
        the output is the xy-transformed b̃ (z line-solve input); with
        ``tdma_fwd`` also set, a ``(d′, t)`` pair ready for backward
        substitution."""
        rod = jnp.asarray(rho_over_dt)
        parts = [rod]
        if self.global_nz is not None:
            parts.append(jnp.asarray(z_offset).astype(rod.dtype))
        scal = self._with_y(parts, y_offset)
        mats = (tuple(self._pred_mats)
                if self.dst and self.global_nz is None else ())
        outs = self.btilde_k(scal, ws, us, vs, p, *mats)
        if self.tdma_fused:
            return outs
        (out,) = outs
        return out

    def corrector(self, us, vs, ws, p, dt_over_rho, y_offset=None):
        s = self._with_y([jnp.asarray(dt_over_rho)], y_offset)
        (u,) = self.corr_u(s, us, p)
        (v,) = self.corr_v(s, vs, p)
        (w,) = self.corr_w(s, p, ws)
        return u, v, w
