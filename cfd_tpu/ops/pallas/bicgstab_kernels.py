"""Fused Pallas kernels for the BiCGSTAB pressure solve.

The reference ships a device-resident BiCGSTAB
(`lib/src/solvers/linear/gpu/poisson_solver_bicgstab_gpu.cu`) built from
~12 mini-BLAS kernel launches per iteration.  Here one iteration is
restructured into exactly THREE streaming passes on the rolling-plane
engine (every field plane fetched from HBM once per pass):

  1. ``pv``:  p' = r + β(p − ω v)   and  v' = A p'  and  ⟨r̂, v'⟩
     — A p' is computed without materializing p' first: p' is re-derived
     elementwise from the (r, p, v) plane windows already in VMEM.
  2. ``st``:  s = r − α v'  and  t = A s  and  (⟨s,s⟩, ⟨t,s⟩, ⟨t,t⟩).
  3. ``xr``:  x += α p' + ω s,  r = s − ω t,  and  (⟨r,r⟩, ⟨r̂,r⟩)
     — the ⟨r̂,r⟩ accumulated here is next iteration's ρ, which removes
     the separate ρ = ⟨r̂,r⟩ pass the textbook loop starts with.

All work vectors live in the Dirichlet-0 correction space (zero boundary
shell — `linear_solver_cg.c:103-123` semantics), so A = −∇² masked to the
interior, and shells stay exactly zero through every pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rolling import make_rolling_stencil, plane_masks, rolling_supported, \
    shift_x, shift_y


def bicgstab_kernels_supported(nz: int, ny: int, nx: int) -> bool:
    return (rolling_supported(nz, ny, nx, 3, 1, 2)
            and rolling_supported(nz, ny, nx, 2, 0, 2)
            and rolling_supported(nz, ny, nx, 0, 5, 2))


class BiCGSTABKernels:
    """The three fused passes for one (problem geometry, dtype).

    ``global_nz``/``global_ny``: sharded modes (the `make_lap_dot_sharded`
    convention) — the pv/st passes operate on halo-padded local blocks,
    take trailing z_off (and y_off) scalars, mask their stencil OUTPUTS to
    the global Dirichlet-0 interior (the work-vector COMBINATIONS stay
    unmasked: inputs are zero on the global shell, and halo planes/rows
    must carry the neighbor's real values into the 7-point apply), and —
    under y sharding — restrict the dot contributions to OWNED rows.  The
    xr pass is pointwise, so sharded callers run the plain kernel on a
    zero-padded owned block.
    """

    def __init__(self, nz, ny, nx, inv_dx2, inv_dy2, inv_dz2,
                 dtype=jnp.float32, interpret=False,
                 global_nz=None, global_ny=None):
        self.shape = (nz, ny, nx)
        sharded = global_nz is not None
        sharded_y = global_ny is not None
        gnz = nz if global_nz is None else global_nz
        gny = ny if global_ny is None else global_ny
        n_extra = (1 if sharded else 0) + (1 if sharded_y else 0)

        def lap(zm, zc, zp):
            out = ((shift_x(zc, 1) - 2.0 * zc + shift_x(zc, -1)) * inv_dx2
                   + (shift_y(zc, 1, ny) - 2.0 * zc
                      + shift_y(zc, -1, ny)) * inv_dy2)
            if inv_dz2:
                out = out + (zp - 2.0 * zc + zm) * inv_dz2
            return out

        def masks(extra):
            """(in-plane interior mask, owned-row dot mask, global-z gate
            fn) from the trailing scalars."""
            if sharded_y:
                z_off, y_off = extra
                jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
                ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
                jg = jj + y_off.astype(jnp.int32)
                mask = ((jg > 0) & (jg < gny - 1) & (ii > 0)
                        & (ii < nx - 1)).astype(dtype)
                own = ((jj >= 4) & (jj < ny - 4)).astype(dtype)
            else:
                mask, _, _ = plane_masks(ny, nx, dtype)
                own = None
                z_off = extra[0] if sharded else None

            def zin(k):
                if not sharded:
                    return 1.0
                gk = k + z_off.astype(jnp.int32)
                return ((gk > 0) & (gk < gnz - 1)).astype(dtype)

            return mask, own, zin

        # ---- pass 1: (r, p, v | r̂; β, ω) → (p', Ap', ⟨r̂,Ap'⟩) ----------
        def pv_compute(k, scalars, halos, planes):
            beta, omega = scalars[:2]
            rw, pw, vw = halos
            (rhat,) = planes
            mask, own, zin = masks(scalars[2:])
            # p' at k−1, k, k+1 from the windows (inputs are zero-shelled,
            # so the combination needs no extra plane masking; the in-plane
            # mask keeps the roll wrap out of the operator).
            wm, wc, wp = (rw[d] + beta * (pw[d] - omega * vw[d])
                          for d in range(3))
            wc = wc * mask
            ap = -lap(wm, wc, wp) * mask * zin(k)
            dot = rhat * ap if own is None else rhat * ap * own
            return [wc * zin(k), ap], (jnp.sum(dot),)

        self.pv = make_rolling_stencil(
            nz, ny, nx, 3, 1, 2, pv_compute, dtype,
            n_scalars=2 + n_extra,
            reductions=("sum",), interpret=interpret)

        # ---- pass 2: (r, v' ; α) → (s, t, ⟨s,s⟩, ⟨t,s⟩, ⟨t,t⟩) -----------
        def st_compute(k, scalars, halos, planes):
            alpha = scalars[0]
            rw, vw = halos
            mask, own, zin = masks(scalars[1:])
            sm, sc, sp = (rw[d] - alpha * vw[d] for d in range(3))
            sc = sc * mask
            t = -lap(sm, sc, sp) * mask * zin(k)
            sc = sc * zin(k)
            dots = ((sc * sc, t * sc, t * t) if own is None
                    else (sc * sc * own, t * sc * own, t * t * own))
            return [sc, t], tuple(jnp.sum(d) for d in dots)

        self.st = make_rolling_stencil(
            nz, ny, nx, 2, 0, 2, st_compute, dtype,
            n_scalars=1 + n_extra,
            reductions=("sum", "sum", "sum"), interpret=interpret)

        # ---- pass 3: (x, p', s, t, r̂ ; α, ω) → (x', r', ⟨r',r'⟩, ⟨r̂,r'⟩) -
        def xr_compute(k, scalars, halos, planes):
            alpha, omega = scalars
            x, pn, s, t, rhat = planes
            x2 = x + alpha * pn + omega * s
            r2 = s - omega * t
            return [x2, r2], (jnp.sum(r2 * r2), jnp.sum(rhat * r2))

        self.xr = make_rolling_stencil(
            nz, ny, nx, 0, 5, 2, xr_compute, dtype, n_scalars=2,
            reductions=("sum", "sum"), shell_passthrough=[0, None],
            interpret=interpret)

        self.ok = all(f is not None for f in (self.pv, self.st, self.xr))

    def pass_pv(self, r, p, v, rhat, beta, omega):
        s = jnp.stack([jnp.asarray(beta), jnp.asarray(omega)])
        return self.pv(s, r, p, v, rhat)

    def pass_st(self, r, v, alpha):
        return self.st(jnp.asarray(alpha)[None], r, v)

    def pass_xr(self, x, pn, s, t, rhat, alpha, omega):
        sc = jnp.stack([jnp.asarray(alpha), jnp.asarray(omega)])
        return self.xr(sc, x, pn, s, t, rhat)
