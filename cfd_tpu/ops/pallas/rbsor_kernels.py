"""Fused Pallas Red-Black SOR sweep (3D rolling-plane kernel).

The reference ships a GPU Red-Black SOR
(`lib/src/solvers/linear/gpu/poisson_solver_redblack_sor_gpu.cu`) that
launches one kernel per color plus a residual kernel — ≥3 full HBM
round-trips per iteration.  Here one hand-scheduled rolling-plane kernel
performs, per sweep, in a single streaming pass (read x once, read rhs
once, write x once — 3 HBM sweeps total):

  1. the red half-sweep (cells with (i+j+k) % 2 == 0),
  2. the black half-sweep reading the red-updated neighbor planes from a
     VMEM ring (the in-z wavefront: red[k+1] is produced one step ahead of
     black[k]),
  3. the default Neumann boundary mirror (`linear_solver.c:348-392` /
     ``apply_neumann_scalar``: x-columns, then y-rows, then z-planes),
  4. the ∞-norm residual ‖∇²x_new − rhs‖∞ of the *post-BC* iterate,
     lagging one more plane behind the black front — so the residual the
     reference computes with a separate sweep (`linear_solver.c:304-346`)
     comes for free every iteration.

Semantics match ``stationary.make_redblack_sor``'s jnp sweep exactly
(same update formulas, same Neumann corner ownership), so iteration
counts and fixed points are identical to the jnp path and to the C
reference's sequential two-color sweeps.

Pipeline (step c of the fori loop, c = 1..nz−1):

  fetch x/rhs[c+3]  →  red[c+1] from x[c..c+2]  →  newx[c] (black + BC
  mirror) from red[c−1..c+1]  →  write newx[c]  →  residual[c−1] from
  newx[c−2..c] (z-shell neighbors substituted at k=1 / k=nz−2, since the
  Neumann mirror makes x[0] = x[1]).

VMEM: 4-slot x ring + 5-slot rhs staging + 4-slot red ring + 4-slot newx
ring + 2 z-shell snapshots = 19 plane buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rolling import _VMEM_BUDGET, shift_x, shift_y


def rbsor_supported(nz: int, ny: int, nx: int) -> bool:
    if nz < 3 or nx % 128 != 0 or ny % 8 != 0:
        return False
    return 19 * ny * nx * 4 <= _VMEM_BUDGET


def make_rbsor_sweep(nz: int, ny: int, nx: int,
                     inv_dx2: float, inv_dy2: float, inv_dz2: float,
                     inv_factor: float, omega: float,
                     dtype=jnp.float32, interpret: bool = False):
    """Build fn(x, rhs) → (x_new, residual_inf), or None if unsupported.

    One full RB-SOR sweep + Neumann BC mirror + interior ∞-norm residual
    of the result, all in one pass.
    """
    if not rbsor_supported(nz, ny, nx):
        return None
    rows = nz * ny

    def kernel(x_hbm, rhs_hbm, out_hbm, res_ref,
               xring, rring, redring, newring, shellbuf, in_sems, out_sems):
        jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        row_interior = (jj > 0) & (jj < ny - 1) & (ii > 0) & (ii < nx - 1)
        parity_ij = jnp.bitwise_and(ii + jj, 1)  # (i+j) % 2 per cell

        def in_dma(k, slot):
            return (pltpu.make_async_copy(
                        x_hbm.at[pl.ds(k * ny, ny), :],
                        xring.at[jax.lax.rem(jnp.asarray(k, jnp.int32),
                                             jnp.int32(4))],
                        in_sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        rhs_hbm.at[pl.ds(k * ny, ny), :],
                        rring.at[jax.lax.rem(jnp.asarray(k, jnp.int32),
                                             jnp.int32(5))],
                        in_sems.at[slot, 1]))

        def out_dma(k, slot):
            return pltpu.make_async_copy(
                newring.at[slot], out_hbm.at[pl.ds(k * ny, ny), :],
                out_sems.at[slot])

        def slot4(k):
            return jax.lax.rem(jnp.asarray(k, jnp.int32) + jnp.int32(4),
                               jnp.int32(4))

        def slot5(k):
            return jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(5))

        def gs_neighbors(xm, xc, xp):
            """Neighbor sum of the 7-point stencil (matches the jnp sweep:
            roll-based nb, then gs = -(rhs - nb)·inv_factor)."""
            nb = ((shift_x(xc, 1) + shift_x(xc, -1)) * inv_dx2
                  + (shift_y(xc, 1, ny) + shift_y(xc, -1, ny)) * inv_dy2)
            if inv_dz2:
                nb = nb + (xp + xm) * inv_dz2
            return nb

        def color_update(k, color, xm, xc, xp, rhs_plane):
            """Masked SOR update of one color at plane k; cells outside the
            mask (other color, shells) keep xc.

            (i+j+k) even ⇔ (i+j)&1 == k&1, so the red mask is a vector
            equality against the scalar plane parity (vector int rem is
            unreliable on Mosaic)."""
            k = jnp.asarray(k, jnp.int32)
            kpar = jax.lax.rem(k, jnp.int32(2))
            color_mask = (parity_ij == kpar) if color == 0 \
                else (parity_ij != kpar)
            mask = row_interior & color_mask
            interior_k = (k > 0) & (k < nz - 1)
            gs = -(rhs_plane - gs_neighbors(xm, xc, xp)) * inv_factor
            upd = xc + omega * (gs - xc)
            return jnp.where(mask & interior_k, upd, xc)

        def bc_mirror(p):
            """In-plane Neumann mirror: x-columns first, then y-rows
            (matching apply_neumann_scalar's corner ownership)."""
            p = jnp.where(ii == 0, shift_x(p, 1), p)
            p = jnp.where(ii == nx - 1, shift_x(p, -1), p)
            p = jnp.where(jj == 0, shift_y(p, 1, ny), p)
            p = jnp.where(jj == ny - 1, shift_y(p, -1, ny), p)
            return p

        # ---- prologue: planes 0..2, red[0] (copy) and red[1] -------------
        d = in_dma(0, 0)
        d[0].start(); d[1].start()
        d = in_dma(1, 1)
        d[0].start(); d[1].start()
        d = in_dma(0, 0)
        d[0].wait(); d[1].wait()
        d = in_dma(2, 0)
        d[0].start(); d[1].start()
        d = in_dma(1, 1)
        d[0].wait(); d[1].wait()
        d = in_dma(2, 0)
        d[0].wait(); d[1].wait()
        redring[pl.ds(0, 1)] = xring[pl.ds(0, 1)]
        red1 = color_update(1, 0, xring[0], xring[1], xring[2], rring[1])
        redring[pl.ds(1, 1)] = red1[None]
        if nz >= 4:
            d = in_dma(3, 1)
            d[0].start(); d[1].start()

        # ---- main loop: c = 1..nz−1 --------------------------------------
        def body(c, res_acc):
            c = jnp.asarray(c, jnp.int32)

            # plane c+2 arrival (started at step c−1; plane 3 in prologue)
            @pl.when(c + 2 <= nz - 1)
            def _():
                dx_, dr_ = in_dma(c + 2, jax.lax.rem(c + 2, jnp.int32(2)))
                dx_.wait(); dr_.wait()

            # prefetch plane c+3
            @pl.when(c + 3 <= nz - 1)
            def _():
                dx_, dr_ = in_dma(c + 3, jax.lax.rem(c + 3, jnp.int32(2)))
                dx_.start(); dr_.start()

            # red[c+1] (k = nz−1 degenerates to a copy via the mask)
            @pl.when(c + 1 <= nz - 1)
            def _():
                k1 = c + 1
                red = color_update(k1, 0, xring[slot4(k1 - 1)],
                                   xring[slot4(k1)], xring[slot4(k1 + 1)],
                                   rring[slot5(k1)])
                redring[pl.ds(slot4(k1), 1)] = red[None]

            # newx[c]: black half-sweep on the red planes + BC mirror
            @pl.when(c <= nz - 2)
            def _():
                blk = color_update(c, 1, redring[slot4(c - 1)],
                                   redring[slot4(c)], redring[slot4(c + 1)],
                                   rring[slot5(c)])
                blk = bc_mirror(blk)
                s = slot4(c)

                @pl.when(c >= 5)
                def _():
                    out_dma(c - 4, s).wait()

                newring[pl.ds(s, 1)] = blk[None]
                out_dma(c, s).start()

                # Snapshot the planes the Neumann z-mirror needs at the
                # epilogue (the ring slots recycle long before then).
                @pl.when(c == 1)
                def _():
                    shellbuf[pl.ds(0, 1)] = blk[None]

                @pl.when(c == nz - 2)
                def _():
                    shellbuf[pl.ds(1, 1)] = blk[None]

            # residual[c−1] on the post-BC iterate (z-mirror substitution
            # at the first/last interior planes).  Computed unconditionally
            # and masked by (c ≥ 2): at c=1 the rings hold garbage, which
            # the final scalar where-select discards.
            k = c - 1
            nm = newring[slot4(k - 1)]
            nc = newring[slot4(k)]
            npl = newring[slot4(k + 1)]
            zm = jnp.where(k == 1, nc, nm)
            zp = jnp.where(k == nz - 2, nc, npl)
            lap = ((shift_x(nc, 1) - 2.0 * nc + shift_x(nc, -1))
                   * inv_dx2
                   + (shift_y(nc, 1, ny) - 2.0 * nc
                      + shift_y(nc, -1, ny)) * inv_dy2)
            if inv_dz2:
                lap = lap + (zp - 2.0 * nc + zm) * inv_dz2
            r = jnp.abs(lap - rring[slot5(k)])
            plane_max = jnp.max(jnp.where(row_interior, r, 0.0))
            return jnp.where(c >= 2, jnp.maximum(res_acc, plane_max),
                             res_acc)

        res = jax.lax.fori_loop(1, nz, body, jnp.zeros((), dtype))

        # ---- epilogue: drain writes, z-shell mirror planes ----------------
        # In-loop waits fire at steps c ∈ [5, nz−2] (planes 1..nz−6); the
        # last four written planes are still outstanding here.
        for k in range(max(1, nz - 5), nz - 1):
            out_dma(k, k % 4).wait()
        # out[0] ← newx[1], out[nz−1] ← newx[nz−2] (post-BC z mirror)
        shell = pltpu.make_async_copy(
            shellbuf.at[0], out_hbm.at[pl.ds(0, ny), :], out_sems.at[0])
        shell.start()
        shell.wait()
        shell = pltpu.make_async_copy(
            shellbuf.at[1], out_hbm.at[pl.ds((nz - 1) * ny, ny), :],
            out_sems.at[1])
        shell.start()
        shell.wait()
        res_ref[0, 0] = res

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, nx), dtype),
                   jax.ShapeDtypeStruct((1, 1), dtype)],
        scratch_shapes=[
            pltpu.VMEM((4, ny, nx), dtype),
            pltpu.VMEM((5, ny, nx), dtype),
            pltpu.VMEM((4, ny, nx), dtype),
            pltpu.VMEM((4, ny, nx), dtype),
            pltpu.VMEM((2, ny, nx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024),
        interpret=interpret,
    )

    def sweep(x, rhs):
        out, res = call(x.reshape(rows, nx), rhs.reshape(rows, nx))
        return out.reshape(nz, ny, nx), res[0, 0]

    return sweep
