"""Fused Pallas kernels for the multigrid V-cycle smoother.

The multigrid solver (`solvers/poisson/multigrid.py`) smooths with
red-black Gauss-Seidel in the Dirichlet-0 correction space.  The jnp
sweep costs ~4 roll-limited HBM passes per color (~60 GB/s effective);
this module supplies the same one-pass wavefront trick as the RB-SOR
kernel (`rbsor_kernels.py`): red and black half-sweeps in a single
streaming pass (red[k+1] is produced one plane ahead of black[k] from a
VMEM ring), optionally emitting the post-sweep residual FIELD
r = b − A·x_new one more plane behind — the input the restriction needs,
for free.

Multigrid grids are vertex-centered 2^k+1 (513, 257, …), which breaks the
rolling engine's lane/sublane alignment (nx % 128, ny % 8).  The kernels
therefore operate on LANE-PADDED arrays: logical (nz, ny, nx) data stored
as (nz, nyp, nxp) with zero padding, masks keyed on the logical dims.
The padding rows/lanes are never updated (masked) and never read by an
unmasked stencil, so they stay zero — callers pad once per V-cycle level
and slice back at level exit (`multigrid._v_cycle` fast path).

Semantics are identical to `multigrid._rb_sweep` (red-then-black order,
gs = (b + nb)·inv_factor, zero shells), so the fused V-cycle converges
iteration-for-iteration with the jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rolling import _VMEM_BUDGET, shift_x, shift_y


def pad_dims(ny: int, nx: int) -> tuple:
    """Smallest (nyp, nxp) satisfying the TPU tiling constraints."""
    nyp = ((ny + 7) // 8) * 8
    nxp = ((nx + 127) // 128) * 128
    return nyp, nxp


def mg_sweep_supported(nz: int, ny: int, nx: int) -> bool:
    if nz < 3:
        return False
    nyp, nxp = pad_dims(ny, nx)
    return 23 * nyp * nxp * 4 <= _VMEM_BUDGET


def make_mg_rb_sweep(nz: int, ny: int, nx: int,
                     inv_dx2: float, inv_dy2: float, inv_dz2: float,
                     inv_factor: float, emit_residual: bool,
                     dtype=jnp.float32, interpret: bool = False,
                     global_nz: int = None, global_ny: int = None,
                     first_color: str = "red"):
    """Build fn(x_pad, b_pad) → x_new_pad [, residual_pad], or None.

    One full red-black Gauss-Seidel sweep of A x = b (A = −∇² on the
    Dirichlet-0 interior) on (nz, nyp, nxp) lane-padded arrays; with
    ``emit_residual`` the post-sweep r = b − A·x_new rides out of the same
    pass (zero shell, zero padding).

    ``global_nz``: sharded (z-decomposed) mode — the kernel operates on a
    TWO-plane halo-padded local block (planes 0-1 and nz−2..nz−1 are the
    ring neighbors' edge planes) and takes a leading
    ``(z_off,)`` scalar array, the global plane index of padded plane 0;
    the Dirichlet-0 interior masks key on global planes.  Red values are
    correct for padded planes 1..nz−2 (their x-neighbors are present), so
    the black half-sweep — and therefore x_new — is exact on the real
    planes 2..nz−3.  The emitted residual is exact on real planes EXCEPT
    the first/last real plane of each shard, whose z-neighbor's post-sweep
    value lives across the boundary — callers patch those two planes (see
    ``multigrid._sharded_v_cycle``).

    ``global_ny``: additionally y-decomposed ((z, y) 2D device mesh) —
    ``ny`` is the local row count including FOUR halo rows per side, and
    the SMEM scalar array carries ``(z_off, y_off)``, y_off the global
    row of local row 0 (must be EVEN minus any even shard stride so the
    local checkerboard parity equals the global one — callers use
    y_off = g0y − 4 with even rows per shard).  In-plane masks key on
    global rows.  Within the 4-row halo the wavefront self-heals: red is
    exact on halo rows 1..3 per side (their x-neighbor rows are present),
    black on rows 2..3, so x_new AND the residual are exact on every
    OWNED row — no y patch needed (the z patch still is).
    """
    if not mg_sweep_supported(nz, ny, nx):
        return None
    sharded = global_nz is not None
    sharded_y = global_ny is not None
    gnz = nz if global_nz is None else global_nz
    gny = ny if global_ny is None else global_ny
    nyp, nxp = pad_dims(ny, nx)
    rows = nz * nyp

    def kernel(*refs):
        zoff_ref = None
        if sharded:
            zoff_ref = refs[0]
            refs = refs[1:]
        if emit_residual:
            (x_hbm, b_hbm, out_hbm, res_hbm,
             xring, bring, redring, newring, resbuf,
             in_sems, out_sems, res_sems) = refs
        else:
            (x_hbm, b_hbm, out_hbm,
             xring, bring, redring, newring,
             in_sems, out_sems) = refs
            res_hbm = resbuf = res_sems = None
        z_off = (zoff_ref[0, 0].astype(jnp.int32) if sharded
                 else jnp.int32(0))

        jj = jax.lax.broadcasted_iota(jnp.int32, (nyp, nxp), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (nyp, nxp), 1)
        if sharded_y:
            jg = jj + zoff_ref[0, 1].astype(jnp.int32)
            # local parity == global parity (y_off is even by contract),
            # so parity_ij below stays on local jj.
            row_interior = ((jg > 0) & (jg < gny - 1) & (ii > 0)
                            & (ii < nx - 1))
        else:
            row_interior = ((jj > 0) & (jj < ny - 1) & (ii > 0)
                            & (ii < nx - 1))
        parity_ij = jnp.bitwise_and(ii + jj, 1)

        def in_dma(k, slot):
            return (pltpu.make_async_copy(
                        x_hbm.at[pl.ds(k * nyp, nyp), :],
                        xring.at[jax.lax.rem(jnp.asarray(k, jnp.int32),
                                             jnp.int32(4))],
                        in_sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        b_hbm.at[pl.ds(k * nyp, nyp), :],
                        bring.at[jax.lax.rem(jnp.asarray(k, jnp.int32),
                                             jnp.int32(5))],
                        in_sems.at[slot, 1]))

        def out_dma(k, slot):
            return pltpu.make_async_copy(
                newring.at[slot], out_hbm.at[pl.ds(k * nyp, nyp), :],
                out_sems.at[slot])

        def res_dma(k, slot):
            return pltpu.make_async_copy(
                resbuf.at[slot], res_hbm.at[pl.ds(k * nyp, nyp), :],
                res_sems.at[slot])

        def slot4(k):
            return jax.lax.rem(jnp.asarray(k, jnp.int32) + jnp.int32(4),
                               jnp.int32(4))

        def slot5(k):
            return jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(5))

        def nb_sum(xm, xc, xp):
            nb = ((shift_x(xc, 1) + shift_x(xc, -1)) * inv_dx2
                  + (shift_y(xc, 1, nyp) + shift_y(xc, -1, nyp)) * inv_dy2)
            if inv_dz2:
                nb = nb + (xp + xm) * inv_dz2
            return nb

        def color_update(k, color, xm, xc, xp, b_plane):
            """gs = (b + nb)·inv_factor at one color; other cells keep xc
            (zeros stay zero on shells and padding).  Parity and interior
            masks key on the GLOBAL plane index in sharded mode."""
            gk = jnp.asarray(k, jnp.int32) + z_off
            kpar = jax.lax.rem(gk, jnp.int32(2))
            # phase 0 = the wavefront-ahead color: red ((i+j+k) even) by
            # default, black when first_color="black" (the symmetric
            # V-cycle's post-smoothing order).
            eq = (color == 0) == (first_color == "red")
            color_mask = (parity_ij == kpar) if eq else (parity_ij != kpar)
            mask = row_interior & color_mask
            interior_k = (gk > 0) & (gk < gnz - 1)
            gs = (b_plane + nb_sum(xm, xc, xp)) * inv_factor
            return jnp.where(mask & interior_k, gs, xc)

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
        red1 = color_update(1, 0, xring[0], xring[1], xring[2], bring[1])
        redring[pl.ds(1, 1)] = red1[None]
        if nz >= 4:
            d = in_dma(3, 1)
            d[0].start(); d[1].start()

        # ---- main loop: c = 1..nz−1 --------------------------------------
        def body(c, _):
            c = jnp.asarray(c, jnp.int32)

            @pl.when(c + 2 <= nz - 1)
            def _():
                dx_, db_ = in_dma(c + 2, jax.lax.rem(c + 2, jnp.int32(2)))
                dx_.wait(); db_.wait()

            @pl.when(c + 3 <= nz - 1)
            def _():
                dx_, db_ = in_dma(c + 3, jax.lax.rem(c + 3, jnp.int32(2)))
                dx_.start(); db_.start()

            @pl.when(c + 1 <= nz - 1)
            def _():
                k1 = c + 1
                red = color_update(k1, 0, xring[slot4(k1 - 1)],
                                   xring[slot4(k1)], xring[slot4(k1 + 1)],
                                   bring[slot5(k1)])
                redring[pl.ds(slot4(k1), 1)] = red[None]

            @pl.when(c <= nz - 2)
            def _():
                blk = color_update(c, 1, redring[slot4(c - 1)],
                                   redring[slot4(c)], redring[slot4(c + 1)],
                                   bring[slot5(c)])
                s = slot4(c)

                @pl.when(c >= 5)
                def _():
                    out_dma(c - 4, s).wait()

                newring[pl.ds(s, 1)] = blk[None]
                out_dma(c, s).start()

            if emit_residual:
                # residual[c−1] = b + ∇²x_new (interior; Dirichlet-0 z
                # neighbors at the first/last GLOBAL interior planes are
                # zero)
                k = c - 1
                gk = k + z_off
                nm = newring[slot4(k - 1)]
                nc = newring[slot4(k)]
                npl = newring[slot4(k + 1)]
                zero = jnp.zeros_like(nc)
                zm = jnp.where(gk == 1, zero, nm)
                zp = jnp.where(gk == gnz - 2, zero, npl)
                lap = ((shift_x(nc, 1) - 2.0 * nc + shift_x(nc, -1))
                       * inv_dx2
                       + (shift_y(nc, 1, nyp) - 2.0 * nc
                          + shift_y(nc, -1, nyp)) * inv_dy2)
                if inv_dz2:
                    lap = lap + (zp - 2.0 * nc + zm) * inv_dz2
                r = jnp.where(row_interior & (gk > 0) & (gk < gnz - 1),
                              bring[slot5(k)] + lap, 0.0)
                sres = jax.lax.rem(k, jnp.int32(2))

                @pl.when(c >= 4)
                def _():
                    res_dma(k - 2, sres).wait()

                @pl.when(c >= 2)
                def _():
                    resbuf[pl.ds(sres, 1)] = r[None]
                    res_dma(k, sres).start()
            return 0

        jax.lax.fori_loop(1, nz, body, 0)

        # ---- epilogue: drain writes, zero shells --------------------------
        for k in range(max(1, nz - 5), nz - 1):
            out_dma(k, k % 4).wait()
        newring[pl.ds(0, 1)] = jnp.zeros((1, nyp, nxp), dtype)
        out_dma(0, 0).start()
        out_dma(0, 0).wait()
        out_hbm_last = pltpu.make_async_copy(
            newring.at[0], out_hbm.at[pl.ds((nz - 1) * nyp, nyp), :],
            out_sems.at[1])
        out_hbm_last.start()
        out_hbm_last.wait()
        if emit_residual:
            # in-loop waits covered planes 1..nz−4; nz−3 and nz−2 remain
            for k in range(max(1, nz - 3), nz - 1):
                res_dma(k, k % 2).wait()
            resbuf[pl.ds(0, 1)] = jnp.zeros((1, nyp, nxp), dtype)
            res_dma(0, 0).start()
            res_dma(0, 0).wait()
            last = pltpu.make_async_copy(
                resbuf.at[0], res_hbm.at[pl.ds((nz - 1) * nyp, nyp), :],
                res_sems.at[1])
            last.start()
            last.wait()

    n_out = 2 if emit_residual else 1
    scratch = [
        pltpu.VMEM((4, nyp, nxp), dtype),   # xring
        pltpu.VMEM((5, nyp, nxp), dtype),   # b staging
        pltpu.VMEM((4, nyp, nxp), dtype),   # red ring
        pltpu.VMEM((4, nyp, nxp), dtype),   # new ring
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((2, nyp, nxp), dtype))
    scratch += [pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((4,))]
    if emit_residual:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    call = pl.pallas_call(
        kernel,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] if sharded
                  else [])
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((rows, nxp), dtype)
                   for _ in range(n_out)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024),
        interpret=interpret,
    )

    def sweep(x_pad, b_pad, z_off=None, y_off=None):
        args = (x_pad.reshape(rows, nxp), b_pad.reshape(rows, nxp))
        if sharded:
            if sharded_y:
                zo = jnp.stack([jnp.asarray(z_off, dtype),
                                jnp.asarray(y_off, dtype)]).reshape(1, 2)
            else:
                zo = jnp.asarray(z_off, dtype).reshape(1, 1)
            args = (zo,) + args
        outs = call(*args)
        if emit_residual:
            return (outs[0].reshape(nz, nyp, nxp),
                    outs[1].reshape(nz, nyp, nxp))
        return outs[0].reshape(nz, nyp, nxp)

    return sweep
