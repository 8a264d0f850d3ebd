"""Fused Pallas kernels for the CG pressure solve.

The jnp CG iteration costs ~5 separate HBM sweeps at 512³ (laplacian via
rolls, dots, axpys, search-direction update) and XLA's roll lowering reaches
only ~60 GB/s effective.  These kernels restructure one CG iteration into
exactly TWO streaming passes over the field:

  1. ``lap_dot_fused``: p' = M⁻¹r + β·p, Ap' = −∇²p' (Dirichlet-0 interior
     operator), and the scalar ⟨p', Ap'⟩ — one fused pass.
  2. ``cg_update``: x += α·p', r −= α·Ap', and ⟨r, r⟩ — one pass.

Layout trick: a (nz, ny, nx) field is viewed as (nz·ny, nx) rows.  The
y-neighbor of row t is t±1 and the z-neighbor is t±ny, so ONE overlapping
``Element`` row-window of height R+2·ny serves both halos while satisfying
the TPU tiling constraints (row blocks multiples of 8, lanes = full nx).
The grid is (nz−2, ny/R) so every index map stays affine (Mosaic rejects
clamped maps) and windows never leave the array: the two z-shell planes of
the outputs are simply never written.

Shell handling: the CG correction space is Dirichlet-0 (work-vector
boundaries are never meaningful — `linear_solver_cg.c:103-123`), so kernels
mask shell positions ON READ (treating them as exact zeros) and tolerate
garbage in the shell of their outputs.  x and r keep their caller shells
bit-exactly (α-updates are masked), exactly like the reference's
interior-only axpy loops.

Kernels are float32 (TPU); the jnp path remains the reference numerics and
the fallback for other dtypes/shapes.  CPU tests run these in interpret
mode.

Equivalent reference code: the GPU mini-BLAS in
`lib/src/solvers/linear/gpu/poisson_gpu_primitives.cuh:39-273` and the
device-resident CG of `poisson_cg_gpu_solve.cuh` — re-designed as two fused
passes instead of eight kernel launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

_VMEM_BUDGET = 9 * 1024 * 1024


def _pick_row_block(ny: int, nx: int, n_windows: int, n_blocks: int,
                    halo_rows: int) -> int:
    """Largest R with R | ny, R % 8 == 0, fitting the VMEM budget.

    n_windows buffers carry the halo (R + halo_rows rows each); n_blocks
    buffers are plain R-row blocks.  Everything is double-buffered by the
    pallas pipeline, hence the factor 2.
    """
    best = 0
    r = 8
    while r <= ny:
        if ny % r == 0:
            need = 2 * (n_windows * (r + halo_rows) + n_blocks * r) * nx * 4
            if need <= _VMEM_BUDGET:
                best = r
        r += 8
    return best


def fused_kernels_available(nz: int, ny: int, nx: int) -> bool:
    if nz < 3 or ny < 3 or nx < 3:
        return False
    r1 = _pick_row_block(ny, nx, n_windows=2, n_blocks=2, halo_rows=2 * ny)
    r2 = _pick_row_block(ny, nx, n_windows=0, n_blocks=6, halo_rows=0)
    return r1 >= 8 and r2 >= 8


def make_lap_dot_rolling(nz: int, ny: int, nx: int,
                         inv_dx2: float, inv_dy2: float, inv_dz2: float,
                         scale: float, dtype=jnp.float32,
                         interpret: bool = False):
    """Rolling-plane fused (r, p, beta) → (p', Ap', ⟨p', Ap'⟩) kernel.

    Single-invocation kernel (no pallas grid): a ``fori_loop`` marches the
    z-planes with manual double-buffered DMA (the guide's rolling-buffer
    stencil pattern).  Each plane of r and p is fetched from HBM exactly
    once; p' planes live in a 4-slot VMEM ring so the 7-point stencil for
    plane k reads its k±1 neighbors from VMEM — read amplification 1.0,
    unlike halo-window BlockSpecs which would re-fetch both neighbor planes
    per block.

    VMEM: 2×2 staging + 4-slot ring + 2 out staging ≈ 10 plane buffers; the
    fused path requires ny·nx·4B ≤ ~1.2 MB per plane (512² f32 fits).
    """
    plane_bytes = ny * nx * 4
    # HBM DMA slices need 128-aligned lanes and 8-aligned sublanes.
    if nz < 3 or plane_bytes > 1.25 * 1024 * 1024 or nx % 128 != 0 \
            or ny % 8 != 0:
        return None
    rows = nz * ny

    def kernel(beta_ref, r_hbm, p_hbm, pn_hbm, ap_hbm, dot_ref,
               rbuf, pbuf, ring, abuf, in_sems, ring_sems, out_sems):
        beta = beta_ref[0, 0]

        jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        row_mask = ((jj > 0) & (jj < ny - 1) & (ii > 0)
                    & (ii < nx - 1)).astype(dtype)

        def in_dma(k, slot):
            return (pltpu.make_async_copy(
                        r_hbm.at[pl.ds(k * ny, ny), :], rbuf.at[slot],
                        in_sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        p_hbm.at[pl.ds(k * ny, ny), :], pbuf.at[slot],
                        in_sems.at[slot, 1]))

        def pn_dma(k, slot):
            return pltpu.make_async_copy(
                ring.at[slot], pn_hbm.at[pl.ds(k * ny, ny), :],
                ring_sems.at[slot])

        def ap_dma(k, slot):
            return pltpu.make_async_copy(
                abuf.at[slot], ap_hbm.at[pl.ds(k * ny, ny), :],
                out_sems.at[slot])

        def compute_pprime(k, slot_in):
            """ring[k%4] ← masked p' plane k; start its write-back DMA."""
            k = jnp.asarray(k, jnp.int32)
            interior_k = (k > 0) & (k < nz - 1)
            mask = jnp.where(interior_k, 1.0, 0.0).astype(dtype) * row_mask
            s = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(4))
            ring[pl.ds(s, 1)] = ((scale * rbuf[slot_in]
                                  + beta * pbuf[slot_in]) * mask)[None]
            pn_dma(k, s).start()

        # ---- prologue: planes 0 and 1 ----------------------------------
        d0r, d0p = in_dma(0, 0)
        d0r.start(); d0p.start()
        d1r, d1p = in_dma(1, 1)
        d1r.start(); d1p.start()
        d0r.wait(); d0p.wait()
        compute_pprime(0, 0)
        d1r.wait(); d1p.wait()
        compute_pprime(1, 1)
        d2r, d2p = in_dma(2, 0)
        d2r.start(); d2p.start()

        # ---- main loop over interior planes c = 1 .. nz-2 ---------------
        def body(c, acc):
            c = jnp.asarray(c, jnp.int32)
            s_in = jax.lax.rem(c + 1, jnp.int32(2))
            # plane c+1 arrival
            dr, dp = in_dma(c + 1, s_in)
            dr.wait(); dp.wait()
            # ring slot for plane c+1 is being reused from plane c-3; its
            # write-back must have finished
            s_ring = jax.lax.rem(c + 1, jnp.int32(4))

            @pl.when(c + 1 >= 4)
            def _():
                pn_dma(c - 3, s_ring).wait()

            compute_pprime(c + 1, s_in)

            # prefetch plane c+2
            @pl.when(c + 2 <= nz - 1)
            def _():
                dn_r, dn_p = in_dma(c + 2, jax.lax.rem(c + 2, jnp.int32(2)))
                dn_r.start(); dn_p.start()

            # Ap plane c from ring planes c-1, c, c+1
            s_out = jax.lax.rem(c, jnp.int32(2))

            @pl.when(c >= 3)
            def _():
                ap_dma(c - 2, s_out).wait()

            zm = ring[jax.lax.rem(c - 1, jnp.int32(4))]
            zc = ring[jax.lax.rem(c, jnp.int32(4))]
            zp = ring[jax.lax.rem(c + 1, jnp.int32(4))]
            xp = jnp.roll(zc, -1, axis=1)
            xm = jnp.roll(zc, 1, axis=1)
            yp = pltpu.roll(zc, ny - 1, axis=0)  # shift -1 (circular)
            ym = pltpu.roll(zc, 1, axis=0)
            lap = ((xp - 2.0 * zc + xm) * inv_dx2
                   + (yp - 2.0 * zc + ym) * inv_dy2
                   + (zp - 2.0 * zc + zm) * inv_dz2)
            ap = -lap * row_mask
            abuf[pl.ds(s_out, 1)] = ap[None]
            ap_dma(c, s_out).start()
            return acc + jnp.sum(ap * zc)

        dot = jax.lax.fori_loop(1, nz - 1, body, jnp.zeros((), dtype))

        # ---- epilogue: zero the Ap shell planes, drain DMAs -------------
        # (static nz ⇒ plain Python conditionals)
        ap_dma(nz - 2, (nz - 2) % 2).wait()
        if nz >= 4:
            ap_dma(nz - 3, (nz - 3) % 2).wait()
        abuf[pl.ds(0, 1)] = jnp.zeros((1, ny, nx), dtype)
        ap_dma(0, 0).start()
        ap_dma(0, 0).wait()
        abuf[pl.ds(1, 1)] = jnp.zeros((1, ny, nx), dtype)
        ap_dma(nz - 1, 1).start()
        ap_dma(nz - 1, 1).wait()
        for plane in range(max(0, nz - 4), nz):
            pn_dma(plane, plane % 4).wait()
        dot_ref[0, 0] = dot

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ny, nx), dtype),
            pltpu.VMEM((2, ny, nx), dtype),
            pltpu.VMEM((4, ny, nx), dtype),
            pltpu.VMEM((2, ny, nx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def lap_dot(r, p, beta):
        beta_arr = jnp.asarray(beta, dtype).reshape(1, 1)
        pn, ap, dot = call(beta_arr, r.reshape(rows, nx),
                           p.reshape(rows, nx))
        return (pn.reshape(nz, ny, nx), ap.reshape(nz, ny, nx), dot[0, 0])

    return lap_dot


def make_lap_dot_fused(nz: int, ny: int, nx: int,
                       inv_dx2: float, inv_dy2: float, inv_dz2: float,
                       scale: float, dtype=jnp.float32,
                       interpret: bool = False):
    """Build fused (r, p, beta) → (p', Ap', ⟨p', Ap'⟩) kernel, or None.

    p' = scale·r + β·p  (scale = M⁻¹ diagonal for PCG, 1 for plain CG).

    Compiled path: the rolling-plane manual-DMA kernel (1.0 read
    amplification).  Interpret mode (CPU tests) uses the halo-window
    variant, whose semantics the interpreter executes directly.
    """
    if not interpret:
        rolling = make_lap_dot_rolling(nz, ny, nx, inv_dx2, inv_dy2,
                                       inv_dz2, scale, dtype)
        if rolling is not None:
            return rolling
    R = _pick_row_block(ny, nx, n_windows=2, n_blocks=2, halo_rows=2 * ny)
    if R < 8 or nz < 3:
        return None
    rows = nz * ny
    W = R + 2 * ny
    gy = ny // R
    grid = (nz - 2) * gy

    # With R | ny the window offset for the flattened (kz, byy) grid index b
    # is simply b*R (kz*ny + byy*R == (kz*gy + byy)*R) — a single-term affine
    # index map, which is the only form Mosaic's Element lowering accepts.

    def kernel(beta_ref, r_ref, p_ref, pn_ref, ap_ref, dot_ref):
        b = pl.program_id(0)
        byy = jax.lax.rem(b, jnp.int32(gy))
        beta = beta_ref[0, 0]

        # Window rows w ∈ [0, W) sit at global row b*R + w; relative to the
        # center plane k = b//gy + 1 their in-plane j is jw = byy*R - ny + w,
        # spanning [-ny, 2ny).
        jw = (byy * R - ny
              + jax.lax.broadcasted_iota(jnp.int32, (W, nx), 0))
        iw = jax.lax.broadcasted_iota(jnp.int32, (W, nx), 1)
        lane_ok = (iw > 0) & (iw < nx - 1)

        jmod = jw - jnp.where(jw < 0, -ny, jnp.where(jw >= ny, ny, 0))
        j_ok = (jmod > 0) & (jmod < ny - 1)

        # Plane of window row: kz, kz+1, kz+2 for the three jw bands.
        kz = jax.lax.div(b, jnp.int32(gy))
        kk = kz + jnp.where(jw < 0, 0, jnp.where(jw >= ny, 2, 1))
        k_ok = (kk > 0) & (kk < nz - 1)

        maskw = (lane_ok & j_ok & k_ok).astype(dtype)

        pn_w = (scale * r_ref[:] + beta * p_ref[:]) * maskw

        c = pn_w[ny:ny + R, :]
        yp = pn_w[ny + 1:ny + R + 1, :]
        ym = pn_w[ny - 1:ny + R - 1, :]
        zp = pn_w[2 * ny:2 * ny + R, :]
        zm = pn_w[0:R, :]
        xp = jnp.roll(c, -1, axis=1)
        xm = jnp.roll(c, 1, axis=1)

        lap = ((xp - 2.0 * c + xm) * inv_dx2
               + (yp - 2.0 * c + ym) * inv_dy2
               + (zp - 2.0 * c + zm) * inv_dz2)
        mask_c = maskw[ny:ny + R, :]
        ap = -lap * mask_c

        pn_ref[:] = c
        ap_ref[:] = ap

        @pl.when(b == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dtype)

        dot_ref[0, 0] += jnp.sum(ap * c)

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Element(W), Element(nx)), lambda b: (b * R, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Element(W), Element(nx)), lambda b: (b * R, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, nx), lambda b: (b + gy, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, nx), lambda b: (b + gy, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )

    def lap_dot(r, p, beta):
        beta_arr = jnp.asarray(beta, dtype).reshape(1, 1)
        pn, ap, dot = call(beta_arr, r.reshape(rows, nx),
                           p.reshape(rows, nx))
        return (pn.reshape(nz, ny, nx), ap.reshape(nz, ny, nx), dot[0, 0])

    return lap_dot


def make_cg_update(nz: int, ny: int, nx: int, dtype=jnp.float32,
                   interpret: bool = False):
    """Build fused (x, r, p', Ap', α) → (x', r', ⟨r', r'⟩) kernel, or None.

    p'/Ap' shells read as zero, so x and r keep their shells bit-exactly.
    """
    # Elementwise kernel: bigger blocks amortize pipeline latency; allow up
    # to ~13 MB of VMEM here (6 double-buffered block buffers).
    R = 0
    r = 8
    while r <= ny:
        if ny % r == 0 and 2 * 6 * r * nx * 4 <= 13 * 1024 * 1024:
            R = r
        r += 8
    if R < 8:
        return None
    rows = nz * ny
    gy = ny // R
    grid = nz * gy
    is_3d = nz > 1

    def kernel(alpha_ref, x_ref, r_ref, p_ref, ap_ref,
               x2_ref, r2_ref, rr_ref):
        b = pl.program_id(0)
        kz = jax.lax.div(b, jnp.int32(gy))
        byy = jax.lax.rem(b, jnp.int32(gy))
        alpha = alpha_ref[0, 0]

        jj = byy * R + jax.lax.broadcasted_iota(jnp.int32, (R, nx), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (R, nx), 1)
        interior = (jj > 0) & (jj < ny - 1) & (ii > 0) & (ii < nx - 1)
        if is_3d:
            interior &= (kz > 0) & (kz < nz - 1)
        mask = interior.astype(dtype)

        x2 = x_ref[:] + alpha * (p_ref[:] * mask)
        r2 = r_ref[:] - alpha * (ap_ref[:] * mask)
        x2_ref[:] = x2
        r2_ref[:] = r2

        @pl.when(b == 0)
        def _():
            rr_ref[0, 0] = jnp.zeros((), dtype)

        rr_ref[0, 0] += jnp.sum((r2 * mask) ** 2)

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((R, nx), lambda b: (b, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=[
            pl.BlockSpec((R, nx), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, nx), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((rows, nx), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )

    def update(x, r, p, ap, alpha):
        alpha_arr = jnp.asarray(alpha, dtype).reshape(1, 1)
        x2, r2, rr = call(alpha_arr, x.reshape(rows, nx), r.reshape(rows, nx),
                          p.reshape(rows, nx), ap.reshape(rows, nx))
        return (x2.reshape(nz, ny, nx), r2.reshape(nz, ny, nx), rr[0, 0])

    return update


def make_lap_dot_sharded(nz: int, ny: int, nx: int,
                         inv_dx2: float, inv_dy2: float, inv_dz2: float,
                         scale: float, global_nz: int, global_ny=None,
                         dtype=jnp.float32, interpret: bool = False):
    """Shard-local fused (r, p, beta, z_off) → (p', Ap', ⟨p', Ap'⟩) pass.

    ``global_ny``: (z, y) 2D-mesh mode — ``ny`` is the local y-padded row
    count (4 halo rows per side), a third ``y_off`` scalar gives the
    global row of padded row 0; p' masks to the GLOBAL in-plane shell and
    the dot contribution covers only the shard's OWNED rows (halo rows
    would double-count across the y ring).

    The shard_map twin of :func:`make_lap_dot_fused` for a z-decomposed
    field: operates on a halo-padded local block of ``nz = nz_local + 2``
    planes (halo planes arrive via ring ``ppermute``s, zero on the edge
    shards), built on the rolling-plane engine so every plane is fetched
    from HBM exactly once.  p' = scale·r + β·p is computed in-kernel for
    the full window — including the halo planes, so the 7-point apply sees
    the *neighbor shard's* correction values — and masked to the GLOBAL
    Dirichlet-0 correction space: scalar 1 (z_off) is the global plane
    index of padded plane 0, and p' is zeroed at global planes 0 and
    global_nz−1 plus the in-plane shell (the same space the single-chip
    kernel and `linear_solver_cg.c:103-123` use).  The dot contribution
    covers the shard's real planes; callers ``lax.psum`` it over the mesh
    axis.  Returns None when unsupported.

    TPU equivalent of the reference's device-resident CG core
    (`lib/src/solvers/linear/gpu/poisson_cg_gpu_solve.cuh`) stretched over
    ICI instead of one device.
    """
    from .rolling import make_rolling_stencil, plane_masks, shift_x, shift_y

    sharded_y = global_ny is not None
    gny = ny if global_ny is None else global_ny

    def compute(k, scalars, halos, planes):
        if sharded_y:
            beta, z_off, y_off = scalars
        else:
            beta, z_off = scalars
            y_off = None
        (rm, rc, rp) = halos[0]
        (pm, pc, pp) = halos[1]
        if sharded_y:
            jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
            jg = jj + y_off.astype(jnp.int32)
            mask = ((jg > 0) & (jg < gny - 1) & (ii > 0)
                    & (ii < nx - 1)).astype(dtype)
            own = ((jj >= 4) & (jj < ny - 4)).astype(dtype)
        else:
            mask, _, _ = plane_masks(ny, nx, dtype)
            own = None
        gk = k + z_off.astype(jnp.int32)   # global plane of padded plane k

        def pprime(rq, pq, gq):
            zin = ((gq > 0) & (gq < global_nz - 1)).astype(dtype)
            return (scale * rq + beta * pq) * mask * zin

        pn_m = pprime(rm, pm, gk - 1)
        pn_c = pprime(rc, pc, gk)
        pn_p = pprime(rp, pp, gk + 1)

        lap = ((shift_x(pn_c, 1) - 2.0 * pn_c + shift_x(pn_c, -1)) * inv_dx2
               + (shift_y(pn_c, 1, ny) - 2.0 * pn_c
                  + shift_y(pn_c, -1, ny)) * inv_dy2
               + (pn_p - 2.0 * pn_c + pn_m) * inv_dz2)
        zin_c = ((gk > 0) & (gk < global_nz - 1)).astype(dtype)
        ap = -lap * mask * zin_c
        dot = ap * pn_c if own is None else ap * pn_c * own
        return [pn_c, ap], (jnp.sum(dot),)

    return make_rolling_stencil(
        nz, ny, nx, 2, 0, 2, compute, dtype,
        n_scalars=3 if sharded_y else 2,
        reductions=("sum",), interpret=interpret)
