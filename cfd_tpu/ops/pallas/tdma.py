"""Pallas z-line tridiagonal (Thomas) solver for the spectral Poisson path.

After the DST-I transforms in x and y, the pressure Poisson system
decouples into (My·Mx) independent tridiagonal systems along z:

    (mu + 2w)·x_k − w·(x_{k−1} + x_{k+1}) = r_k,   k = 1..mz,
    x_0 = x_{mz+1} = 0,           w = 1/dz², mu = λx_a + λy_b > 0

(the same system the eigen path diagonalizes with the z-DST — reference
operator `lib/include/cfd/math/stencils.h:135-176`; eigen path in
``solvers/poisson/spectral.py``).  Solving it directly with two
bandwidth-bound marching sweeps replaces two compute-bound HIGHEST
(bf16x6) MXU matmuls plus the eigenvalue divide — measured ~9 ms of the
23 ms DST stage at 512³ — with a few ms of plane streaming.

Numerics.  The forward-elimination multiplier t_k = w/denom_k obeys a
contracting Möbius recurrence (|∂t_k/∂t_{k−1}| = t_k² < 1 for mu > 0),
so the forward sweep is self-correcting.  The backward sweep needs t_k
again; two variants:

* ``variant="stored"`` (default): the forward sweep streams t_k to HBM
  alongside d′_k and the backward sweep reads it back — plain Thomas,
  no transcendentals, measured BIT-IDENTICAL to the jnp scan reference
  on the real chip; 6 planes of HBM traffic per z-step.
* ``variant="analytic"``: reconstruct t_k analytically,
  t_k = sinh(kφ)/sinh((k+1)φ) = e^{−φ}(e^{−2kφ}−1)/(e^{−2(k+1)φ}−1)
  with cosh φ = 1 + mu/(2w) — 4 planes of traffic, but one in-kernel
  exp per plane per step; TPU transcendental rounding costs ~4e−6
  relative error (measured on-chip; φ-planes precomputed on the host in
  float64 — deriving them in-kernel in f32 costs another ~2e−5).  The
  error is dominated by the e^{−2kφ}−1 cancellation at small kφ;
  ``expm1`` would fix it but Mosaic has no lowering for it (probed:
  `NotImplementedError ... KernelType.TC: expm1`), so analytic stays
  the opt-in for tolerance-bound callers (artifacts/tdma_micro_probe.py).

The sweeps march ``block`` z-planes per grid step (the largest divisor
of mz ≤ 8 that fits VMEM): per-step fixed costs (semaphore ops, DMA
issue, loop scalar work — measured ~2.6 µs/step, which at one plane per
step doubled the solve time) amortize over the block while the carry
recurrences run in-registers across the block's planes.

Both sweeps are separate pallas_calls with manual triple/double-buffered
DMA (the rolling-engine idiom); the backward kernel's reverse plane
order is plain index arithmetic — no BlockSpec index maps, so none of
the Mosaic affine-map constraints apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 110 * 1024 * 1024


def tdma_supported(nz: int, my: int, mx: int) -> bool:
    """Kernel constraints: lane-aligned plane, ≥1 interior plane, VMEM
    (for the minimal block=1 configuration)."""
    if nz < 3 or mx % 128 != 0 or my % 8 != 0:
        return False
    plane_bytes = my * mx * 4
    return 12 * plane_bytes <= _VMEM_BUDGET


def _pick_block(mz: int, my: int, mx: int) -> int:
    """Largest divisor of mz ≤ 16 whose staging fits VMEM (worst kernel
    needs ~8·B planes: 2 streamed ins × 3 slots + 1 out × 2 slots).
    Bigger blocks amortize per-step fixed costs (~2.6 µs: semaphores,
    DMA issue, scalar loop work) AND stream in larger DMA chunks — at
    512³ the backward sweep measured 4.09 ms at B=6 (≈270 GB/s
    effective) vs a ~1.5 ms 2-pass roofline, so the cap is raised as
    far as 512³ VMEM allows (B=10 there: (8·10+4) MiB ≤ 110 MiB)."""
    plane_bytes = my * mx * 4
    for b in range(16, 0, -1):
        if mz % b == 0 and (8 * b + 4) * plane_bytes <= _VMEM_BUDGET:
            return b
    return 1


def _march_call(kernel, n_stream_in, n_out, rows_out, block, my, mx,
                dtype, pinned_rows, interpret):
    """Shared pallas_call builder: streamed HBM ins/outs in
    ``block``-plane chunks + one pinned coefficient input."""
    out_shape = [jax.ShapeDtypeStruct((r, mx), dtype) for r in rows_out]
    bm = block * my
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  for _ in range(n_stream_in + 1)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)
                   for _ in range(n_out)],
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((3, bm, mx), dtype)
             for _ in range(n_stream_in)]          # in staging (3-slot)
            + [pltpu.VMEM((2, bm, mx), dtype)
               for _ in range(n_out)]              # out staging (2-slot)
            + [pltpu.VMEM((2, my, mx), dtype),     # z-shell staging
               pltpu.VMEM((pinned_rows, mx), dtype),   # pinned coeffs
               pltpu.SemaphoreType.DMA((3, max(1, n_stream_in))),
               pltpu.SemaphoreType.DMA((2, n_out)),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.SemaphoreType.DMA]),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024),
        interpret=interpret,
    )


def _bwd_coeff_planes(mu64, w64, np_dt):
    """Analytic-variant coefficient planes, float64 on the host (the
    in-kernel f32 log/sqrt chain was the dominant on-chip error)."""
    s = mu64 / (2.0 * w64)
    sh = np.sqrt(s * (2.0 + s))                  # sinh φ
    einvphi = 1.0 / (1.0 + s + sh)               # e^{−φ}
    phi2 = 2.0 * np.log1p(s + sh)                # 2φ
    return np.concatenate([einvphi.astype(np_dt),
                           phi2.astype(np_dt)], axis=0)    # (2·my, mx)


def make_tdma_z(nz: int, my: int, mx: int, mu, w,
                dtype=jnp.float32, variant: str = "stored",
                interpret: bool = False):
    """Build fn(r) -> x for the z-line systems above.

    mu: (my, mx) positive per-column eigenvalue sums (host numpy,
    float64 — coefficient planes derive from it at build time), or
    ``None`` to pass mu at CALL time instead (``run(r, mu)``) — the
    sharded-pencil case, where every shard's y-slab sees a different
    slice of the global eigenvalue plane but ``shard_map`` traces one
    program (stored variant only; the analytic variant's coefficient
    planes are host-derived in float64).
    w: scalar 1/dz².  r: (nz, my, mx) rhs with zero z-shell planes
    (transform-space b̃).  Returns x (nz, my, mx) with mirror-extended
    z-shells (x[0] = x[1], x[nz−1] = x[nz−2]) matching the eigen path's
    mirror-extended inverse rows.  None when unsupported.
    """
    if not tdma_supported(nz, my, mx):
        return None
    if variant not in ("stored", "analytic"):
        raise ValueError(f"unknown tdma variant {variant!r}")
    stored = variant == "stored"
    if mu is None and not stored:
        raise ValueError("runtime-mu TDMA is stored-variant only")
    mz = nz - 2
    B = _pick_block(mz, my, mx)
    nb = mz // B
    np_dt = np.dtype(jnp.float32 if dtype == jnp.float32 else dtype)

    w64 = float(w)
    if mu is None:
        mu32 = aux32 = None
    else:
        mu64 = np.asarray(mu, np.float64)
        mu32 = mu64.astype(np_dt)
        aux32 = _bwd_coeff_planes(mu64, w64, np_dt)
    wf = np_dt.type(w64)

    # ------------------------------------------------------------------
    # Forward sweep: r → d′ (and t when stored), B planes per step
    # ------------------------------------------------------------------
    n_fout = 2 if stored else 1

    def fwd_kernel(r_hbm, mu_hbm, *rest):
        outs_hbm = rest[:n_fout]
        stage = rest[n_fout]
        obufs = rest[n_fout + 1:2 * n_fout + 1]
        # z-shell staging unused in forward (at 2·n_fout+1)
        pinbuf = rest[2 * n_fout + 2]
        in_sems = rest[2 * n_fout + 3]
        out_sems = rest[2 * n_fout + 4]
        pin_sem = rest[2 * n_fout + 6]

        def in_dma(i, slot):
            # block i: r planes 1+iB .. iB+B → rows (1+iB)·my
            return pltpu.make_async_copy(
                r_hbm.at[pl.ds((1 + i * B) * my, B * my), :],
                stage.at[slot], in_sems.at[slot, 0])

        def out_dma(i, o, slot):
            # block i of d′/t: plane k at rows (k−1)·my → rows iB·my
            return pltpu.make_async_copy(
                obufs[o].at[slot],
                outs_hbm[o].at[pl.ds(i * B * my, B * my), :],
                out_sems.at[slot, o])

        pin_dma = pltpu.make_async_copy(mu_hbm, pinbuf, pin_sem)
        pin_dma.start()
        in_dma(0, 0).start()
        if nb >= 2:
            in_dma(1, 1).start()
        pin_dma.wait()
        in_dma(0, 0).wait()

        def body(c, carry):
            t, dp = carry
            c = jnp.asarray(c, jnp.int32)

            @pl.when(c + 2 <= nb - 1)
            def _():
                in_dma(c + 2, lax.rem(c + 2, jnp.int32(3))).start()

            @pl.when(c >= 1)
            def _():
                in_dma(c, lax.rem(c, jnp.int32(3))).wait()

            blk = stage[lax.rem(c, jnp.int32(3))]
            mu_p = pinbuf[...]
            d_planes = []
            t_planes = []
            for b in range(B):
                r = blk[b * my:(b + 1) * my]
                rec = 1.0 / (mu_p + 2.0 * wf - wf * t)
                t = wf * rec
                dp = (r + wf * dp) * rec
                d_planes.append(dp)
                t_planes.append(t)
            vals = [jnp.concatenate(d_planes, axis=0)]
            if stored:
                vals.append(jnp.concatenate(t_planes, axis=0))

            s_out = lax.rem(c, jnp.int32(2))

            @pl.when(c >= 2)
            def _():
                for o in range(n_fout):
                    out_dma(c - 2, o, s_out).wait()

            for o in range(n_fout):
                obufs[o][pl.ds(s_out, 1)] = vals[o][None]
                out_dma(c, o, s_out).start()
            return t, dp

        zero = jnp.zeros((my, mx), dtype)
        lax.fori_loop(0, nb, body, (zero, zero))
        for o in range(n_fout):
            out_dma(nb - 1, o, (nb - 1) % 2).wait()
            if nb >= 2:
                out_dma(nb - 2, o, (nb - 2) % 2).wait()

    fwd = _march_call(fwd_kernel, 1, n_fout, [mz * my] * n_fout, B, my,
                      mx, dtype, my, interpret)
    bwd = _build_bwd(nz, my, mx, B, stored, dtype, interpret, in_off=-1)

    def run(r, mu_in=None):
        r2 = r.reshape(nz * my, mx)
        m = (jnp.asarray(mu32) if mu_in is None
             else mu_in.astype(dtype).reshape(my, mx))
        if stored:
            d, t = fwd(r2, m)
            (x,) = bwd(d, t, m)
        else:
            (d,) = fwd(r2, m)
            (x,) = bwd(d, jnp.asarray(aux32))
        return x.reshape(nz, my, mx)

    return run


def make_tdma_z_bwd(nz: int, my: int, mx: int, mu, w,
                    dtype=jnp.float32, variant: str = "stored",
                    interpret: bool = False):
    """Backward-substitution-only twin of :func:`make_tdma_z` for callers
    that run the Thomas FORWARD sweep fused into a producing kernel (the
    DST-fused predictor emits d′ and t directly, plane k at rows k·my
    with zero z-shell planes — `ops/pallas/projection_kernels.py`).

    Returns fn(d, t) -> x (stored variant) or fn(d) -> x (analytic), all
    (nz, my, mx), x with mirror-extended z-shells.  None when unsupported.
    """
    if not tdma_supported(nz, my, mx):
        return None
    if variant not in ("stored", "analytic"):
        raise ValueError(f"unknown tdma variant {variant!r}")
    stored = variant == "stored"
    B = _pick_block(nz - 2, my, mx)
    np_dt = np.dtype(jnp.float32 if dtype == jnp.float32 else dtype)
    mu64 = np.asarray(mu, np.float64)
    mu32 = mu64.astype(np_dt)
    aux32 = _bwd_coeff_planes(mu64, float(w), np_dt)
    bwd = _build_bwd(nz, my, mx, B, stored, dtype, interpret, in_off=0)

    def run(d, t=None):
        if stored:
            (x,) = bwd(d.reshape(nz * my, mx), t.reshape(nz * my, mx),
                       jnp.asarray(mu32))
        else:
            (x,) = bwd(d.reshape(nz * my, mx), jnp.asarray(aux32))
        return x.reshape(nz, my, mx)

    return run


def _build_bwd(nz, my, mx, B, stored, dtype, interpret, in_off):
    """Backward sweep pallas_call: d′ (+ t | aux) → x, B planes per step,
    k descending.  ``in_off``: input row of plane k is (k + in_off)·my —
    −1 for the dense (mz·my)-row layout the forward kernel writes, 0 for
    full (nz·my)-row arrays with shell rows (the fused-predictor layout)."""
    mz = nz - 2
    nb = mz // B
    n_bin = 2 if stored else 1

    def bwd_kernel(*refs):
        ins_hbm = refs[:n_bin]
        pin_hbm = refs[n_bin]
        x_hbm = refs[n_bin + 1]
        stages = refs[n_bin + 2:2 * n_bin + 2]
        obuf = refs[2 * n_bin + 2]
        sbuf = refs[2 * n_bin + 3]
        pinbuf = refs[2 * n_bin + 4]
        in_sems = refs[2 * n_bin + 5]
        out_sems = refs[2 * n_bin + 6]
        sh_sems = refs[2 * n_bin + 7]
        pin_sem = refs[2 * n_bin + 8]

        def in_dma(j, c, slot):
            # backward block c covers planes k_lo..k_hi with
            # k_hi = mz − cB, k_lo = k_hi − B + 1; d′/t plane k is at
            # rows (k + in_off)·my → block rows start (k_lo + in_off)·my
            return pltpu.make_async_copy(
                ins_hbm[j].at[pl.ds((mz - c * B - B + 1 + in_off) * my,
                                    B * my), :],
                stages[j].at[slot], in_sems.at[slot, j])

        def out_dma(c, slot):
            # x block: planes k_lo..k_hi at rows k_lo·my
            return pltpu.make_async_copy(
                obuf.at[slot],
                x_hbm.at[pl.ds((mz - c * B - B + 1) * my, B * my), :],
                out_sems.at[slot, 0])

        def shell_dma(i, plane):
            return pltpu.make_async_copy(
                sbuf.at[i], x_hbm.at[pl.ds(plane * my, my), :],
                sh_sems.at[i])

        pin_dma = pltpu.make_async_copy(pin_hbm, pinbuf, pin_sem)
        pin_dma.start()
        for j in range(n_bin):
            in_dma(j, 0, 0).start()
            if nb >= 2:
                in_dma(j, 1, 1).start()
        pin_dma.wait()
        for j in range(n_bin):
            in_dma(j, 0, 0).wait()

        if not stored:
            einv = pinbuf[0:my, :]
            p2 = pinbuf[my:2 * my, :]
            g2 = einv * einv

        def body(c, x):
            c = jnp.asarray(c, jnp.int32)

            @pl.when(c + 2 <= nb - 1)
            def _():
                for j in range(n_bin):
                    in_dma(j, c + 2, lax.rem(c + 2, jnp.int32(3))).start()

            @pl.when(c >= 1)
            def _():
                for j in range(n_bin):
                    in_dma(j, c, lax.rem(c, jnp.int32(3))).wait()

            dblk = stages[0][lax.rem(c, jnp.int32(3))]
            if stored:
                tblk = stages[1][lax.rem(c, jnp.int32(3))]
            x_planes = [None] * B
            for idx in reversed(range(B)):     # k descending in-block
                d = dblk[idx * my:(idx + 1) * my]
                if stored:
                    t = tblk[idx * my:(idx + 1) * my]
                else:
                    # k = k_lo + idx = mz − cB − B + 1 + idx
                    kf = (mz - B + 1 + idx - c * B).astype(dtype)
                    e = jnp.exp(-kf * p2)      # e^{−2kφ} (underflow ok)
                    t = einv * (e - 1.0) / (e * g2 - 1.0)
                x = d + t * x
                x_planes[idx] = x
            xblk = jnp.concatenate(x_planes, axis=0)

            s_out = lax.rem(c, jnp.int32(2))

            @pl.when(c >= 2)
            def _():
                out_dma(c - 2, s_out).wait()

            obuf[pl.ds(s_out, 1)] = xblk[None]
            out_dma(c, s_out).start()

            # Mirror-extended z-shells (x[0]=x[1], x[nz−1]=x[nz−2]) ride
            # dedicated staging + semaphores: block 0 computes plane mz
            # (sub-step idx=B−1), block nb−1 computes plane 1 (idx=0).
            @pl.when(c == 0)
            def _():
                sbuf[pl.ds(0, 1)] = x_planes[B - 1][None]
                shell_dma(0, nz - 1).start()

            @pl.when(c == nb - 1)
            def _():
                sbuf[pl.ds(1, 1)] = x_planes[0][None]
                shell_dma(1, 0).start()

            return x

        lax.fori_loop(0, nb, body, jnp.zeros((my, mx), dtype))
        out_dma(nb - 1, (nb - 1) % 2).wait()
        if nb >= 2:
            out_dma(nb - 2, (nb - 2) % 2).wait()
        shell_dma(0, nz - 1).wait()
        shell_dma(1, 0).wait()

    return _march_call(bwd_kernel, n_bin, 1, [nz * my], B, my, mx, dtype,
                       my if stored else 2 * my, interpret)


_VMEM2D_BUDGET = 100 * 1024 * 1024


def tdma2d_supported(ny: int, mxp: int) -> bool:
    """Whole-array VMEM y-line kernel constraints: the spectral array
    views as (ny, 8, mxp/8) planes (so mxp % 1024 keeps the lane dim
    128-aligned) and r + x + t must sit in VMEM together."""
    if ny < 3 or mxp < 1024 or mxp % 1024 != 0:
        return False
    return (3 * ny * mxp + mxp) * 4 <= _VMEM2D_BUDGET


def make_tdma_y_2d(ny: int, mxp: int, mu, w, dtype=jnp.float32,
                   interpret: bool = False):
    """Build fn(r) -> x for the 2D y-line systems

        (mu_a + 2w)·x_j − w·(x_{j−1} + x_{j+1}) = r_j,   j = 1..ny−2,
        x_0 = x_{ny−1} = 0,       w = 1/dy², mu_a = λx_a > 0

    — the per-x-mode tridiagonals the 2D spectral pipeline's DSTy stage
    diagonalizes (`solvers/poisson/spectral.py`).  Unlike the 3D z-stage,
    the whole (ny, mxp) spectral array fits in VMEM at the sizes where
    the 2D fused step runs (≤ ~8 M f32 entries), so both Thomas sweeps
    run in ONE pallas_call with zero DMA marching overhead: rows view as
    (8, mxp/8) planes indexed on the leading axis, the forward sweep
    stores d′ into the output buffer and t into a scratch, and the
    backward sweep rewrites the output in place (plain stored-t Thomas —
    no transcendentals, same recurrence as the 3D ``variant="stored"``).

    mu: (mxp,) positive per-mode eigenvalues (host numpy float64);
    w: scalar 1/dy².  r: (ny, mxp) rhs with zero y-shell rows.  Returns
    x (ny, mxp) with mirror-extended y-shells (x[0] = x[1],
    x[ny−1] = x[ny−2]) matching the eigen path's mirror-extended inverse
    rows.  None when unsupported.
    """
    if not tdma2d_supported(ny, mxp):
        return None
    mz = ny - 2
    C = mxp // 8
    np_dt = np.dtype(jnp.float32 if dtype == jnp.float32 else dtype)
    mu32 = np.asarray(mu, np.float64).astype(np_dt).reshape(8, C)
    wf = np_dt.type(float(w))
    U = 8                                  # rows per fori iteration
    n_main = mz // U
    rem = mz - n_main * U

    def kernel(r_ref, mu_ref, x_ref, t_ref):
        mu_p = mu_ref[...]
        zero = jnp.zeros((8, C), dtype)

        def fwd_row(j, t, dp):
            rec = 1.0 / (mu_p + 2.0 * wf - wf * t)
            t = wf * rec
            dp = (r_ref[j] + wf * dp) * rec
            x_ref[pl.ds(j, 1)] = dp[None]          # d′ parked in x
            t_ref[pl.ds(j, 1)] = t[None]
            return t, dp

        def fwd_block(c, carry):
            t, dp = carry
            j0 = jnp.asarray(c, jnp.int32) * U + 1
            for k in range(U):
                t, dp = fwd_row(j0 + k, t, dp)
            return t, dp

        t, dp = lax.fori_loop(0, n_main, fwd_block, (zero, zero))
        for k in range(rem):                       # static tail rows
            t, dp = fwd_row(n_main * U + 1 + k, t, dp)

        def bwd_row(j, x):
            x = x_ref[j] + t_ref[j] * x
            x_ref[pl.ds(j, 1)] = x[None]
            return x

        def bwd_block(c, x):
            jt = mz - jnp.asarray(c, jnp.int32) * U
            for k in range(U):
                x = bwd_row(jt - k, x)
            return x

        x = lax.fori_loop(0, n_main, bwd_block, zero)
        for k in range(rem):                       # rows rem..1
            x = bwd_row(rem - k, x)

        x_ref[pl.ds(0, 1)] = x[None]               # mirror shells
        x_ref[pl.ds(ny - 1, 1)] = x_ref[pl.ds(mz, 1)]

    call = pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, 8, C), dtype),
        scratch_shapes=[pltpu.VMEM((ny, 8, C), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM2D_BUDGET + 16 * 1024 * 1024),
        interpret=interpret,
    )

    def run(r):
        x = call(r.reshape(ny, 8, C), jnp.asarray(mu32))
        return x.reshape(ny, mxp)

    return run


def tdma_z_bwd_reference(d, t):
    """jnp (lax.scan) backward substitution for pre-swept (d′, t) arrays
    in the fused-predictor layout: plane k at index k, zero z-shell
    planes (`projection_kernels.ProjectionKernels(tdma_fwd=...)`).
    Returns x (nz, my, mx) with mirror-extended z-shells — the CPU/test
    twin of :func:`make_tdma_z_bwd`."""
    nz = d.shape[0]

    def bwd(x, td):
        tk, dk = td
        x_new = dk + tk * x
        return x_new, x_new

    _, xs_rev = lax.scan(bwd, jnp.zeros_like(d[0]),
                         (t[1:nz - 1], d[1:nz - 1]), reverse=True)
    return jnp.concatenate([xs_rev[:1], xs_rev, xs_rev[-1:]], axis=0)


def tdma_z_reference(r, mu, w):
    """jnp (lax.scan) Thomas solve of the same systems — any backend,
    any dtype.  r: (nz, my, mx) zero-shell rhs; returns x (nz, my, mx)
    with mirror-extended z-shells.  The CPU/test twin of the kernel and
    the fallback when the kernel is unsupported."""
    nz = r.shape[0]
    dtype = r.dtype
    w = jnp.asarray(w, dtype)
    b = mu.astype(dtype) + 2.0 * w

    def fwd(carry, rk):
        t, dp = carry
        rec = 1.0 / (b - w * t)
        t_new = w * rec
        dp_new = (rk + w * dp) * rec
        return (t_new, dp_new), (t_new, dp_new)

    zero = jnp.zeros_like(r[0])
    _, (ts, dps) = lax.scan(fwd, (zero, zero), r[1:nz - 1])

    def bwd(x, td):
        t, dp = td
        x_new = dp + t * x
        return x_new, x_new

    _, xs_rev = lax.scan(bwd, zero, (ts, dps), reverse=True)
    return jnp.concatenate([xs_rev[:1], xs_rev, xs_rev[-1:]], axis=0)
