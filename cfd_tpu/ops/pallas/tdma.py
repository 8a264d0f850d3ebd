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
23 ms DST stage at 512³ — with ~3-4 ms of plane streaming.

Numerics.  The forward-elimination multiplier t_k = w/denom_k obeys a
contracting Möbius recurrence (|∂t_k/∂t_{k−1}| = t_k² < 1 for mu > 0),
so the forward sweep is self-correcting.  The backward sweep needs t_k
again; two variants:

* ``variant="stored"``: the forward sweep streams t_k to HBM alongside
  d′_k and the backward sweep reads it back — plain Thomas, no
  transcendentals, f32 error ≈ the eigen path's own rounding (~2e−6 at
  512³); 6 planes of HBM traffic per z-step.
* ``variant="analytic"``: reconstruct t_k analytically,
  t_k = sinh(kφ)/sinh((k+1)φ) = e^{−φ}(e^{−2kφ}−1)/(e^{−2(k+1)φ}−1)
  with cosh φ = 1 + mu/(2w) — 4 planes of traffic, but one in-kernel
  exp per plane per step; TPU transcendental rounding costs ~1e−5
  relative error (measured on-chip), so this is the option for
  tolerance-bound callers only.

φ-derived coefficient planes are precomputed on the host in float64
(the in-kernel f32 log/sqrt chain was the dominant error source).

Both sweeps are separate pallas_calls marching planes through VMEM with
manual double/triple-buffered DMA (the rolling-engine idiom); the
backward kernel's reverse plane order is plain index arithmetic — no
BlockSpec index maps, so none of the Mosaic affine-map constraints
apply.
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
    """Kernel constraints: lane-aligned plane, ≥1 interior plane, VMEM."""
    if nz < 3 or mx % 128 != 0 or my % 8 != 0:
        return False
    plane_bytes = my * mx * 4
    # ≤2 streamed ins (3-slot) + 2 outs (2-slot) + shells + pinned + carries
    return 20 * plane_bytes <= _VMEM_BUDGET


def _march_call(kernel, n_stream_in, n_out, rows_out, my, mx, dtype,
                pinned_rows, interpret):
    """Shared pallas_call builder: streamed HBM ins/outs + one pinned
    coefficient input of ``pinned_rows`` rows, marching scaffolding in
    VMEM."""
    out_shape = [jax.ShapeDtypeStruct((r, mx), dtype) for r in rows_out]
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  for _ in range(n_stream_in + 1)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)
                   for _ in range(n_out)],
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((3, my, mx), dtype)
             for _ in range(n_stream_in)]          # in staging (3-slot)
            + [pltpu.VMEM((2, my, mx), dtype)
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


def make_tdma_z(nz: int, my: int, mx: int, mu, w,
                dtype=jnp.float32, variant: str = "stored",
                interpret: bool = False):
    """Build fn(r) -> x for the z-line systems above.

    mu: (my, mx) positive per-column eigenvalue sums (host numpy,
    float64 — coefficient planes derive from it at build time);
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
    mz = nz - 2
    np_dt = np.dtype(jnp.float32 if dtype == jnp.float32 else dtype)

    mu64 = np.asarray(mu, np.float64)
    w64 = float(w)
    mu32 = mu64.astype(np_dt)
    # Backward-sweep coefficient planes, in float64 on the host (the
    # in-kernel f32 log/sqrt chain was the dominant on-chip error).
    s = mu64 / (2.0 * w64)
    sh = np.sqrt(s * (2.0 + s))                  # sinh φ
    einvphi = 1.0 / (1.0 + s + sh)               # e^{−φ}
    phi2 = 2.0 * np.log1p(s + sh)                # 2φ
    aux32 = np.concatenate([einvphi.astype(np_dt),
                            phi2.astype(np_dt)], axis=0)   # (2·my, mx)
    wf = np_dt.type(w64)

    def _stream_helpers(stage_refs, in_sems, hbm_ins, base_rows):
        """in_dma(j, k, slot) for streamed input j, plane index k (the
        row offset is (k − base_rows[j])·my)."""
        def in_dma(j, k, slot):
            off = (k - base_rows[j]) * my
            return pltpu.make_async_copy(
                hbm_ins[j].at[pl.ds(off, my), :], stage_refs[j].at[slot],
                in_sems.at[slot, j])
        return in_dma

    # ------------------------------------------------------------------
    # Forward sweep: r → d′ (and t when stored)
    # ------------------------------------------------------------------
    n_fout = 2 if stored else 1

    def fwd_kernel(r_hbm, mu_hbm, *rest):
        outs_hbm = rest[:n_fout]
        stage = rest[n_fout]
        obufs = rest[n_fout + 1:2 * n_fout + 1]
        # _sbuf unused in forward
        pinbuf = rest[2 * n_fout + 2]
        in_sems = rest[2 * n_fout + 3]
        out_sems = rest[2 * n_fout + 4]
        # _sh_sems at +5
        pin_sem = rest[2 * n_fout + 6]

        in_dma = _stream_helpers([stage], in_sems, [r_hbm], [0])

        def out_dma(k, o, slot):
            # output plane k (k = 1..mz) lives at rows [(k−1)·my, k·my)
            return pltpu.make_async_copy(
                obufs[o].at[slot], outs_hbm[o].at[pl.ds((k - 1) * my, my),
                                                  :], out_sems.at[slot, o])

        pin_dma = pltpu.make_async_copy(mu_hbm, pinbuf, pin_sem)
        pin_dma.start()
        in_dma(0, 1, 1 % 3).start()
        if mz >= 2:
            in_dma(0, 2, 2 % 3).start()
        pin_dma.wait()
        in_dma(0, 1, 1 % 3).wait()

        def body(c, carry):
            t, dp = carry
            c = jnp.asarray(c, jnp.int32)

            @pl.when(c + 2 <= mz)
            def _():
                in_dma(0, c + 2, lax.rem(c + 2, jnp.int32(3))).start()

            @pl.when(c >= 2)
            def _():
                in_dma(0, c, lax.rem(c, jnp.int32(3))).wait()

            r = stage[lax.rem(c, jnp.int32(3))]
            mu_p = pinbuf[...]
            rec = 1.0 / (mu_p + 2.0 * wf - wf * t)
            t_new = wf * rec
            dp_new = (r + wf * dp) * rec

            s_out = lax.rem(c, jnp.int32(2))

            @pl.when(c >= 3)
            def _():
                for o in range(n_fout):
                    out_dma(c - 2, o, s_out).wait()

            vals = (dp_new, t_new) if stored else (dp_new,)
            for o in range(n_fout):
                obufs[o][pl.ds(s_out, 1)] = vals[o][None]
                out_dma(c, o, s_out).start()
            return t_new, dp_new

        zero = jnp.zeros((my, mx), dtype)
        lax.fori_loop(1, mz + 1, body, (zero, zero))
        for o in range(n_fout):
            out_dma(mz, o, mz % 2).wait()
            if mz >= 2:
                out_dma(mz - 1, o, (mz - 1) % 2).wait()

    # ------------------------------------------------------------------
    # Backward sweep: d′ (+ t | aux) → x
    # ------------------------------------------------------------------
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

        in_dma = _stream_helpers(stages, in_sems, ins_hbm,
                                 [1] * n_bin)

        def out_dma(k, slot):
            # x plane index k in the FULL (nz, my, mx) output
            return pltpu.make_async_copy(
                obuf.at[slot], x_hbm.at[pl.ds(k * my, my), :],
                out_sems.at[slot, 0])

        def shell_dma(i, plane):
            return pltpu.make_async_copy(
                sbuf.at[i], x_hbm.at[pl.ds(plane * my, my), :],
                sh_sems.at[i])

        pin_dma = pltpu.make_async_copy(pin_hbm, pinbuf, pin_sem)
        pin_dma.start()
        for j in range(n_bin):
            in_dma(j, mz, 1 % 3).start()
            if mz >= 2:
                in_dma(j, mz - 1, 2 % 3).start()
        pin_dma.wait()
        for j in range(n_bin):
            in_dma(j, mz, 1 % 3).wait()

        if not stored:
            einv = pinbuf[0:my, :]
            p2 = pinbuf[my:2 * my, :]
            g2 = einv * einv

        def body(c, x):
            c = jnp.asarray(c, jnp.int32)
            k = mz + 1 - c                      # marches mz .. 1

            @pl.when(k - 2 >= 1)
            def _():
                for j in range(n_bin):
                    in_dma(j, k - 2, lax.rem(c + 2, jnp.int32(3))).start()

            @pl.when(c >= 2)
            def _():
                for j in range(n_bin):
                    in_dma(j, k, lax.rem(c, jnp.int32(3))).wait()

            d = stages[0][lax.rem(c, jnp.int32(3))]
            if stored:
                t = stages[1][lax.rem(c, jnp.int32(3))]
            else:
                kf = k.astype(dtype)
                e = jnp.exp(-kf * p2)           # e^{−2kφ} (0 underflow ok)
                t = einv * (e - 1.0) / (e * g2 - 1.0)
            x_new = d + t * x

            s_out = lax.rem(c, jnp.int32(2))

            @pl.when(c >= 3)
            def _():
                out_dma(mz + 1 - (c - 2), s_out).wait()

            obuf[pl.ds(s_out, 1)] = x_new[None]
            out_dma(k, s_out).start()

            # Mirror-extended z-shells (x[0]=x[1], x[nz−1]=x[nz−2]) ride
            # dedicated staging + semaphores, decoupled from the 2-slot
            # streaming protocol (for nz==3 both fire in one iteration).
            @pl.when(c == 1)
            def _():
                sbuf[pl.ds(0, 1)] = x_new[None]
                shell_dma(0, nz - 1).start()

            @pl.when(c == mz)
            def _():
                sbuf[pl.ds(1, 1)] = x_new[None]
                shell_dma(1, 0).start()

            return x_new

        lax.fori_loop(1, mz + 1, body, jnp.zeros((my, mx), dtype))
        # Drain: plane 1 (written at c=mz), plane 2 (c=mz−1), both shells.
        out_dma(1, mz % 2).wait()
        if mz >= 2:
            out_dma(2, (mz - 1) % 2).wait()
        shell_dma(0, nz - 1).wait()
        shell_dma(1, 0).wait()

    fwd = _march_call(fwd_kernel, 1, n_fout, [mz * my] * n_fout, my, mx,
                      dtype, my, interpret)
    bwd = _march_call(bwd_kernel, n_bin, 1, [nz * my], my, mx, dtype,
                      my if stored else 2 * my, interpret)

    def run(r):
        r2 = r.reshape(nz * my, mx)
        if stored:
            d, t = fwd(r2, jnp.asarray(mu32))
            (x,) = bwd(d, t, jnp.asarray(mu32))
        else:
            (d,) = fwd(r2, jnp.asarray(mu32))
            (x,) = bwd(d, jnp.asarray(aux32))
        return x.reshape(nz, my, mx)

    return run


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
