"""Generic rolling-plane stencil engine.

Factors the manual-DMA pattern of ``cg_kernels.make_lap_dot_rolling`` into a
reusable builder: march z-planes of (nz, ny, nx) fields through VMEM with
double-buffered DMA, exposing (k−W, …, k, …, k+W) plane windows of "halo"
inputs and single planes of "plane" inputs to a user compute callback,
writing one or more output planes per step and optionally accumulating
scalar reductions.  Every input plane is fetched from HBM exactly once
(read amplification 1.0) — the property halo-window BlockSpecs can't
deliver on Mosaic.

Used by the fused projection kernels (predictor / divergence / corrector)
and available for any stencil-shaped op up to radius ``halo_window`` in z.

``halo_window=2`` windows read garbage planes at the ends (plane −1 at
k=1, plane nz at k=nz−2): callbacks must discard those contributions with
``jnp.where`` selects (mask-multiplies propagate NaN garbage).

``reductions`` lists per-kernel scalar accumulators ("sum" or "max") over
the computed interior planes k = 1..nz−2; z-shell planes are NOT included
— callers fold them in with two cheap jnp face reductions when the
semantics need the full field.

Constraints (checked by :func:`rolling_supported`): nx % 128 == 0,
ny % 8 == 0, nz ≥ 3, and the plane working set within VMEM (v5e carries
128 MiB of VMEM — probed empirically up to 127 MiB of scratch; the budget
leaves headroom for compiler temporaries).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 110 * 1024 * 1024


def hp_dot_general(a, b, dimension_numbers, precision,
                   preferred_element_type=jnp.float32):
    """``lax.dot_general`` with a Mosaic-lowerable ``Precision.HIGH``.

    Mosaic's dot lowering supports only DEFAULT and HIGHEST
    (jax 0.9 ``pallas/mosaic/lowering.py``: "Unsupported dot precision:
    HIGH" on the real chip — interpret mode never sees it).  HIGH
    (bf16_3x) is built manually: split each f32 operand into a bf16
    high part plus a bf16 residual and accumulate the three dominant
    cross products on the MXU in f32.  The dropped lo·lo term is
    O(2^-16) relative — exactly the bf16_3x semantics XLA gives
    ``Precision.HIGH`` on TPU, at 3 MXU passes instead of HIGHEST's 6.
    """
    if precision != jax.lax.Precision.HIGH:
        return jax.lax.dot_general(
            a, b, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type)
    f32 = jnp.float32
    ah = a.astype(jnp.bfloat16)
    al = (a.astype(f32) - ah.astype(f32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b.astype(f32) - bh.astype(f32)).astype(jnp.bfloat16)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers,
            preferred_element_type=preferred_element_type)

    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def rolling_supported(nz: int, ny: int, nx: int, n_halo: int, n_plane: int,
                      n_out: int, halo_window: int = 1) -> bool:
    if nz < 3 or nx % 128 != 0 or ny % 8 != 0:
        return False
    plane_bytes = ny * nx * 4
    ring = 2 * halo_window + 2
    stage = halo_window + 2
    planes = ring * n_halo + stage * n_plane + 2 * n_out
    return planes * plane_bytes <= _VMEM_BUDGET


def make_rolling_stencil(nz: int, ny: int, nx: int,
                         n_halo: int, n_plane: int, n_out: int,
                         compute: Callable,
                         dtype=jnp.float32,
                         n_scalars: int = 0,
                         with_reduction: bool = False,
                         reductions: Optional[Sequence[str]] = None,
                         shell_passthrough: Optional[Sequence] = None,
                         shell_periodic: Optional[Sequence[int]] = None,
                         shell_sources: Optional[dict] = None,
                         n_pinned: int = 0,
                         pinned_mats: Optional[Sequence[tuple]] = None,
                         halo_transform: Optional[dict] = None,
                         halo_window: int = 1,
                         carry_planes: int = 0,
                         reverse: bool = False,
                         peel_ends: bool = False,
                         interpret: bool = False):
    """Build the rolling kernel.

    compute(k, scalars, halo_windows, planes[, pinned]) → (outs, partials)
      * k: int32 plane index (interior: 1..nz-2)
      * scalars: list of n_scalars float scalars (from the SMEM input)
      * halo_windows: per halo input, a (2W+1)-tuple of (ny, nx) planes
        (k−W … k+W); with W=1 the familiar (zm, zc, zp) triple
      * planes: per plane input, its (ny, nx) plane
      * outs: list of n_out (ny, nx) planes for plane k
      * partials: tuple of scalar contributions matching ``reductions``
        (None / ignored when no reductions)

    Output z-shell planes (k=0, nz−1): zero-filled by default; when
    ``shell_passthrough[o]`` names an input index, that input's shell planes
    are copied through instead (used by the projection kernels to preserve
    caller-set boundary values, the reference's save/restore idiom).
    ``shell_periodic`` lists output indices whose z-shells take the
    PERIODIC wrap of the computed output: out[0] = out[nz−2],
    out[nz−1] = out[1] (the euler kernel's `apply_periodic_scalar` z-faces;
    snapshotted during the sweep since the ring slots recycle).
    ``shell_sources`` generalizes shell_periodic: a dict mapping an output
    index to a (low, high) pair describing its z-shell planes, each
    ``"p1"`` (computed plane 1), ``"pN2"`` (computed plane nz−2), or a
    float constant — periodic ≡ ("pN2", "p1"), Neumann-mirror ≡
    ("p1", "pN2"), Dirichlet ≡ (c, c).  Used by the fused euler kernel's
    thermal z-faces.
    ``n_pinned`` appends that many (2, ny, nx) inputs fetched ONCE into
    VMEM at the prologue and handed to compute as (plane0, plane1) tuples —
    used for periodic z-wrap neighbor planes that the streaming window
    can't see (the RK kernels' f[nz−2] / f[1] substitutes).
    ``pinned_mats`` appends arbitrary-shape 2D inputs (a list of (rows,
    cols) shapes), also fetched once at the prologue; they arrive as plain
    arrays AFTER the n_pinned pairs in compute's ``pinned`` argument (which
    is passed whenever either is nonempty).  Used to hold DST sine matrices
    for in-kernel MXU transforms — measured (artifacts/overlap_probe.py):
    an in-kernel HIGHEST dot runs at 31.7 TF/s and fully overlaps the
    engine's DMA streaming (combined kernel = max(DMA, MXU)).
    ``halo_transform`` maps a halo-input index to ``fn(plane, mats) →
    plane`` applied ONCE per plane on DMA arrival (ring-slot rewrite), so
    stencil windows see transformed planes with no re-compute per window
    position — this is how the corrector kernel inverse-DSTs the pressure
    while streaming it.
    ``carry_planes`` threads that many (ny, nx) planes through the z-march
    as fori_loop-carried values (zero-initialized): compute then receives
    one more positional argument ``carry`` (a list) and must return
    ``(outs, partials, new_carry)``.  Array-carry fori beats per-iteration
    ref read/write on Mosaic (measured, tdma.py) — this is how the DST
    predictor runs the Thomas forward recurrence across planes in the same
    sweep that produces them.
    ``reverse=True`` marches planes nz−2 → 1 instead of 1 → nz−2: all
    slot/semaphore bookkeeping stays in march order, only the HBM
    addresses (and the ``k`` handed to compute) map through
    ``nz−1−order``.  Carries then flow from high k to low k — how the
    DST corrector runs the Thomas BACKWARD substitution in the same
    sweep that consumes its output.
    ``peel_ends=True`` (requires nz ≥ 4) traces the first and last march
    steps outside the fori loop and passes compute a static
    ``stage="first"/"last"`` keyword (``None`` inside the loop), so
    boundary-only work (an extra transform at the start, a mirror
    substitution at the end) costs nothing per interior plane.

    ``with_reduction=True`` is the legacy spelling of
    ``reductions=("sum",)`` with the partial returned as a bare scalar.

    Returns fn(scalars_array, *fields) → (*outs[, *reductions]) operating
    on (nz, ny, nx) arrays, or None when unsupported.
    """
    if with_reduction and reductions is None:
        reductions = ("sum",)
    reductions = tuple(reductions or ())
    n_red = len(reductions)
    shell_src = dict(shell_sources or {})
    for o in (shell_periodic or ()):
        shell_src[o] = ("pN2", "p1")
    # snapshot buffers: one per output needing a computed shell plane
    snap_outs = tuple(o for o, (lo, hi) in sorted(shell_src.items())
                      if isinstance(lo, str) or isinstance(hi, str))
    sp_list = snap_outs  # retains the old name used below
    mats = tuple(tuple(s) for s in (pinned_mats or ()))
    n_mats = len(mats)
    halo_transform = dict(halo_transform or {})
    if peel_ends and nz < 4:
        raise ValueError("peel_ends needs nz >= 4 (distinct end steps)")
    plane_bytes = ny * nx * 4
    mat_planes = -(-sum(r * c * 4 for r, c in mats) // plane_bytes)
    if not rolling_supported(nz, ny, nx, n_halo, n_plane,
                             n_out + len(sp_list) + n_pinned + mat_planes,
                             halo_window):
        return None
    rows = nz * ny
    n_in = n_halo + n_plane + n_pinned + n_mats
    W = int(halo_window)
    R = 2 * W + 2  # halo ring slots: 2W+1 live + 1 prefetch target
    S = W + 2      # plane staging: plane k lives from fetch (k−W−1) to read (k)

    def _red_init():
        vals = []
        for op in reductions:
            if op == "sum":
                vals.append(jnp.zeros((), dtype))
            elif op == "max":
                vals.append(jnp.full((), -jnp.inf, dtype))
            else:
                raise ValueError(f"unknown reduction {op!r}")
        return tuple(vals)

    def _red_combine(acc, partials):
        out = []
        for op, a, p in zip(reductions, acc, partials):
            out.append(a + p if op == "sum" else jnp.maximum(a, p))
        return tuple(out)

    def kernel(*refs):
        # ref order: scalars_smem, in_hbm×n_in, out_hbm×n_out [, red_smem],
        #            rings×n_halo, stage×n_plane, obuf×n_out,
        #            in_sems, out_sems
        idx = 0
        scal_ref = refs[idx]; idx += 1
        in_hbm = refs[idx:idx + n_in]; idx += n_in
        out_hbm = refs[idx:idx + n_out]; idx += n_out
        red_ref = None
        if n_red:
            red_ref = refs[idx]; idx += 1
        rings = refs[idx:idx + n_halo]; idx += n_halo
        stages = refs[idx:idx + n_plane]; idx += n_plane
        obufs = refs[idx:idx + n_out]; idx += n_out
        sbufs = refs[idx:idx + len(sp_list)]; idx += len(sp_list)
        pbufs = refs[idx:idx + n_pinned]; idx += n_pinned
        mbufs = refs[idx:idx + n_mats]; idx += n_mats
        in_sems = refs[idx]; idx += 1
        out_sems = refs[idx]; idx += 1
        pin_sems = None
        if n_pinned or n_mats:
            pin_sems = refs[idx]; idx += 1

        scalars = [scal_ref[0, i] for i in range(n_scalars)]

        def ring_slot(k):
            # k ≥ −W can occur in slot math only via live plane indices
            # (k ≥ 0 for DMAs); +R keeps rem non-negative everywhere.
            return jax.lax.rem(jnp.asarray(k, jnp.int32) + jnp.int32(R),
                               jnp.int32(R))

        def phys(k):
            """March-order index → physical plane index.  All slot and
            semaphore bookkeeping stays in march order; only HBM
            addresses (and compute's k) map through this."""
            return (nz - 1) - k if reverse else k

        def in_dma(k, slot):
            """DMAs for plane of march order k of every streamed input.
            Halo inputs land in ring slot k%R; plane inputs in stage
            slot k%S."""
            dmas = []
            kp = phys(k)
            for a in range(n_halo):
                dmas.append(pltpu.make_async_copy(
                    in_hbm[a].at[pl.ds(kp * ny, ny), :],
                    rings[a].at[ring_slot(k)], in_sems.at[slot, a]))
            for b in range(n_plane):
                # (W+2)-slot staging: the prefetch for plane k+W+1 must not
                # land in the slot holding plane k, which compute still
                # reads, nor in slots of fetched-not-yet-read planes.
                s2 = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(S))
                dmas.append(pltpu.make_async_copy(
                    in_hbm[n_halo + b].at[pl.ds(kp * ny, ny), :],
                    stages[b].at[s2], in_sems.at[slot, n_halo + b]))
            return dmas

        def out_dma(k, o, slot):
            return pltpu.make_async_copy(
                obufs[o].at[slot],
                out_hbm[o].at[pl.ds(phys(k) * ny, ny), :],
                out_sems.at[slot, o])

        def start_all(dmas):
            for d in dmas:
                d.start()

        def wait_all(dmas):
            for d in dmas:
                d.wait()

        # Prologue: fetch planes 0..W+1 (the first compute at c=1 reads
        # planes up to 1+W); plane 2+W prefetches inside the first body.
        # Pinned inputs (each a (2·ny, nx) HBM array) and pinned matrices
        # land whole in VMEM.
        pins = []
        for q in range(n_pinned):
            d = pltpu.make_async_copy(
                in_hbm[n_halo + n_plane + q], pbufs[q], pin_sems.at[q])
            d.start()
            pins.append(d)
        for q in range(n_mats):
            d = pltpu.make_async_copy(
                in_hbm[n_halo + n_plane + n_pinned + q], mbufs[q],
                pin_sems.at[n_pinned + q])
            d.start()
            pins.append(d)
        first = min(W + 1, nz - 1)
        for k in range(first + 1):
            start_all(in_dma(k, k % 2))
        for k in range(first + 1):
            wait_all(in_dma(k, k % 2))
        for d in pins:
            d.wait()

        def mat_arrays():
            return [mbufs[q][...] for q in range(n_mats)]

        def transform_arrival(k):
            """Rewrite freshly-arrived ring slots of transformed halo
            inputs — each plane transformed exactly once."""
            for a, fn in halo_transform.items():
                slot = ring_slot(k)
                rings[a][pl.ds(slot, 1)] = fn(rings[a][slot],
                                              mat_arrays())[None]

        for k in range(first + 1):
            if halo_transform:
                transform_arrival(k)

        def body(c, acc_carry, stage=None):
            acc, carry = acc_carry
            c = jnp.asarray(c, jnp.int32)
            # prefetch plane of order c+W+1 (its arrival is awaited at c+1)
            @pl.when(c + W + 1 <= nz - 1)
            def _():
                start_all(in_dma(c + W + 1,
                                 jax.lax.rem(c + W + 1, jnp.int32(2))))

            # order c+W arrival (started at c−1 / prologue)
            @pl.when((c + W <= nz - 1) & (c > 1))
            def _():
                wait_all(in_dma(c + W, jax.lax.rem(c + W, jnp.int32(2))))
                if halo_transform:
                    transform_arrival(c + W)

            halo_windows = []
            # in reverse, order c+d holds plane phys(c)−d: flip the
            # window so compute always sees (k−W, …, k, …, k+W)
            d_order = range(W, -W - 1, -1) if reverse else range(-W, W + 1)
            for a in range(n_halo):
                halo_windows.append(tuple(rings[a][ring_slot(c + d)]
                                          for d in d_order))
            planes = [stages[b][jax.lax.rem(c, jnp.int32(S))]
                      for b in range(n_plane)]

            args = [phys(c), scalars, halo_windows, planes]
            if n_pinned or n_mats:
                args.append([(pbufs[q][0:ny, :], pbufs[q][ny:2 * ny, :])
                             for q in range(n_pinned)] + mat_arrays())
            kw = {"stage": stage} if peel_ends else {}
            if carry_planes:
                if len(args) == 4:
                    args.append(None)
                outs, partials, carry = compute(*args, list(carry), **kw)
                carry = tuple(carry)
            else:
                outs, partials = compute(*args, **kw)

            s_out = jax.lax.rem(c, jnp.int32(2))
            for o in range(n_out):
                @pl.when(c >= 3)
                def _(o=o):
                    out_dma(c - 2, o, s_out).wait()
                obufs[o][pl.ds(s_out, 1)] = outs[o][None]
                out_dma(c, o, s_out).start()
            # snapshot conditions key on the PHYSICAL plane computed:
            # plane 1 is the first march step forward, the last reversed
            c_p1 = nz - 2 if reverse else 1
            c_pN2 = 1 if reverse else nz - 2
            for si, o in enumerate(sp_list):
                @pl.when(c == c_p1)
                def _(si=si, o=o):
                    sbufs[si][pl.ds(0, 1)] = outs[o][None]

                @pl.when(c == c_pN2)
                def _(si=si, o=o):
                    sbufs[si][pl.ds(1, 1)] = outs[o][None]
            if n_red:
                if with_reduction:
                    partials = (partials,)
                acc = _red_combine(acc, partials)
            return acc, carry

        carry0 = tuple(jnp.zeros((ny, nx), dtype)
                       for _ in range(carry_planes))
        if peel_ends:
            # first/last march steps traced statically so compute can do
            # boundary-only work (extra transform / mirror substitution)
            # without paying for it on interior planes
            st = body(jnp.int32(1), (_red_init(), carry0), stage="first")
            st = jax.lax.fori_loop(2, nz - 2,
                                   lambda c, a: body(c, a, None), st)
            acc, _ = body(jnp.int32(nz - 2), st, stage="last")
        else:
            acc, _ = jax.lax.fori_loop(1, nz - 1,
                                       lambda c, a: body(c, a, None),
                                       (_red_init(), carry0))

        # Epilogue: drain output DMAs, then fill the z-shell planes —
        # zeros by default, or a passthrough copy of an input's shells.
        # Shell writes target PHYSICAL planes 0 / nz−1: out_dma maps
        # order → phys, and phys is an involution, so passing phys(k)
        # lands at physical k in both march directions.
        for o in range(n_out):
            out_dma(nz - 2, o, (nz - 2) % 2).wait()
            if nz >= 4:
                out_dma(nz - 3, o, (nz - 3) % 2).wait()
            src_idx = shell_passthrough[o] if shell_passthrough else None
            if o in shell_src:
                lo, hi = shell_src[o]
                si = sp_list.index(o) if o in sp_list else None

                def shell_plane(spec):
                    if spec == "p1":
                        return sbufs[si][pl.ds(0, 1)]
                    if spec == "pN2":
                        return sbufs[si][pl.ds(1, 1)]
                    return jnp.full((1, ny, nx), dtype(spec), dtype)

                obufs[o][pl.ds(0, 1)] = shell_plane(lo)
                out_dma(phys(0), o, 0).start()
                out_dma(phys(0), o, 0).wait()
                obufs[o][pl.ds(1, 1)] = shell_plane(hi)
                out_dma(phys(nz - 1), o, 1).start()
                out_dma(phys(nz - 1), o, 1).wait()
            elif src_idx is None:
                obufs[o][pl.ds(0, 1)] = jnp.zeros((1, ny, nx), dtype)
                out_dma(phys(0), o, 0).start()
                out_dma(phys(0), o, 0).wait()
                obufs[o][pl.ds(1, 1)] = jnp.zeros((1, ny, nx), dtype)
                out_dma(phys(nz - 1), o, 1).start()
                out_dma(phys(nz - 1), o, 1).wait()
            else:
                for k, slot in ((0, 0), (nz - 1, 1)):
                    fetch = pltpu.make_async_copy(
                        in_hbm[src_idx].at[pl.ds(k * ny, ny), :],
                        obufs[o].at[slot], out_sems.at[slot, o])
                    fetch.start()
                    fetch.wait()
                    out_dma(phys(k), o, slot).start()
                    out_dma(phys(k), o, slot).wait()
        for i in range(n_red):
            red_ref[0, i] = acc[i]

    out_shapes = [jax.ShapeDtypeStruct((rows, nx), dtype)
                  for _ in range(n_out)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)]
    if n_red:
        out_shapes.append(jax.ShapeDtypeStruct((1, n_red), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((R, ny, nx), dtype) for _ in range(n_halo)]
            + [pltpu.VMEM((S, ny, nx), dtype) for _ in range(n_plane)]
            + [pltpu.VMEM((2, ny, nx), dtype) for _ in range(n_out)]
            + [pltpu.VMEM((2, ny, nx), dtype) for _ in sp_list]
            + [pltpu.VMEM((2 * ny, nx), dtype) for _ in range(n_pinned)]
            + [pltpu.VMEM((r, c), dtype) for r, c in mats]
            + [pltpu.SemaphoreType.DMA((2, n_in)),
               pltpu.SemaphoreType.DMA((2, n_out))]
            + ([pltpu.SemaphoreType.DMA((n_pinned + n_mats,))]
               if n_pinned or n_mats else [])),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e carries 128 MiB of VMEM; XLA's default scoped limit is
            # 16 MiB — raise it so the wide-window fused kernels fit.
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024),
        interpret=interpret,
    )

    def run(scalars, *fields):
        scal = jnp.asarray(scalars, dtype).reshape(1, max(1, n_scalars))
        # streamed inputs flatten to (nz·ny, nx); pinned to (2·ny, nx);
        # pinned matrices pass through at their declared (r, c) shapes
        flat = [f.reshape(rows, nx) for f in fields[:n_halo + n_plane]]
        flat += [f.reshape(2 * ny, nx)
                 for f in fields[n_halo + n_plane:
                                 n_halo + n_plane + n_pinned]]
        flat += [jnp.asarray(f, dtype)
                 for f in fields[n_halo + n_plane + n_pinned:]]
        results = call(scal, *flat)
        outs = [results[o].reshape(nz, ny, nx) for o in range(n_out)]
        if with_reduction:
            return (*outs, results[n_out][0, 0])
        if n_red:
            return (*outs, *(results[n_out][0, i] for i in range(n_red)))
        return tuple(outs)

    return run


def plane_masks(ny: int, nx: int, dtype):
    """(interior row/col mask, j index grid, i index grid) for compute fns."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    mask = ((jj > 0) & (jj < ny - 1) & (ii > 0)
            & (ii < nx - 1)).astype(dtype)
    return mask, jj, ii


def shift_x(plane, sign):
    """plane[:, i+sign] with circular wrap (wrapped lanes must be masked)."""
    return jnp.roll(plane, -sign, axis=1)


def shift_y(plane, sign, ny):
    """plane[j+sign, :] with circular wrap (wrapped rows must be masked)."""
    if sign >= 0:
        return pltpu.roll(plane, ny - sign if sign else 0, axis=0)
    return pltpu.roll(plane, -sign, axis=0)
