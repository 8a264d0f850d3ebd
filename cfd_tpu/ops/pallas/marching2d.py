"""Block-marching engine for 2D (ny, nx) stencil kernels.

The 2D sibling of the rolling-plane engine (`rolling.py`): marches
y-blocks of B rows through VMEM with double-buffered manual DMA, exposing
(prev, cur, next) block triples of "halo" inputs and single blocks of
"plane" inputs to a compute callback.  Every input row is fetched from HBM
exactly once (read amplification 1.0) — the property overlapping-window
BlockSpecs can't deliver on Mosaic (their index maps must be single-term
affine and admit no low padding).

Differences from the 3D engine, by design:

* the callback computes ALL rows of its output block and handles the
  global y/x boundary itself from the global row index (``c·B + iota``) —
  there is no shell epilogue;
* the first block's ``prev`` and the last block's ``next`` are
  uninitialized VMEM: callbacks must select boundary values with
  ``jnp.where`` (never mask-multiplies — 0·NaN = NaN) so garbage cannot
  propagate into kept lanes.

Constraints (:func:`marching2d_supported`): nx % 128 == 0, ny divisible by
a block size B (multiple of 8) with ny/B ≥ 4 blocks and the working set in
VMEM.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def pick_block_rows(ny: int, nx: int, n_halo: int, n_plane: int,
                    n_out: int) -> Optional[int]:
    """Largest B (multiple of 8, dividing ny, ny/B ≥ 4) fitting VMEM."""
    if nx % 128 != 0 or ny % 8 != 0:
        return None
    per_row = nx * 4 * (4 * n_halo + 3 * n_plane + 2 * n_out)
    best = None
    for b in range(8, ny // 4 + 1, 8):
        if ny % b == 0 and b * per_row <= _VMEM_BUDGET:
            best = b
    return best


def marching2d_supported(ny: int, nx: int, n_halo: int, n_plane: int,
                         n_out: int) -> bool:
    return pick_block_rows(ny, nx, n_halo, n_plane, n_out) is not None


def make_marching_stencil_2d(ny: int, nx: int,
                             n_halo: int, n_plane: int, n_out: int,
                             compute: Callable,
                             dtype=jnp.float32,
                             n_scalars: int = 0,
                             n_pinned: int = 0,
                             pinned_rows: int = 8,
                             pinned_mats=None,
                             halo_transform=None,
                             interpret: bool = False):
    """Build the marching kernel.

    compute(row0, scalars, halo_triples, planes[, pinned]) → outs
      * row0: int32 global row index of the block's first row
      * scalars: list of n_scalars float scalars (from SMEM)
      * halo_triples: per halo input, (prev, cur, next) (B, nx) blocks
      * planes: per plane input, its (B, nx) block
      * pinned: per pinned input, its full (pinned_rows, nx) array —
        fetched into VMEM ONCE at the prologue and resident for the whole
        march (the 2D twin of the rolling engine's z-wrap pins); used for
        rows whose stencil sources live in a non-neighboring block (e.g.
        periodic-interior y-wrap rows)
      * outs: list of n_out (B, nx) blocks — every row final

    ``pinned_mats`` appends arbitrary-shape 2D inputs (a list of (rows,
    cols) shapes), also fetched once at the prologue; they arrive AFTER
    the n_pinned arrays in ``pinned`` — the 2D twin of the rolling
    engine's DST sine-matrix pins (in-kernel MXU dots overlap the block
    streaming).  ``halo_transform`` maps a halo-input index to
    ``fn(block, mats) → block`` applied ONCE per block on DMA arrival
    (ring-slot rewrite), so stencil triples see transformed blocks with
    no recompute — how the 2D corrector inverse-DSTs the pressure while
    streaming it.

    Returns fn(scalars_array, *fields) → outs on (ny, nx) arrays, or None
    when unsupported.
    """
    B = pick_block_rows(ny, nx, n_halo, n_plane, n_out)
    if B is None:
        return None
    nyb = ny // B
    mats = tuple(tuple(s) for s in (pinned_mats or ()))
    n_mats = len(mats)
    halo_transform = dict(halo_transform or {})
    n_in = n_halo + n_plane + n_pinned + n_mats

    def kernel(*refs):
        idx = 0
        scal_ref = refs[idx]; idx += 1
        in_hbm = refs[idx:idx + n_in]; idx += n_in
        out_hbm = refs[idx:idx + n_out]; idx += n_out
        rings = refs[idx:idx + n_halo]; idx += n_halo
        stages = refs[idx:idx + n_plane]; idx += n_plane
        obufs = refs[idx:idx + n_out]; idx += n_out
        pbufs = refs[idx:idx + n_pinned]; idx += n_pinned
        mbufs = refs[idx:idx + n_mats]; idx += n_mats
        in_sems = refs[idx]; idx += 1
        out_sems = refs[idx]; idx += 1
        pin_sems = None
        if n_pinned or n_mats:
            pin_sems = refs[idx]; idx += 1

        scalars = [scal_ref[0, i] for i in range(n_scalars)]

        def in_dma(k, slot):
            dmas = []
            for a in range(n_halo):
                s = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(4))
                dmas.append(pltpu.make_async_copy(
                    in_hbm[a].at[pl.ds(k * B, B), :],
                    rings[a].at[s], in_sems.at[slot, a]))
            for b in range(n_plane):
                s2 = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(3))
                dmas.append(pltpu.make_async_copy(
                    in_hbm[n_halo + b].at[pl.ds(k * B, B), :],
                    stages[b].at[s2], in_sems.at[slot, n_halo + b]))
            return dmas

        def out_dma(k, o, slot):
            return pltpu.make_async_copy(
                obufs[o].at[slot], out_hbm[o].at[pl.ds(k * B, B), :],
                out_sems.at[slot, o])

        def start_all(dmas):
            for d in dmas:
                d.start()

        def wait_all(dmas):
            for d in dmas:
                d.wait()

        # Prologue: fetch blocks 0 and 1; block 2 prefetches inside c=0.
        # Pinned inputs land whole in VMEM, once.
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
        start_all(in_dma(0, 0))
        start_all(in_dma(1, 1))
        wait_all(in_dma(0, 0))
        for d in pins:
            d.wait()

        def mat_arrays():
            return [mbufs[q][...] for q in range(n_mats)]

        def transform_arrival(k):
            """Rewrite freshly-arrived ring slots of transformed halo
            inputs — each block transformed exactly once on arrival."""
            for a, fn in halo_transform.items():
                s = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(4))
                rings[a][pl.ds(s, 1)] = fn(rings[a][s], mat_arrays())[None]

        if halo_transform:
            transform_arrival(0)

        def body(c, carry):
            c = jnp.asarray(c, jnp.int32)
            # arrival of block c+1 (prefetched at c−1 / prologue)
            @pl.when(c + 1 <= nyb - 1)
            def _():
                wait_all(in_dma(c + 1, jax.lax.rem(c + 1, jnp.int32(2))))
                if halo_transform:
                    transform_arrival(c + 1)

            @pl.when(c + 2 <= nyb - 1)
            def _():
                start_all(in_dma(c + 2, jax.lax.rem(c + 2, jnp.int32(2))))

            halo_triples = []
            for a in range(n_halo):
                # +3 ≡ −1 (mod 4) keeps the slot index non-negative at c=0;
                # that slot is uninitialized there — callbacks must select
                # boundary rows with jnp.where.
                pm = rings[a][jax.lax.rem(c + 3, jnp.int32(4))]
                pc = rings[a][jax.lax.rem(c, jnp.int32(4))]
                pp = rings[a][jax.lax.rem(c + 1, jnp.int32(4))]
                halo_triples.append((pm, pc, pp))
            planes = [stages[b][jax.lax.rem(c, jnp.int32(3))]
                      for b in range(n_plane)]

            if n_pinned or n_mats:
                outs = compute(c * B, scalars, halo_triples, planes,
                               [pbufs[q][...] for q in range(n_pinned)]
                               + mat_arrays())
            else:
                outs = compute(c * B, scalars, halo_triples, planes)

            s_out = jax.lax.rem(c, jnp.int32(2))
            for o in range(n_out):
                @pl.when(c >= 2)
                def _(o=o):
                    out_dma(c - 2, o, s_out).wait()
                obufs[o][pl.ds(s_out, 1)] = outs[o][None]
                out_dma(c, o, s_out).start()
            return carry

        jax.lax.fori_loop(0, nyb, body, jnp.zeros((), jnp.int32))

        for o in range(n_out):
            out_dma(nyb - 1, o, (nyb - 1) % 2).wait()
            out_dma(nyb - 2, o, (nyb - 2) % 2).wait()

    out_shapes = [jax.ShapeDtypeStruct((ny, nx), dtype)
                  for _ in range(n_out)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)]

    mat_bytes = sum(r * c * 4 for r, c in mats)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((4, B, nx), dtype) for _ in range(n_halo)]
            + [pltpu.VMEM((3, B, nx), dtype) for _ in range(n_plane)]
            + [pltpu.VMEM((2, B, nx), dtype) for _ in range(n_out)]
            + [pltpu.VMEM((pinned_rows, nx), dtype)
               for _ in range(n_pinned)]
            + [pltpu.VMEM((r, c), dtype) for r, c in mats]
            + [pltpu.SemaphoreType.DMA((2, n_halo + n_plane)),
               pltpu.SemaphoreType.DMA((2, n_out))]
            + ([pltpu.SemaphoreType.DMA((n_pinned + n_mats,))]
               if n_pinned or n_mats else [])),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # scratch stays under _VMEM_BUDGET (+ the resident DST pins);
            # the rest is headroom for compiler-inserted stack/copies (the
            # default 16 MiB scoped limit left ~3 MiB and overflowed by
            # 0.5 MiB at 2048² once the tdma transform joined the program
            # — v5e has 128 MiB)
            vmem_limit_bytes=(_VMEM_BUDGET + 24 * 1024 * 1024
                              + mat_bytes)),
        interpret=interpret,
    )

    def run(scalars, *fields):
        # trailing args: n_pinned (pinned_rows, nx) + n_mats declared
        # 2D shapes; the rest (ny, nx)
        scal = jnp.asarray(scalars, dtype).reshape(1, max(1, n_scalars))
        n_march = len(fields) - n_pinned - n_mats
        flat = [f.reshape(ny, nx) for f in fields[:n_march]]
        pins = [f.reshape(pinned_rows, nx)
                for f in fields[n_march:n_march + n_pinned]]
        ms = [jnp.asarray(f, dtype) for f in fields[n_march + n_pinned:]]
        return call(scal, *flat, *pins, *ms)

    return run
