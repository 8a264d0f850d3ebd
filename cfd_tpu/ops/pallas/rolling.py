"""Generic rolling-plane stencil engine.

Factors the manual-DMA pattern of ``cg_kernels.make_lap_dot_rolling`` into a
reusable builder: march z-planes of (nz, ny, nx) fields through VMEM with
double-buffered DMA, exposing (k−1, k, k+1) plane triples of "halo" inputs
and single planes of "plane" inputs to a user compute callback, writing one
or more output planes per step and optionally accumulating a scalar
reduction.  Every input plane is fetched from HBM exactly once (read
amplification 1.0) — the property halo-window BlockSpecs can't deliver.

Used by the fused projection kernels (predictor / divergence / corrector)
and available for any 7-point-stencil-shaped op.

Constraints (checked by :func:`rolling_supported`): nx % 128 == 0,
ny % 8 == 0, nz ≥ 3, and the plane working set must fit VMEM.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def rolling_supported(nz: int, ny: int, nx: int, n_halo: int, n_plane: int,
                      n_out: int) -> bool:
    if nz < 3 or nx % 128 != 0 or ny % 8 != 0:
        return False
    plane_bytes = ny * nx * 4
    planes = 4 * n_halo + 3 * n_plane + 2 * n_out
    return planes * plane_bytes <= _VMEM_BUDGET


def make_rolling_stencil(nz: int, ny: int, nx: int,
                         n_halo: int, n_plane: int, n_out: int,
                         compute: Callable,
                         dtype=jnp.float32,
                         n_scalars: int = 0,
                         with_reduction: bool = False,
                         shell_passthrough: Optional[Sequence] = None,
                         interpret: bool = False):
    """Build the rolling kernel.

    compute(k, scalars, halo_triples, planes) → (outs, partial)
      * k: int32 plane index (interior: 1..nz-2)
      * scalars: list of n_scalars float scalars (from the SMEM input)
      * halo_triples: per halo input, (zm, zc, zp) plane arrays (ny, nx)
      * planes: per plane input, its (ny, nx) plane
      * outs: list of n_out (ny, nx) planes for plane k
      * partial: scalar contribution (when with_reduction)

    Output z-shell planes (k=0, nz−1): zero-filled by default; when
    ``shell_passthrough[o]`` names an input index, that input's shell planes
    are copied through instead (used by the projection kernels to preserve
    caller-set boundary values, the reference's save/restore idiom).

    Returns fn(scalars_array, *fields) → (*outs[, reduction]) operating on
    (nz, ny, nx) arrays.
    """
    if not rolling_supported(nz, ny, nx, n_halo, n_plane, n_out):
        return None
    rows = nz * ny
    n_in = n_halo + n_plane

    def kernel(*refs):
        # ref order: scalars_smem, in_hbm×n_in, out_hbm×n_out [, red_smem],
        #            rings×n_halo, stage×n_plane, obuf×n_out,
        #            in_sems, out_sems
        idx = 0
        scal_ref = refs[idx]; idx += 1
        in_hbm = refs[idx:idx + n_in]; idx += n_in
        out_hbm = refs[idx:idx + n_out]; idx += n_out
        red_ref = None
        if with_reduction:
            red_ref = refs[idx]; idx += 1
        rings = refs[idx:idx + n_halo]; idx += n_halo
        stages = refs[idx:idx + n_plane]; idx += n_plane
        obufs = refs[idx:idx + n_out]; idx += n_out
        in_sems = refs[idx]; idx += 1
        out_sems = refs[idx]; idx += 1

        scalars = [scal_ref[0, i] for i in range(n_scalars)]

        def in_dma(k, slot):
            """DMAs for plane k of every input. Halo inputs land in ring
            slot k%4; plane inputs in stage slot k%2."""
            dmas = []
            for a in range(n_halo):
                s = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(4))
                dmas.append(pltpu.make_async_copy(
                    in_hbm[a].at[pl.ds(k * ny, ny), :],
                    rings[a].at[s], in_sems.at[slot, a]))
            for b in range(n_plane):
                # 3-slot staging: the prefetch for plane k+2 must not land in
                # the slot holding plane k, which compute still reads.
                s2 = jax.lax.rem(jnp.asarray(k, jnp.int32), jnp.int32(3))
                dmas.append(pltpu.make_async_copy(
                    in_hbm[n_halo + b].at[pl.ds(k * ny, ny), :],
                    stages[b].at[s2], in_sems.at[slot, n_halo + b]))
            return dmas

        def out_dma(k, o, slot):
            return pltpu.make_async_copy(
                obufs[o].at[slot], out_hbm[o].at[pl.ds(k * ny, ny), :],
                out_sems.at[slot, o])

        def start_all(dmas):
            for d in dmas:
                d.start()

        def wait_all(dmas):
            for d in dmas:
                d.wait()

        # Prologue: fetch planes 0, 1, start 2.
        start_all(in_dma(0, 0))
        start_all(in_dma(1, 1))
        wait_all(in_dma(0, 0))
        wait_all(in_dma(1, 1))
        start_all(in_dma(2, 0))

        def body(c, acc):
            c = jnp.asarray(c, jnp.int32)
            # plane c+1 arrival (started at previous step / prologue)
            wait_all(in_dma(c + 1, jax.lax.rem(c + 1, jnp.int32(2))))

            # prefetch plane c+2
            @pl.when(c + 2 <= nz - 1)
            def _():
                start_all(in_dma(c + 2, jax.lax.rem(c + 2, jnp.int32(2))))

            halo_triples = []
            for a in range(n_halo):
                zm = rings[a][jax.lax.rem(c - 1, jnp.int32(4))]
                zc = rings[a][jax.lax.rem(c, jnp.int32(4))]
                zp = rings[a][jax.lax.rem(c + 1, jnp.int32(4))]
                halo_triples.append((zm, zc, zp))
            planes = [stages[b][jax.lax.rem(c, jnp.int32(3))]
                      for b in range(n_plane)]

            outs, partial = compute(c, scalars, halo_triples, planes)

            s_out = jax.lax.rem(c, jnp.int32(2))
            for o in range(n_out):
                @pl.when(c >= 3)
                def _(o=o):
                    out_dma(c - 2, o, s_out).wait()
                obufs[o][pl.ds(s_out, 1)] = outs[o][None]
                out_dma(c, o, s_out).start()
            if with_reduction:
                acc = acc + partial
            return acc

        acc = jax.lax.fori_loop(1, nz - 1, body, jnp.zeros((), dtype))

        # Epilogue: drain output DMAs, then fill the z-shell planes —
        # zeros by default, or a passthrough copy of an input's shells.
        for o in range(n_out):
            out_dma(nz - 2, o, (nz - 2) % 2).wait()
            if nz >= 4:
                out_dma(nz - 3, o, (nz - 3) % 2).wait()
            src_idx = shell_passthrough[o] if shell_passthrough else None
            if src_idx is None:
                obufs[o][pl.ds(0, 1)] = jnp.zeros((1, ny, nx), dtype)
                out_dma(0, o, 0).start()
                out_dma(0, o, 0).wait()
                obufs[o][pl.ds(1, 1)] = jnp.zeros((1, ny, nx), dtype)
                out_dma(nz - 1, o, 1).start()
                out_dma(nz - 1, o, 1).wait()
            else:
                for k, slot in ((0, 0), (nz - 1, 1)):
                    fetch = pltpu.make_async_copy(
                        in_hbm[src_idx].at[pl.ds(k * ny, ny), :],
                        obufs[o].at[slot], out_sems.at[slot, o])
                    fetch.start()
                    fetch.wait()
                    out_dma(k, o, slot).start()
                    out_dma(k, o, slot).wait()
        if with_reduction:
            red_ref[0, 0] = acc

    out_shapes = [jax.ShapeDtypeStruct((rows, nx), dtype)
                  for _ in range(n_out)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)]
    if with_reduction:
        out_shapes.append(jax.ShapeDtypeStruct((1, 1), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((4, ny, nx), dtype) for _ in range(n_halo)]
            + [pltpu.VMEM((3, ny, nx), dtype) for _ in range(n_plane)]
            + [pltpu.VMEM((2, ny, nx), dtype) for _ in range(n_out)]
            + [pltpu.SemaphoreType.DMA((2, n_in)),
               pltpu.SemaphoreType.DMA((2, n_out))]),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def run(scalars, *fields):
        scal = jnp.asarray(scalars, dtype).reshape(1, max(1, n_scalars))
        flat = [f.reshape(rows, nx) for f in fields]
        results = call(scal, *flat)
        outs = [results[o].reshape(nz, ny, nx) for o in range(n_out)]
        if with_reduction:
            return (*outs, results[n_out][0, 0])
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
