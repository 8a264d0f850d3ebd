"""Probe: does an in-kernel MXU matmul overlap with a DMA-bound Pallas
kernel's streaming? (Feasibility gate for fusing the DST x-stages into the
predictor/corrector marching kernels — VERDICT r3 item 2.)

Measures, on the real chip, with carry-chained perturbation of the SMALL
matrix so XLA cannot hoist the work out of the timing loop (the r3
kernel_matmul_probe perturbed the big operand linearly and XLA hoisted it
→ negative timings):

1. XLA matmul HIGHEST          (262144,512)x(512,512)   — the DST x-stage
2. pallas block dot HIGHEST    same shape, 512-row blocks
3. streaming kernel            read+write the same big array, light VPU work
4. streaming + in-kernel dot   (3) and (2) in one kernel body

overlap efficiency = 1 - (t4 - t3)/t2:  1.0 = matmul rides free,
0.0 = strictly serial.

Run on the TPU box:  python artifacts/overlap_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NY, NX, MX, B = 512 * 512, 512, 512, 512
FLOP = 2 * NY * NX * MX
BYTES = NY * NX * 4 * 2      # read + write of the big array


def timed(fn, A, S, tag, flop=None, gbytes=None):
    """Marginal Δ-budget timing; each iteration perturbs S through the
    carry so the body is not hoistable, at negligible cost (S is 1 MiB)."""
    @jax.jit
    def many(A, S, n):
        def body(i, carry):
            tot, S = carry
            out = fn(A, S)
            tot = tot + out
            # feed the scalar back into S: not hoistable, ~free
            return tot, S * (1.0 + tot * 0.0)
        tot, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), S))
        return tot

    float(many(A, S, jnp.int32(1)))
    meas = {}
    for n in (2, 12):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(A, S, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        meas[n] = best
    ms = (meas[12] - meas[2]) / 10 * 1e3
    extra = ""
    if flop:
        extra += f"  {flop / (ms * 1e-3) / 1e12:6.1f} TF/s"
    if gbytes:
        extra += f"  {gbytes / (ms * 1e-3) / 1e9:6.0f} GB/s"
    print(f"{tag:34s} {ms:8.3f} ms{extra}", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((NY, NX)), jnp.float32)
    S = jnp.asarray(rng.standard_normal((NX, MX)) / NX, jnp.float32)

    def xla_mm(A, S):
        out = jnp.matmul(A, S, precision=lax.Precision.HIGHEST)
        return out[0, 0]

    t1 = timed(xla_mm, A, S, "1. XLA matmul HIGHEST", flop=FLOP)

    # --- 2. pallas block dot ---
    def dot_kern(a_ref, s_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    dot_call = pl.pallas_call(
        dot_kern, grid=(NY // B,),
        in_specs=[pl.BlockSpec((B, NX), lambda i: (i, 0)),
                  pl.BlockSpec((NX, MX), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((B, MX), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NY, MX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    t2 = timed(lambda A, S: dot_call(A, S)[0, 0], A, S,
               "2. pallas block dot HIGHEST", flop=FLOP)

    # --- 3. streaming kernel (no dot): block in, light VPU op, block out ---
    def stream_kern(a_ref, s_ref, o_ref):
        x = a_ref[...]
        o_ref[...] = x * 1.0001 + 0.5

    stream_call = pl.pallas_call(
        stream_kern, grid=(NY // B,),
        in_specs=[pl.BlockSpec((B, NX), lambda i: (i, 0)),
                  pl.BlockSpec((NX, MX), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((B, NX), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NY, NX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    t3 = timed(lambda A, S: stream_call(A, S)[0, 0], A, S,
               "3. streaming only", gbytes=BYTES)

    # --- 4. streaming + dot in one body (two outputs) ---
    def both_kern(a_ref, s_ref, o_ref, m_ref):
        x = a_ref[...]
        o_ref[...] = x * 1.0001 + 0.5
        m_ref[...] = lax.dot_general(
            x, s_ref[...], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    both_call = pl.pallas_call(
        both_kern, grid=(NY // B,),
        in_specs=[pl.BlockSpec((B, NX), lambda i: (i, 0)),
                  pl.BlockSpec((NX, MX), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((B, NX), lambda i: (i, 0)),
                   pl.BlockSpec((B, MX), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((NY, NX), jnp.float32),
                   jax.ShapeDtypeStruct((NY, MX), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def both(A, S):
        o, m = both_call(A, S)
        return o[0, 0] + m[0, 0]

    t4 = timed(both, A, S, "4. streaming + in-kernel dot",
               flop=FLOP, gbytes=BYTES + NY * MX * 4)

    print(f"\nmarginal dot cost inside streaming kernel: {t4 - t3:.3f} ms "
          f"(standalone {t2:.3f} ms) → overlap efficiency "
          f"{1 - (t4 - t3) / t2:.2f}", flush=True)
    # NOTE: (4) also writes an extra (NY,MX) output the real fused kernel
    # would write INSTEAD of (not in addition to) the streamed field; its
    # extra write bytes are reported in the GB/s column for calibration.


if __name__ == "__main__":
    main()
