"""Probe: MXU matmuls INSIDE Pallas marching kernels (feasibility for the
fused transform+kernel design).

Questions, answered on the real chip:
1. Does lax.dot_general(precision=HIGHEST) lower inside a Mosaic kernel,
   and does it match XLA's HIGHEST matmul accuracy?
2. Can an in-kernel per-row-block matmul (B, nx)x(nx, Mx) hit MXU rates
   while the kernel also streams blocks (i.e. does it overlap with DMA)?

Run on the TPU box:  python artifacts/kernel_matmul_probe.py
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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, nx, Mx = 64, 512, 512
    a = jnp.asarray(rng.standard_normal((B, nx)), jnp.float32)
    S = jnp.asarray(rng.standard_normal((nx, Mx)), jnp.float32)

    # 1. accuracy: in-kernel dot at HIGHEST vs XLA HIGHEST vs f64 truth
    for prec in (lax.Precision.HIGHEST, lax.Precision.DEFAULT):
        def kern(a_ref, s_ref, o_ref, prec=prec):
            o_ref[...] = lax.dot_general(
                a_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        try:
            call = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((B, Mx), jnp.float32))
            got = np.asarray(call(a, S))
        except Exception as e:  # noqa: BLE001
            print(f"in-kernel dot {prec}: FAILED {e!r}"[:300], flush=True)
            continue
        xla = np.asarray(jnp.matmul(a, S, precision=prec))
        truth = np.asarray(a, np.float64) @ np.asarray(S, np.float64)
        scale = np.abs(truth).max()
        print(f"in-kernel dot {prec}: vs-xla {np.abs(got-xla).max()/scale:.2e}"
              f"  vs-f64 {np.abs(got-truth).max()/scale:.2e}"
              f"  (xla vs f64 {np.abs(xla-truth).max()/scale:.2e})",
              flush=True)

    # 2. throughput: grid of row-blocks, each doing (B,nx)x(nx,Mx) HIGHEST,
    # input/output streamed per block — compare with one XLA matmul of the
    # same total shape.
    ny = 512 * 512           # the real 3D x-transform row count at 512³
    B = 512
    A = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)

    def blk(a_ref, s_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    grid = ny // B
    call = pl.pallas_call(
        blk,
        grid=(grid,),
        in_specs=[pl.BlockSpec((B, nx), lambda i: (i, 0)),
                  pl.BlockSpec((nx, Mx), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((B, Mx), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny, Mx), jnp.float32))

    def timed(fn, tag):
        @jax.jit
        def many(x, eps_arr):
            def body(tot, eps):
                out = fn(x * (1 + eps))
                return tot + out[0, 0], 0
            tot, _ = lax.scan(body, jnp.float32(0.0), eps_arr)
            return tot
        meas = {}
        for S_ in (2, 12):
            eps = jnp.linspace(0.0, 1e-5, S_).astype(jnp.float32)
            float(many(A, eps))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(many(A, eps))
                best = min(best, time.perf_counter() - t0)
            meas[S_] = best
        ms = (meas[12] - meas[2]) / 10 * 1e3
        gf = 2 * ny * nx * Mx / (ms * 1e-3) / 1e12
        print(f"{tag:30s} {ms:7.3f} ms  ({gf:.1f} TF/s f32-equiv)",
              flush=True)

    timed(lambda x: call(x, S), "pallas block matmul HIGHEST")
    timed(lambda x: jnp.matmul(x, S, precision=lax.Precision.HIGHEST),
          "XLA matmul HIGHEST")


if __name__ == "__main__":
    main()
