"""Probe: 2D transform pipeline, TDMA-y vs eigen, on the real chip.

Round-3 advice: the auto profitability gate in spectral.py compares MXU
FLOP counts only (`ceil_to(mx,1024) < 2*mx`), but the y-stage it enables
is a serialized 2*(ny-2)-step recurrence — measure both pipelines at the
representative sizes so the gate threshold rests on data, not a FLOP
model.

Run on the TPU box:  python artifacts/tdma2d_timing_probe.py

MEASURED (2026-08-19, v5e, hybrid pipeline with dense low-mode rescue):
    2050²: eigen 2.49 ms, tdma-y 1.65 ms  (1.5×)
    1026²/515²: sub-ms — tunnel noise dominates the marginal estimate;
    the FLOP gate (Mx < 2·mx) stands at these sizes.
Accuracy (f32 vs f64-eigen truth, CPU): plain TDMA loses 3 digits on the
smooth modes (1.3e-3 at 1026², condition ~4w/λx[m]); the hybrid's dense
rescue of cond>256 columns restores eigen class (1.75e-6 ≈ eigen's
1.72e-6).  On-chip compiled-vs-eigen max-rel: 6.8e-7 (515²), 7.8e-7
(1026²) — TPUVAL tdma2d row.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, x, s_pair=(2, 12), tag=""):
    """Marginal in-jit time per call (Δtime/Δcalls between two budgets)."""
    @jax.jit
    def many(x, eps_arr):
        def body(tot, eps):
            out = fn(x * (1 + eps))
            return tot + out[0, 1, 1], 0
        tot, _ = lax.scan(body, jnp.float32(0.0), eps_arr)
        return tot

    meas = {}
    for S in s_pair:
        eps = jnp.linspace(0.0, 1e-5, S).astype(jnp.float32)
        float(many(x, eps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(x, eps))
            best = min(best, time.perf_counter() - t0)
        meas[S] = best
    s1, s2 = s_pair
    ms = (meas[s2] - meas[s1]) / (s2 - s1) * 1e3
    print(f"{tag:28s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.spectral import (make_fft_btilde_solver,
                                                  tdma_y_supported)

    print("devices:", jax.devices(), flush=True)
    for n in (515, 1026, 2050):
        p = PoissonProblem(n, n, 1, 1.0 / (n - 1), 1.0 / (n - 1), 0.0)
        sup = tdma_y_supported(p)
        rng = np.random.default_rng(n)
        bt = np.zeros((1, n, n), np.float32)
        bt[:, 1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2),
                                                ).astype(np.float32)
        bt = jnp.asarray(bt)
        eig = make_fft_btilde_solver(p)
        timed(eig, bt, tag=f"{n}^2 eigen")
        if sup:
            td = make_fft_btilde_solver(p, z_mode="tdma")
            timed(td, bt, tag=f"{n}^2 tdma-y")
        else:
            print(f"{n}^2 tdma-y unsupported", flush=True)


if __name__ == "__main__":
    main()
