"""Benchmark: Chorin projection step throughput in MLUPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Protocol
--------
* Largest 3D grid that fits on the chip (tries 512³ → 384³ → 256³ → 192³),
  float32, Taylor-Green-like initial condition.
* One full projection step = Pallas predictor + divergence + **exact**
  spectral pressure solve (DST-I on the MXU, `Method.FFT_DIRECT` — per-step
  relative pressure residual ~2e-6, tighter than any iterative setting the
  reference benchmarks with) + corrector + boundary handling + the per-step
  finite/max diagnostics.
* MLUPS = cells × steps / seconds (the reference repo's own
  cell-updates-per-second metric, `examples/performance_comparison.c:61`).

Baseline
--------
The reference publishes projection_optimized (CPU SIMD) at 5.3 ms / 50 steps
on 100×50 ⇒ 47 MLUPS (`docs/reference/solvers.md:353-361`), and its CUDA
backend at 12.1× SIMD on large grids (`solvers.md:376-379`) ⇒ ≈570 MLUPS.
vs_baseline is measured against that strongest reference configuration
(GPU at scale): vs_baseline = MLUPS / 569.
"""

from __future__ import annotations

import json
import time

REFERENCE_BASELINE_MLUPS = 569.0  # reference CUDA projection at scale
TIMED_STEPS = 5


def build(n: int):
    import jax.numpy as jnp

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method

    grid = Grid.uniform(n, n, n, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      mu=0.01)
    step = make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT,
        use_pallas=True)  # Pallas predictor/btilde/corrector kernels

    # Taylor-Green-style init built directly on device in f32 (avoids a
    # multi-GB float64 host detour at 512³).
    x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    X = x[None, None, :]
    Y = x[None, :, None]
    Z = x[:, None, None]
    two_pi = 2.0 * jnp.pi
    u = jnp.sin(two_pi * X) * jnp.cos(two_pi * Y) * jnp.cos(two_pi * Z)
    v = -jnp.cos(two_pi * X) * jnp.sin(two_pi * Y) * jnp.cos(two_pi * Z)
    shape = (n, n, n)
    field = FlowField(
        u=jnp.broadcast_to(u, shape),
        v=jnp.broadcast_to(v, shape),
        w=jnp.zeros(shape, jnp.float32),
        p=jnp.ones(shape, jnp.float32),
        rho=jnp.ones(shape, jnp.float32),
        T=jnp.full(shape, 300.0, jnp.float32))
    return step, field


def run_size(n: int) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    step, field = build(n)
    dt = 1e-4

    @jax.jit
    def multi(f):
        def body(i, f):
            f2, _ = step(f, dt, i)
            return f2
        f = lax.fori_loop(0, TIMED_STEPS, body, f)
        # Tiny scalar fetch forces device completion (plain block_until_ready
        # can return early over remote-tunnel transports).
        return jnp.sum(f.u[0, 0])

    float(multi(field))  # compile + warmup
    t0 = time.perf_counter()
    float(multi(field))
    elapsed = time.perf_counter() - t0
    cells = float(n) ** 3
    return cells * TIMED_STEPS / elapsed / 1e6


def main():
    last_err = None
    for n in (512, 384, 256, 192, 128):
        try:
            mlups = run_size(n)
        except Exception as e:  # OOM or compile failure: try smaller
            last_err = e
            continue
        print(json.dumps({
            "metric": "projection_step_mlups",
            "value": round(mlups, 1),
            "unit": "MLUPS",
            "vs_baseline": round(mlups / REFERENCE_BASELINE_MLUPS, 3),
            "grid": f"{n}x{n}x{n}",
            "pressure_solver": "fft_direct(exact)",
            "dtype": "float32",
        }))
        return
    raise SystemExit(f"bench failed at all sizes: {last_err}")


if __name__ == "__main__":
    main()
