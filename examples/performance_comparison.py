"""Throughput comparison in cell-updates/second (port of
examples/performance_comparison.c and runtime_comparison.c).

The reference prints MLUPS per solver/backend; here the axis is
solver × grid size on whatever platform JAX runs on.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method, PoissonParams
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

STEPS = 20


def measure(step, field, dt):
    @jax.jit
    def multi(f):
        def body(i, f):
            f2, _ = step(f, dt, i)
            return f2
        f = lax.fori_loop(0, STEPS, body, f)
        return jnp.sum(f.u[0, 0])

    float(multi(field))  # compile
    t0 = time.perf_counter()
    float(multi(field))
    return time.perf_counter() - t0


print(f"platform: {jax.default_backend()}")
print(f"{'solver':>12} {'grid':>12} {'ms/step':>9} {'MLUPS':>8}")
for n in (64, 128):
    grid = Grid.uniform(n, n)
    field = FlowField.initialize(grid)
    cells = n * n
    for name, maker in (
            ("euler", make_euler_step),
            ("rk2", make_rk2_step),
            ("rk4", make_rk4_step),
            ("projection", lambda g, p: make_projection_step(
                g, p, poisson_params=PoissonParams(max_iterations=50,
                                                   tolerance=1e-4))),
            ("proj_fft", lambda g, p: make_projection_step(
                g, p, poisson_method=Method.FFT_DIRECT))):
        params = NSParams(mu=0.01)
        step = maker(grid, params)
        t = measure(step, field, 1e-4)
        mlups = cells * STEPS / t / 1e6
        print(f"{name:>12} {f'{n}x{n}':>12} {t / STEPS * 1e3:>9.2f} "
              f"{mlups:>8.1f}")
