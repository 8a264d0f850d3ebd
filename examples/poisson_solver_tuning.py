"""Poisson solver comparison & tuning (port of
examples/poisson_solver_tuning.c).

Solves the same pressure system with every method and reports iterations and
wall time — the TPU edition of the reference's tuning table
(`docs/reference/solvers.md:231-238`).
"""

import numpy as np
import jax.numpy as jnp

from cfd_tpu.solvers.poisson import (Method, PoissonParams, create_solver)

N = 65
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
# Zero-mean interior rhs: the mirrored-Neumann problem the stationary
# methods solve only has a solution when the rhs is compatible (zero sum);
# a raw random rhs sends Jacobi/SOR to MAX_ITER by construction.
raw = rng.normal(size=(1, N, N))
raw[:, 1:-1, 1:-1] -= raw[:, 1:-1, 1:-1].mean()
rhs = jnp.asarray(raw)

print(f"Poisson 2D {N}x{N}, tol 1e-6:")
print(f"{'method':>14} {'iters':>6} {'ms':>8}  status")
for method, params in (
        (Method.JACOBI, PoissonParams(max_iterations=30000,
                                      check_interval=10)),
        (Method.SOR, PoissonParams()),
        (Method.REDBLACK_SOR, PoissonParams()),
        (Method.CG, PoissonParams()),
        (Method.CG, PoissonParams(preconditioner=1)),   # PCG
        (Method.BICGSTAB, PoissonParams()),
        (Method.MULTIGRID, PoissonParams()),            # TPU extension
        (Method.FFT_DIRECT, PoissonParams()),           # TPU extension
):
    s = create_solver(method)
    s.init(N, N, 1, h, h, 0.0, params)
    x0 = jnp.zeros((1, N, N))
    s.solve(x0, rhs)  # warm compile
    x, stats = s.solve(x0, rhs)
    tag = "PCG" if params.preconditioner else s.name
    print(f"{tag:>14} {stats.iterations:>6} {stats.elapsed_time_ms:>8.2f}  "
          f"{stats.status.name}")

# Custom omega comparison for SOR
print("\nSOR omega sweep:")
for omega in (1.0, 1.5, 1.8, 0.0):
    s = create_solver(Method.SOR)
    s.init(N, N, 1, h, h, 0.0, PoissonParams(omega=omega))
    _, stats = s.solve(jnp.zeros((1, N, N)), rhs)
    label = f"{omega}" if omega > 0 else "auto"
    print(f"  omega={label:>5}: {stats.iterations} iterations")
