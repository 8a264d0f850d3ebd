"""Direct spectral Poisson solver: DST-I diagonalization on the MXU.

TPU-native extension beyond the reference's iterative suite
(`cpu/linear_solver.c` offers Jacobi/RB/SOR/CG/BiCGSTAB only): on a uniform
grid the 5/7-point Laplacian restricted to the Dirichlet-0 correction space
(exactly the operator the reference's CG iterates on,
`linear_solver_cg.c:103-123`) is diagonalized by the type-I discrete sine
transform.  The solve is therefore **direct and exact** (to roundoff):

    x ← neumann_bc(x)                       (same as CG pre-step, `:320`)
    r = (∇²x − rhs)|interior                 (the CG initial residual)
    ê = DST(r) / λ ;  e = DST⁻¹(ê)           (λ the Dirichlet eigenvalues)
    x ← neumann_bc(x + e)                    (same as CG post-step, `:447`)

which lands on the *same fixed point* CG converges to — one shot instead of
O(N) iterations, so it replaces a 30-iteration CG at 512³ at ~15× lower cost.

The DST-I itself is implemented as dense sine-matrix contractions
(``einsum`` → MXU matmuls) rather than FFTs: at m≈510 each transform is a
(m×m)·(m×m·m) matmul — exactly the shape the systolic array is built for —
and avoids the odd-extension padding + complex arithmetic a radix-FFT DST
needs.  Cost at 512³: 6 passes ≈ 0.8 TFLOP ≈ a handful of ms on one v5e
chip, vs ~450 ms for 30 fused-CG iterations.

Requires a uniform grid (``PoissonProblem`` carries scalar spacings, so any
constructible problem qualifies) and ≥3 points per active axis.  The sine
matrices are built in float64 on the host and cast once; contractions run at
``Precision.HIGHEST`` so float32 solves stay near 1e-6 relative accuracy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import (PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStatus)


def _sine_matrix(m: int, dtype) -> jnp.ndarray:
    """Unnormalized DST-I matrix S[a, b] = sin(π(a+1)(b+1)/(m+1)).

    S is symmetric and S·S = ((m+1)/2)·I, so the inverse transform is S
    scaled by 2/(m+1).
    """
    a = np.arange(1, m + 1, dtype=np.float64)
    S = np.sin(np.pi * np.outer(a, a) / (m + 1))
    return jnp.asarray(S, dtype)


def _dirichlet_eigenvalues(m: int, inv_d2: float) -> np.ndarray:
    """Eigenvalues of −d²/dx² (3-point, Dirichlet-0) on m interior points."""
    i = np.arange(1, m + 1, dtype=np.float64)
    return 4.0 * inv_d2 * np.sin(np.pi * i / (2.0 * (m + 1))) ** 2


def spectral_supported(problem: PoissonProblem) -> bool:
    """2D (nz==1) or genuine 3D (nz≥3 with dz>0)."""
    return problem.nz == 1 or (problem.nz >= 3 and problem.dz > 0.0)


def make_fft_direct(problem: PoissonProblem, params: PoissonParams,
                    dtype=None):
    """Build the direct solve: (x0, rhs) → PoissonResult (always 1 "iteration").

    Drop-in replacement for :func:`make_cg`'s return — same signature, same
    fixed point, ``status == CONVERGED`` with the true final residual.
    """
    if not spectral_supported(problem):
        raise ValueError("spectral solver needs nz==1 or (nz>=3, dz>0)")
    is_3d = problem.is_3d
    mx, my = problem.nx - 2, problem.ny - 2
    mz = problem.nz - 2 if is_3d else 1

    # 1D eigenvalue vectors only — the full 3D λ array is formed inside the
    # trace (broadcast add fuses into the divide; a materialized mx·my·mz
    # constant would bloat the HLO by the size of the grid).
    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lz = (_dirichlet_eigenvalues(mz, problem.inv_dz2) if is_3d
          else np.zeros(1))
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1))
    if is_3d:
        scale *= 2.0 / (mz + 1)

    def build(dt):
        Sx = _sine_matrix(mx, dt)
        Sy = _sine_matrix(my, dt)
        Sz = _sine_matrix(mz, dt) if is_3d else None
        # λ > 0 always (Dirichlet); divide in f64-built f32 vectors.
        vx = jnp.asarray(lx, dt)
        vy = jnp.asarray(ly, dt)
        vz = jnp.asarray(lz, dt)
        sc = jnp.asarray(scale, dt)
        prec = lax.Precision.HIGHEST

        def spectral_divide(a):
            lam = (vz[:, None, None] + vy[None, :, None] + vx[None, None, :])
            return a / lam

        def dst3(a):
            a = jnp.einsum("ax,zyx->zya", Sx, a, precision=prec)
            a = jnp.einsum("by,zyx->zbx", Sy, a, precision=prec)
            if is_3d:
                a = jnp.einsum("cz,zyx->cyx", Sz, a, precision=prec)
            return a

        return Sx, dst3, spectral_divide, sc

    built = {}

    def solve(x, rhs):
        dt = x.dtype
        if dt not in built:
            built[dt] = build(dt)
        _, dst3, spectral_divide, sc = built[dt]

        x = problem.neumann_bc(x)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        initial_res = jnp.sqrt(problem.dot_interior(r, r))

        e = dst3(spectral_divide(dst3(problem.interior(r)))) * sc
        if is_3d:
            x = x.at[1:-1, 1:-1, 1:-1].add(e)
        else:
            x = x.at[:, 1:-1, 1:-1].add(e)
        # True residual of the Dirichlet-0 system, measured like CG's
        # recursion residual: before the final Neumann mirror.
        r_f = problem.zero_boundary(problem.laplacian(x) - rhs)
        final_res = jnp.sqrt(problem.dot_interior(r_f, r_f))
        x = problem.neumann_bc(x)
        return PoissonResult(x=x, iterations=jnp.int32(1),
                             initial_residual=initial_res,
                             final_residual=final_res,
                             status=jnp.int32(PoissonStatus.CONVERGED))

    return jax.jit(solve)
