"""Stationary iterative Poisson solvers: Jacobi, Red-Black SOR, SOR.

Each method becomes one jitted function whose sweep + BC application +
residual check run inside a single ``lax.while_loop`` — the whole solve is
one XLA computation with no host round-trips (the TPU answer to the
reference's per-iteration host loop in `linear_solver.c:443-473`).

Method notes
------------
* **Jacobi** (`cpu/linear_solver_jacobi.c:76-129`): double-buffered full
  sweep.  Vectorizes trivially.
* **Red-Black SOR** (`cpu/linear_solver_redblack.c:80-147`): two masked
  half-sweeps over the (i+j+k) checkerboard.  The two colors are exactly the
  reference's sweeps, so convergence behavior matches.
* **SOR (sequential Gauss-Seidel)** (`cpu/linear_solver_sor.c:80-130`): the
  row-major data dependence is re-expressed exactly as a first-order linear
  recurrence per row — ``x[i] = a·x[i-1] + c[i]`` — solved with
  ``lax.associative_scan`` (log-depth), with rows and planes advanced by
  ``lax.scan`` in the same order as the C loops.  This is *bit-for-bit the
  same method* (same update order ⇒ same fixed point and same iteration
  count), not the blocked approximation the reference's AVX2 backend uses
  (`docs/technical-notes/block-sor-simd.md`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import PoissonParams, PoissonProblem, PoissonResult, PoissonStatus


def _common_while(problem: PoissonProblem, params: PoissonParams, sweep, x, rhs):
    """The reference's common solve loop (`linear_solver.c:397-485`) as a
    lax.while_loop: iterate, apply Neumann BCs, check ∞-norm residual at
    check intervals."""
    initial_res = problem.residual_inf(x, rhs)
    tol = problem.tolerance_for(params, initial_res)
    abs_tol = params.absolute_tolerance
    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)

    already = initial_res < abs_tol

    def cond(carry):
        _, it, _, converged = carry
        return (it < max_iter) & (~converged)

    def body(carry):
        x, it, res, _ = carry
        # check_interval sweeps per residual evaluation: the ∞-norm sweep is
        # as expensive as an iteration, and the reference's interval exists
        # to skip that cost (`poisson_solver.h:105`), not just the decision.
        n_sweeps = jnp.minimum(jnp.int32(ci), max_iter - it)

        def one(i, x):
            return problem.neumann_bc(sweep(x, rhs))

        x = lax.fori_loop(0, n_sweeps, one, x)
        res = problem.residual_inf(x, rhs)
        converged = (res < tol) | (res < abs_tol)
        return (x, it + n_sweeps, res, converged)

    x_f, it_f, res_f, conv_f = lax.while_loop(
        cond, body, (x, jnp.int32(0), initial_res, already))

    iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
    status = jnp.where(conv_f | already,
                       jnp.int32(PoissonStatus.CONVERGED),
                       jnp.int32(PoissonStatus.MAX_ITER))
    return PoissonResult(x=x_f, iterations=iterations,
                         initial_residual=initial_res,
                         final_residual=jnp.where(already, initial_res, res_f),
                         status=status)


# ---------------------------------------------------------------------------
# Jacobi
# ---------------------------------------------------------------------------


def make_jacobi(problem: PoissonProblem, params: PoissonParams):
    inv_dx2, inv_dy2 = problem.inv_dx2, problem.inv_dy2
    inv_dz2, inv_factor = problem.inv_dz2, problem.inv_factor

    def sweep(x, rhs):
        nb = ((jnp.roll(x, -1, -1) + jnp.roll(x, 1, -1)) * inv_dx2
              + (jnp.roll(x, -1, -2) + jnp.roll(x, 1, -2)) * inv_dy2)
        if problem.nz > 1:
            nb = nb + (jnp.roll(x, -1, -3) + jnp.roll(x, 1, -3)) * inv_dz2
        x_new = -(rhs - nb) * inv_factor
        return problem.set_interior(x, x_new)

    def solve(x, rhs):
        return _common_while(problem, params, sweep, x, rhs)

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# Red-Black SOR
# ---------------------------------------------------------------------------


def _checkerboard(problem: PoissonProblem, parity: int):
    """Interior mask of cells with (i+j+k) % 2 == parity."""
    nz, ny, nx = problem.shape
    k = np.arange(nz)[:, None, None] if nz > 1 else np.zeros((1, 1, 1), int)
    j = np.arange(ny)[None, :, None]
    i = np.arange(nx)[None, None, :]
    color = ((i + j + k) % 2) == parity
    interior = np.zeros((nz, ny, nx), bool)
    if nz > 1:
        interior[1:-1, 1:-1, 1:-1] = True
    else:
        interior[:, 1:-1, 1:-1] = True
    # numpy on purpose: converted at trace time by the consuming jnp ops.
    # A jnp constant created here would be a *tracer* when the maker runs
    # inside an enclosing trace (e.g. a differentiable step built under
    # jax.jit(jax.grad(...))) and leak across scan re-staging.
    return color & interior


def make_redblack_sor_fused(problem: PoissonProblem, params: PoissonParams,
                            dtype=jnp.float32, interpret: bool = False):
    """Red-Black SOR on the fused single-pass Pallas sweep kernel.

    One kernel call = red half + black half + Neumann mirror + ∞-norm
    residual of the result — 3 HBM sweeps total instead of the jnp path's
    ~8 roll-based sweeps, with the residual free every iteration (the
    reference pays a separate sweep for it, `linear_solver.c:304-346`).
    Same update order and fixed point as :func:`make_redblack_sor`.
    Returns None when the kernel doesn't support the shape.
    """
    from ...ops.pallas.rbsor_kernels import make_rbsor_sweep

    nz, ny, nx = problem.shape
    omega = problem.resolve_omega(params.omega)
    sweep = make_rbsor_sweep(nz, ny, nx, problem.inv_dx2, problem.inv_dy2,
                             problem.inv_dz2, problem.inv_factor, omega,
                             dtype, interpret)
    if sweep is None:
        return None

    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance

    def solve(x, rhs):
        initial_res = problem.residual_inf(x, rhs)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        def cond(carry):
            _, it, _, converged = carry
            return (it < max_iter) & (~converged)

        def body(carry):
            x, it, res, _ = carry
            n_sweeps = jnp.minimum(jnp.int32(ci), max_iter - it)

            def one(i, c):
                x, _ = c
                return sweep(x, rhs)

            x, res = lax.fori_loop(0, n_sweeps, one, (x, res))
            converged = (res < tol) | (res < abs_tol)
            return (x, it + n_sweeps, res, converged)

        x_f, it_f, res_f, conv_f = lax.while_loop(
            cond, body, (x, jnp.int32(0), initial_res, already))

        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        status = jnp.where(conv_f | already,
                           jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return solve


def make_jacobi_vmem(problem: PoissonProblem, params: PoissonParams,
                     dtype=jnp.float32, interpret: bool = False):
    """Whole-solve VMEM-resident Jacobi for small grids (2D + 3D);
    same double-buffered sweep, Neumann mirror, and status rules as
    :func:`make_jacobi`.  Returns None when unsupported."""
    from ...ops.pallas.vmem_small import make_jacobi_vmem_solve

    nz, ny, nx = problem.shape
    fn = make_jacobi_vmem_solve(
        nz, ny, nx, problem.inv_dx2, problem.inv_dy2, problem.inv_dz2,
        problem.inv_factor,
        params.tolerance, params.absolute_tolerance,
        params.max_iterations, params.check_interval,
        dtype=dtype, interpret=interpret)
    if fn is None:
        return None

    def solve(x, rhs):
        x_new, r0, res_f, iters, converged = fn(x, rhs)
        status = jnp.where(converged,
                           jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_new, iterations=iters,
                             initial_residual=r0, final_residual=res_f,
                             status=status)

    return solve


def make_redblack_sor_vmem(problem: PoissonProblem, params: PoissonParams,
                           dtype=jnp.float32, interpret: bool = False):
    """Whole-solve VMEM-resident Red-Black SOR for small grids (2D + 3D).

    The entire convergence loop runs inside ONE Pallas kernel with the
    iterate held in VMEM — zero HBM traffic and zero launch overhead per
    iteration, which is what the reference's published 100×100 Poisson
    baselines (`docs/reference/solvers.md:231-238`) are latency-bound on.
    Same update order, Neumann mirror, check_interval chunking and status
    rules as :func:`make_redblack_sor`.  Returns None when unsupported.
    """
    from ...ops.pallas.vmem_small import make_rbsor_vmem_solve

    nz, ny, nx = problem.shape
    omega = problem.resolve_omega(params.omega)
    fn = make_rbsor_vmem_solve(
        nz, ny, nx, problem.inv_dx2, problem.inv_dy2, problem.inv_dz2,
        problem.inv_factor,
        omega, params.tolerance, params.absolute_tolerance,
        params.max_iterations, params.check_interval,
        dtype=dtype, interpret=interpret)
    if fn is None:
        return None

    def solve(x, rhs):
        x_new, r0, res_f, iters, converged = fn(x, rhs)
        status = jnp.where(converged,
                           jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_new, iterations=iters,
                             initial_residual=r0, final_residual=res_f,
                             status=status)

    return solve


def make_redblack_sor(problem: PoissonProblem, params: PoissonParams):
    inv_dx2, inv_dy2 = problem.inv_dx2, problem.inv_dy2
    inv_dz2, inv_factor = problem.inv_dz2, problem.inv_factor
    omega = problem.resolve_omega(params.omega)

    def half_sweep(x, rhs, parity):
        # iota mask built in-trace: a captured full-shape numpy constant
        # bloats the compile payload (~135 MB bool at 513³; the remote
        # compile service rejects large requests)
        from ...ops.stencils import checkerboard_mask
        mask = checkerboard_mask(problem.shape, parity)
        nb = ((jnp.roll(x, -1, -1) + jnp.roll(x, 1, -1)) * inv_dx2
              + (jnp.roll(x, -1, -2) + jnp.roll(x, 1, -2)) * inv_dy2)
        if problem.nz > 1:
            nb = nb + (jnp.roll(x, -1, -3) + jnp.roll(x, 1, -3)) * inv_dz2
        gs = -(rhs - nb) * inv_factor
        return jnp.where(mask, x + omega * (gs - x), x)

    def sweep(x, rhs):
        x = half_sweep(x, rhs, 0)
        return half_sweep(x, rhs, 1)

    def solve(x, rhs):
        return _common_while(problem, params, sweep, x, rhs)

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# SOR (sequential Gauss-Seidel order via associative row recurrences)
# ---------------------------------------------------------------------------


def _sor_row_update(x_row, below_new, above_old, rhs_row, z_old_terms,
                    inv_dx2, inv_dy2, inv_factor, omega):
    """One row of row-major SOR as a linear recurrence solved in log depth.

    Row-major update (`linear_solver_sor.c:100-119`):
      gs[i]   = -(rhs[i] - (x_old[i+1] + x_new[i-1])·inv_dx2
                          - (below_new[i] + above_old[i])·inv_dy2
                          - z_terms[i]) · inv_factor
      x_new[i] = (1-ω)·x_old[i] + ω·gs[i]
               = a·x_new[i-1] + c[i],    a = ω·inv_factor·inv_dx2
    with x_new[0] = x_old[0] (boundary, untouched during the sweep).
    """
    n = x_row.shape[-1]
    a = omega * inv_factor * inv_dx2
    x_right = jnp.roll(x_row, -1, axis=-1)  # x_old[i+1]
    c = ((1.0 - omega) * x_row
         + omega * inv_factor * (-rhs_row
                                 + x_right * inv_dx2
                                 + (below_new + above_old) * inv_dy2
                                 + z_old_terms))
    # Fold the fixed left boundary into c[1].
    c = c.at[..., 1].add(a * x_row[..., 0])

    # Solve y[i] = a*y[i-1] + c[i] for i in [1, n-2] via associative scan on
    # pairs (A, B) composing as (A1*A2, A2*B1 + B2).
    seg_c = c[..., 1:n - 1]
    seg_a = jnp.full_like(seg_c, a)
    seg_a = seg_a.at[..., 0].set(0.0)  # y[1] = c'[1] exactly

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, y = lax.associative_scan(combine, (seg_a, seg_c), axis=-1)
    return x_row.at[..., 1:n - 1].set(y)


def make_sor(problem: PoissonProblem, params: PoissonParams):
    inv_dx2, inv_dy2 = problem.inv_dx2, problem.inv_dy2
    inv_dz2, inv_factor = problem.inv_dz2, problem.inv_factor
    omega = problem.resolve_omega(params.omega)
    nz, ny, nx = problem.shape

    def sweep_plane(x_plane, above_rows_old, below_row0, rhs_plane, z_terms):
        """Row-major SOR over one (ny, nx) plane.

        lax.scan over rows j=1..ny-2; carry = previous row's new values.
        ``z_terms`` holds (x_old[k+1] + x_new[k-1])·inv_dz2 per point (zeros
        in 2D).
        """
        def row_step(prev_new_row, inputs):
            x_row, above_row, rhs_row, z_row = inputs
            new_row = _sor_row_update(x_row, prev_new_row, above_row, rhs_row,
                                      z_row, inv_dx2, inv_dy2, inv_factor,
                                      omega)
            return new_row, new_row

        rows = (x_plane[1:-1], above_rows_old, rhs_plane[1:-1], z_terms[1:-1])
        _, new_rows = lax.scan(row_step, below_row0, rows)
        return x_plane.at[1:-1].set(new_rows)

    def sweep(x, rhs):
        if nz == 1:
            plane = x[0]
            zeros = jnp.zeros_like(plane)
            above = plane[2:, :]  # x_old[j+1]
            new_plane = sweep_plane(plane, above, plane[0], rhs[0], zeros)
            return x.at[0].set(new_plane)

        # 3D: sequential planes k=1..nz-2 (row-major outer loop); carry is
        # the previous plane's new values so (i,j,k-1) terms are "new",
        # matching the C loop order.
        def plane_step(prev_plane_new, inputs):
            x_plane, x_above_plane, rhs_plane = inputs
            z_terms = (x_above_plane + prev_plane_new) * inv_dz2
            above_rows = x_plane[2:, :]
            new_plane = sweep_plane(x_plane, above_rows, x_plane[0],
                                    rhs_plane, z_terms)
            return new_plane, new_plane

        planes = (x[1:-1], x[2:], rhs[1:-1])
        _, new_planes = lax.scan(plane_step, x[0], planes)
        return x.at[1:-1].set(new_planes)

    def solve(x, rhs):
        return _common_while(problem, params, sweep, x, rhs)

    return jax.jit(solve)
