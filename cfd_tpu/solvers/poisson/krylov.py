"""Krylov Poisson solvers: CG / PCG and BiCGSTAB.

Re-design of `cpu/linear_solver_cg.c` and `cpu/linear_solver_bicgstab.c` as
single jitted ``lax.while_loop``s.  Semantics preserved exactly:

* operator A = −∇² restricted to interior points, with the *correction* space
  held at zero on the boundary (the reference's work vectors are calloc'd and
  only interior entries are ever written — `linear_solver_cg.c:103-123`), so
  the Krylov iteration sees a symmetric positive-definite Dirichlet-0
  operator while the solution x keeps Neumann boundaries;
* Neumann BCs are applied to x only before and after the loop
  (`linear_solver_cg.c:320,447`);
* convergence on the L2 norm of the recursion residual, relative tolerance
  floored by absolute (`linear_solver_cg.c:341-361`);
* breakdown detection at 1e-30 → STAGNATED (`linear_solver_internal.h:73-96`);
* BiCGSTAB's early s-norm exit and omega-breakdown checks
  (`linear_solver_bicgstab.c:260-500`).

Every iteration is one fused XLA computation: the Laplacian apply, the dot
products, and the axpy updates fuse into a few HBM sweeps; on a sharded mesh
the dots become ``psum`` collectives over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .base import (PoissonParams, PoissonProblem, PoissonResult, PoissonStatus,
                   Precond)

BREAKDOWN = 1e-30  # CG_BREAKDOWN_THRESHOLD / BICGSTAB_BREAKDOWN_THRESHOLD


def make_cg(problem: PoissonProblem, params: PoissonParams):
    use_precond = params.preconditioner == Precond.JACOBI
    # Diagonal of -∇²: 2/dx² + 2/dy² + 2/dz² (`linear_solver_cg.c:216`).
    diag_inv = problem.inv_factor
    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance

    def A(p):
        """Ap = -∇²p on the interior, zero on the boundary shell."""
        return problem.zero_boundary(-problem.laplacian(p))

    def precond(r):
        return diag_inv * r if use_precond else r

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        # r₀ = b − A·x₀ = −rhs + ∇²x (on interior; zero shell)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        z = precond(r)
        p = z
        rho = problem.dot_interior(r, z)
        initial_res = jnp.sqrt(problem.dot_interior(r, r))
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        def cond(carry):
            _, _, _, _, it, _, running = carry
            return running & (it < max_iter)

        def body(carry):
            x, r, p, rho, it, res, _ = carry
            Ap = A(p)
            p_dot_Ap = problem.dot_interior(p, Ap)
            breakdown1 = jnp.abs(p_dot_Ap) < BREAKDOWN
            alpha = rho / jnp.where(breakdown1, 1.0, p_dot_Ap)
            x = jnp.where(breakdown1, x, x + alpha * p)
            r = jnp.where(breakdown1, r, r - alpha * Ap)
            z = precond(r)
            rho_new = problem.dot_interior(r, z)
            check = (it % ci) == 0
            if use_precond:
                # ⟨r,r⟩ is a real extra sweep here — honor check_interval
                # (`poisson_solver.h:105`) by computing it only on check
                # iterations.
                res_new = lax.cond(
                    check, lambda: jnp.sqrt(problem.dot_interior(r, r)),
                    lambda: res)
            else:
                # z == r ⇒ ‖r‖ = √rho: the residual is free every iteration.
                res_new = jnp.sqrt(rho_new)
            converged = check & ((res_new < tol) | (res_new < abs_tol))
            breakdown2 = jnp.abs(rho) < BREAKDOWN
            beta = rho_new / jnp.where(breakdown2, 1.0, rho)
            p = jnp.where(converged | breakdown1 | breakdown2, p, z + beta * p)
            stop = converged | breakdown1 | breakdown2
            # Encode "stagnated" by negating the iteration counter sign bit:
            # we carry status via res sign? Cleaner: carry running flag and a
            # stagnated marker in res (kept separate below).
            it = it + 1
            return (x, r, p, rho_new, it,
                    jnp.where(breakdown1, res, res_new), ~stop)

        x_f, r_f, _, _, it_f, res_f, running_f = lax.while_loop(
            cond, body, (x, r, p, rho, jnp.int32(0), initial_res, ~already))

        # Final convergence check (reference does one more after the loop,
        # `linear_solver_cg.c:441-444`).
        converged = (res_f < tol) | (res_f < abs_tol) | already
        x_f = problem.neumann_bc(x_f)
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        stagnated = (~converged) & (it_f < max_iter) & (~running_f)
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res, res_f),
                             status=status)

    return jax.jit(solve)


def make_cg_fused(problem: PoissonProblem, params: PoissonParams,
                  dtype=jnp.float32, interpret: bool = False):
    """CG with the two-pass fused Pallas kernels (float32, 3D grids).

    Mathematically identical to :func:`make_cg` (same PCG recursion, same
    convergence/breakdown semantics; the loop is rotated so the
    search-direction update fuses into the operator pass).  Returns None when
    the kernels don't support the problem shape — callers fall back to the
    jnp path.
    """
    from ...ops.pallas.cg_kernels import (fused_kernels_available,
                                          make_cg_update, make_lap_dot_fused)

    nz, ny, nx = problem.shape
    if not fused_kernels_available(nz, ny, nx):
        return None
    use_precond = params.preconditioner == Precond.JACOBI
    scale = problem.inv_factor if use_precond else 1.0
    # A 2-plane-batched rolling variant was tried and measured at the same
    # 226 GB/s as the per-plane kernel (the limit is concurrent-stream
    # bandwidth, not per-iteration sync), so the simpler kernel stays.
    lap_dot = make_lap_dot_fused(nz, ny, nx, problem.inv_dx2,
                                 problem.inv_dy2, problem.inv_dz2,
                                 scale, dtype, interpret)
    update = make_cg_update(nz, ny, nx, dtype, interpret)
    if lap_dot is None or update is None:
        return None

    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        rr0 = problem.dot_interior(r, r)
        rho = scale * rr0            # ⟨r, M⁻¹r⟩
        initial_res = jnp.sqrt(rr0)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        p0 = jnp.zeros_like(r)

        def cond(carry):
            _, _, _, _, _, it, _, running = carry
            return running & (it < max_iter)

        def body(carry):
            x, r, p, rho, beta, it, res, _ = carry
            p, Ap, pAp = lap_dot(r, p, beta)
            breakdown1 = jnp.abs(pAp) < BREAKDOWN
            alpha = jnp.where(breakdown1, 0.0,
                              rho / jnp.where(breakdown1, 1.0, pAp))
            x, r, rr = update(x, r, p, Ap, alpha)
            rho_new = scale * rr
            res_new = jnp.sqrt(rr)
            check = (it % ci) == 0
            converged = check & ((res_new < tol) | (res_new < abs_tol))
            breakdown2 = jnp.abs(rho) < BREAKDOWN
            beta = rho_new / jnp.where(breakdown2, 1.0, rho)
            stop = converged | breakdown1 | breakdown2
            return (x, r, p, rho_new, beta, it + 1,
                    jnp.where(breakdown1, res, res_new), ~stop)

        (x_f, _, _, _, _, it_f, res_f, running_f) = lax.while_loop(
            cond, body,
            (x, r, p0, rho, jnp.zeros((), x.dtype), jnp.int32(0),
             initial_res, ~already))

        converged = (res_f < tol) | (res_f < abs_tol) | already
        x_f = problem.neumann_bc(x_f)
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        stagnated = (~converged) & (it_f < max_iter) & (~running_f)
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return solve


def make_cg_vmem(problem: PoissonProblem, params: PoissonParams,
                 dtype=jnp.float32, interpret: bool = False):
    """Whole-solve VMEM-resident CG/PCG for small grids (the entire
    while_loop runs inside one Pallas kernel — see
    `ops/pallas/vmem_small.py`).  Same recursion/breakdown/status semantics
    as :func:`make_cg`.  Returns None when unsupported."""
    from ...ops.pallas.vmem_small import make_cg_vmem_solve

    nz, ny, nx = problem.shape
    if params.preconditioner == Precond.MULTIGRID:
        return None
    scale = (problem.inv_factor
             if params.preconditioner == Precond.JACOBI else 1.0)
    fn = make_cg_vmem_solve(nz, ny, nx, problem.inv_dx2, problem.inv_dy2,
                            problem.inv_dz2, scale,
                            params.tolerance, params.absolute_tolerance,
                            params.max_iterations, params.check_interval,
                            dtype=dtype, interpret=interpret)
    if fn is None:
        return None
    abs_tol = params.absolute_tolerance
    max_iter = int(params.max_iterations)

    def solve(x, rhs):
        x_f, initial_res, res_f, it_f, running_f = fn(x, rhs)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        converged = (res_f < tol) | (res_f < abs_tol) | already
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        stagnated = (~converged) & (it_f < max_iter) & (~running_f)
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=res_f, status=status)

    return solve


def make_bicgstab_vmem(problem: PoissonProblem, params: PoissonParams,
                       dtype=jnp.float32, interpret: bool = False):
    """Whole-solve VMEM-resident BiCGSTAB for small grids (2D + 3D).  Same
    recursion, early s-exit, breakdown and status semantics as
    :func:`make_bicgstab`.  Returns None when unsupported."""
    from ...ops.pallas.vmem_small import make_bicgstab_vmem_solve

    nz, ny, nx = problem.shape
    fn = make_bicgstab_vmem_solve(nz, ny, nx, problem.inv_dx2,
                                  problem.inv_dy2, problem.inv_dz2,
                                  params.tolerance,
                                  params.absolute_tolerance,
                                  params.max_iterations,
                                  params.check_interval,
                                  dtype=dtype, interpret=interpret)
    if fn is None:
        return None
    abs_tol = params.absolute_tolerance
    max_iter = int(params.max_iterations)

    def solve(x, rhs):
        x_f, initial_res, res_f, it_f, stagnated_f = fn(x, rhs)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        converged = (res_f < tol) | (res_f < abs_tol) | already
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated_f, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=res_f, status=status)

    return solve


def make_bicgstab_fused(problem: PoissonProblem, params: PoissonParams,
                        dtype=jnp.float32, interpret: bool = False):
    """BiCGSTAB on the three fused Pallas passes (float32, 3D grids).

    Mathematically identical to :func:`make_bicgstab` (same recursion,
    breakdown and early s-exit semantics); the loop is rotated so next
    iteration's ρ = ⟨r̂, r⟩ comes out of the update pass for free, and the
    early-exit / breakdown x-variants are expressed by zeroing the α/ω fed
    to the update pass (x_early = x + α·p' is the ω=0 case —
    `linear_solver_bicgstab.c:398-405`).  Returns None when the kernels
    don't support the problem shape.
    """
    from ...ops.pallas.bicgstab_kernels import (BiCGSTABKernels,
                                                bicgstab_kernels_supported)

    nz, ny, nx = problem.shape
    if nz < 3 or not bicgstab_kernels_supported(nz, ny, nx):
        return None
    k = BiCGSTABKernels(nz, ny, nx, problem.inv_dx2, problem.inv_dy2,
                        problem.inv_dz2, dtype, interpret)
    if not k.ok:
        return None

    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        r_hat = r
        v = jnp.zeros_like(r)
        p = jnp.zeros_like(r)
        rr0 = problem.dot_interior(r, r)
        initial_res = jnp.sqrt(rr0)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        one = jnp.asarray(1.0, x.dtype)

        # carry: x, r, p, v, rho_prev, rho_new(=⟨r̂,r⟩ from pass 3),
        #        alpha, omega, it, res, running, stagnated
        def cond(c):
            return c[10] & (c[8] < max_iter)

        def body(c):
            (x, r, p, v, rho_prev, rho_new, alpha, omega, it, res,
             _, _) = c
            bd1 = jnp.abs(rho_new) < BREAKDOWN
            beta = (rho_new / jnp.where(bd1, 1.0, rho_prev)) \
                * (alpha / jnp.where(jnp.abs(omega) < BREAKDOWN, 1.0, omega))
            p_new, v_new, rhv = k.pass_pv(r, p, v, r_hat, beta, omega)
            bd2 = jnp.abs(rhv) < BREAKDOWN
            alpha_new = rho_new / jnp.where(bd2, 1.0, rhv)
            s, t, ss, ts, tt = k.pass_st(r, v_new, alpha_new)
            s_norm = jnp.sqrt(ss)
            early = (s_norm < tol) | (s_norm < abs_tol)
            bd3 = jnp.abs(tt) < BREAKDOWN
            omega_new = ts / jnp.where(bd3, 1.0, tt)

            bd = bd1 | bd2
            # Breakdown before any progress: x unchanged (α=ω=0).  Early
            # s-exit / t·t-breakdown: x += α·p' only (ω=0) — then the pass's
            # ⟨r',r'⟩ equals ⟨s,s⟩, so √rr reports s_norm exactly as the
            # reference does on those paths.
            alpha_eff = jnp.where(bd, 0.0, alpha_new)
            omega_eff = jnp.where(bd | early | bd3, 0.0, omega_new)
            x, r, rr, rhat_r = k.pass_xr(x, p_new, s, t, r_hat,
                                         alpha_eff, omega_eff)
            res_new = jnp.where(bd, res, jnp.sqrt(rr))

            check = (it % ci) == 0
            converged = early | (check & ((res_new < tol)
                                          | (res_new < abs_tol)))
            bd4 = jnp.abs(omega_new) < BREAKDOWN
            stop = bd | bd3 | converged | (bd4 & ~converged)
            stagnated = bd | bd3 | (bd4 & ~converged)
            return (x, r, p_new, v_new, rho_new, rhat_r, alpha_new,
                    omega_new, it + 1, res_new, ~stop, stagnated)

        init = (x, r, p, v, one, rr0, one, one, jnp.int32(0), initial_res,
                ~already, jnp.asarray(False))
        (x_f, _, _, _, _, _, _, _, it_f, res_f, _, stagnated_f) = \
            lax.while_loop(cond, body, init)

        converged = (res_f < tol) | (res_f < abs_tol) | already
        x_f = problem.neumann_bc(x_f)
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated_f, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return solve


def make_bicgstab(problem: PoissonProblem, params: PoissonParams):
    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance

    def A(p):
        return problem.zero_boundary(-problem.laplacian(p))

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        r_hat = r
        v = jnp.zeros_like(r)
        p = jnp.zeros_like(r)
        initial_res = jnp.sqrt(problem.dot_interior(r, r))
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        # carry: x, r, p, v, rho, alpha, omega, it, res, running, stagnated
        def cond(c):
            return c[9] & (c[7] < max_iter)

        def body(c):
            x, r, p, v, rho, alpha, omega, it, res, _, _ = c
            rho_new = problem.dot_interior(r_hat, r)
            bd1 = jnp.abs(rho_new) < BREAKDOWN

            beta = (rho_new / jnp.where(bd1, 1.0, rho)) \
                * (alpha / jnp.where(jnp.abs(omega) < BREAKDOWN, 1.0, omega))
            p_new = r + beta * (p - omega * v)
            v_new = A(p_new)
            rhv = problem.dot_interior(r_hat, v_new)
            bd2 = jnp.abs(rhv) < BREAKDOWN
            alpha_new = rho_new / jnp.where(bd2, 1.0, rhv)
            s = r - alpha_new * v_new
            s_norm = jnp.sqrt(problem.dot_interior(s, s))
            early = (s_norm < tol) | (s_norm < abs_tol)

            t = A(s)
            tds = problem.dot_interior(t, s)
            tdt = problem.dot_interior(t, t)
            bd3 = jnp.abs(tdt) < BREAKDOWN
            omega_new = tds / jnp.where(bd3, 1.0, tdt)

            # Full update (skipped on early exit / breakdowns)
            x_full = x + alpha_new * p_new + omega_new * s
            r_full = s - omega_new * t
            res_full = jnp.sqrt(problem.dot_interior(r_full, r_full))

            # Early s-convergence: x += alpha·p only
            # (`linear_solver_bicgstab.c:398-405`).
            x_early = x + alpha_new * p_new

            bd = bd1 | bd2
            # breakdown on t·t also updates x with available progress
            x_next = jnp.where(bd, x,
                               jnp.where(early, x_early,
                                         jnp.where(bd3, x_early, x_full)))
            r_next = jnp.where(bd | early | bd3, r, r_full)
            res_next = jnp.where(bd, res,
                                 jnp.where(early, s_norm,
                                           jnp.where(bd3, s_norm, res_full)))

            check = (it % ci) == 0
            converged = early | (check & ((res_full < tol)
                                          | (res_full < abs_tol)))
            bd4 = jnp.abs(omega_new) < BREAKDOWN
            stop = bd | bd3 | converged | (bd4 & ~converged)
            stagnated = (bd | bd3 | (bd4 & ~converged))
            return (x_next, r_next, p_new, v_new, rho_new, alpha_new,
                    omega_new, it + 1, res_next, ~stop, stagnated)

        init = (x, r, p, v, jnp.asarray(1.0, x.dtype), jnp.asarray(1.0, x.dtype),
                jnp.asarray(1.0, x.dtype), jnp.int32(0), initial_res,
                ~already, jnp.asarray(False))
        (x_f, _, _, _, _, _, _, it_f, res_f, _, stagnated_f) = \
            lax.while_loop(cond, body, init)

        converged = (res_f < tol) | (res_f < abs_tol) | already
        x_f = problem.neumann_bc(x_f)
        iterations = jnp.where(already, 0, jnp.minimum(it_f, max_iter))
        status = jnp.where(
            converged, jnp.int32(PoissonStatus.CONVERGED),
            jnp.where(stagnated_f, jnp.int32(PoissonStatus.STAGNATED),
                      jnp.int32(PoissonStatus.MAX_ITER)))
        return PoissonResult(x=x_f, iterations=iterations,
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res, res_f),
                             status=status)

    return jax.jit(solve)
