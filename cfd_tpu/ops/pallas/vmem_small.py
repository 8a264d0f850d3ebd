"""VMEM-resident whole-solve Poisson kernels for small 2D grids.

The reference publishes its Poisson baselines at 100×100
(`docs/reference/solvers.md:231-238`: Red-Black SOR ~2000 it / 8 ms).  Grids
that small are pure launch-latency on an accelerator if each sweep is its
own device computation — a 100² plane is 40 KB, against 128 MiB of VMEM.

The TPU-native answer: put the ENTIRE solve inside one Pallas kernel.  The
iterate and rhs live in VMEM for the whole solve; the convergence loop is a
`lax.while_loop` over scalars inside the kernel; each iteration is a pure
VPU sweep with zero HBM traffic and zero launch overhead.  One kernel call
= one complete solve (iterate → Neumann mirror → ∞-norm residual at
check intervals), returning the final iterate plus (initial_res, final_res,
iterations, converged) scalars.

Semantics are bit-identical to `stationary.make_redblack_sor` +
`_common_while` (same masked two-color update, same post-sweep Neumann
corner ownership, same check_interval chunking and status rules —
`linear_solver.c:397-485`); consistency is enforced by
tests/math/test_vmem_small.py.

Arrays are padded to the (8, 128) f32 tile; masks are rebuilt from iota
against the TRUE dims so padded lanes never update, never contribute to
residuals, and are sliced away by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rolling import shift_x, shift_y

# Working set: out (iterate), rhs, plus ~4 full-plane temporaries during a
# sweep. Keep well under the 128 MiB v5e VMEM.
_VMEM_SOLVE_BUDGET = 24 * 1024 * 1024


def _padded_dims(ny: int, nx: int):
    py = ((ny + 7) // 8) * 8
    px = ((nx + 127) // 128) * 128
    return py, px


def vmem_solve_supported(nz: int, ny: int, nx: int, itemsize: int = 4) -> bool:
    """2D only; the padded plane (×6 copies of headroom) must fit VMEM."""
    if nz != 1:
        return False
    py, px = _padded_dims(ny, nx)
    return 6 * py * px * itemsize <= _VMEM_SOLVE_BUDGET


def _plane_helpers(ny, nx, py, px, inv_dx2, inv_dy2, dtype):
    """Shared in-kernel building blocks over the padded (py, px) plane."""
    jj = lax.broadcasted_iota(jnp.int32, (py, px), 0)
    ii = lax.broadcasted_iota(jnp.int32, (py, px), 1)
    interior = (jj > 0) & (jj < ny - 1) & (ii > 0) & (ii < nx - 1)
    zero = jnp.zeros((), dtype)

    def laplacian(p):
        return ((shift_x(p, 1) - 2.0 * p + shift_x(p, -1)) * inv_dx2
                + (shift_y(p, 1, py) - 2.0 * p
                   + shift_y(p, -1, py)) * inv_dy2)

    def mirror(p):
        p = jnp.where(ii == 0, shift_x(p, 1), p)
        p = jnp.where(ii == nx - 1, shift_x(p, -1), p)
        p = jnp.where(jj == 0, shift_y(p, 1, py), p)
        p = jnp.where(jj == ny - 1, shift_y(p, -1, py), p)
        return p

    def zero_boundary(p):
        return jnp.where(interior, p, zero)

    def dot(a, b):
        return jnp.sum(jnp.where(interior, a * b, zero))

    return jj, ii, interior, zero, laplacian, mirror, zero_boundary, dot


def make_rbsor_vmem_solve(ny: int, nx: int,
                          inv_dx2: float, inv_dy2: float, inv_factor: float,
                          omega: float, tolerance: float, abs_tol: float,
                          max_iterations: int, check_interval: int,
                          dtype=jnp.float32, interpret: bool = False):
    """Whole Red-Black-SOR solve in one kernel.

    Returns fn(x, rhs) -> (x_new, initial_res, final_res, iterations,
    converged) with x, rhs shaped (1, ny, nx), or None if unsupported.
    """
    if not vmem_solve_supported(1, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    py, px = _padded_dims(ny, nx)
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        jj = lax.broadcasted_iota(jnp.int32, (py, px), 0)
        ii = lax.broadcasted_iota(jnp.int32, (py, px), 1)
        interior = (jj > 0) & (jj < ny - 1) & (ii > 0) & (ii < nx - 1)
        red = jnp.bitwise_and(ii + jj, 1) == 0
        zero = jnp.zeros((), dtype)

        rhsv = rhs_ref[:, :]

        def neighbors(p):
            return ((shift_x(p, 1) + shift_x(p, -1)) * inv_dx2
                    + (shift_y(p, 1, py) + shift_y(p, -1, py)) * inv_dy2)

        def half(p, mask):
            gs = -(rhsv - neighbors(p)) * inv_factor
            return jnp.where(mask & interior, p + omega * (gs - p), p)

        def mirror(p):
            # apply_neumann_scalar order: x-columns first, then y-rows
            # (y-rows own the corners) — `linear_solver.c:361-392`.
            p = jnp.where(ii == 0, shift_x(p, 1), p)
            p = jnp.where(ii == nx - 1, shift_x(p, -1), p)
            p = jnp.where(jj == 0, shift_y(p, 1, py), p)
            p = jnp.where(jj == ny - 1, shift_y(p, -1, py), p)
            return p

        def residual(p):
            lap = ((shift_x(p, 1) - 2.0 * p + shift_x(p, -1)) * inv_dx2
                   + (shift_y(p, 1, py) - 2.0 * p
                      + shift_y(p, -1, py)) * inv_dy2)
            return jnp.max(jnp.where(interior, jnp.abs(lap - rhsv), zero))

        out_ref[:, :] = x_ref[:, :]
        r0 = residual(out_ref[:, :])
        tol = jnp.maximum(jnp.asarray(tolerance, dtype) * r0,
                          jnp.asarray(abs_tol, dtype))
        already = r0 < jnp.asarray(abs_tol, dtype)

        def cond(carry):
            it, _, converged = carry
            return (it < max_iter) & (~converged)

        def body(carry):
            it, _, _ = carry
            n_sweeps = jnp.minimum(jnp.int32(ci), max_iter - it)

            def one(_, token):
                p = out_ref[:, :]
                p = half(p, red)
                p = half(p, ~red)
                out_ref[:, :] = mirror(p)
                return token

            lax.fori_loop(0, n_sweeps, one, jnp.int32(0))
            res = residual(out_ref[:, :])
            return (it + n_sweeps, res,
                    (res < tol) | (res < jnp.asarray(abs_tol, dtype)))

        it_f, res_f, conv_f = lax.while_loop(
            cond, body, (jnp.int32(0), r0, already))

        stats_ref[0, 0] = r0
        stats_ref[0, 1] = jnp.where(already, r0, res_f)
        stats_ref[0, 2] = jnp.where(already, zero, it_f.astype(dtype))
        stats_ref[0, 3] = (conv_f | already).astype(dtype)

    call = pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((py, px), dtype),
                   jax.ShapeDtypeStruct((1, 4), dtype)],
        interpret=interpret,
    )

    def solve(x, rhs):
        xp = jnp.pad(x[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        rp = jnp.pad(rhs[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        out, stats = call(xp, rp)
        x_new = out[:ny, :nx][None]
        return (x_new, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve


BREAKDOWN = 1e-30  # matches krylov.BREAKDOWN


def make_cg_vmem_solve(ny: int, nx: int,
                       inv_dx2: float, inv_dy2: float, scale: float,
                       tolerance: float, abs_tol: float,
                       max_iterations: int, check_interval: int,
                       dtype=jnp.float32, interpret: bool = False):
    """Whole CG/PCG solve in one kernel (2D small grids).

    Same recursion, breakdown and status semantics as `krylov.make_cg`
    (`linear_solver_cg.c:290-460`); the constant-diagonal Jacobi
    preconditioner enters as the scalar ``scale`` exactly as in
    `make_cg_fused`.  Returns fn(x, rhs) -> (x, r0, res, iters, running)
    or None when unsupported.
    """
    if not vmem_solve_supported(1, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    py, px = _padded_dims(ny, nx)
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        (_, _, interior, zero, laplacian, mirror, zero_boundary,
         dot) = _plane_helpers(ny, nx, py, px, inv_dx2, inv_dy2, dtype)
        rhsv = rhs_ref[:, :]

        def A(p):
            return zero_boundary(-laplacian(p))

        x = mirror(x_ref[:, :])
        r = zero_boundary(laplacian(x) - rhsv)
        rr0 = dot(r, r)
        rho0 = jnp.asarray(scale, dtype) * rr0
        initial_res = jnp.sqrt(rr0)
        tol = jnp.maximum(jnp.asarray(tolerance, dtype) * initial_res,
                          jnp.asarray(abs_tol, dtype))
        already = initial_res < jnp.asarray(abs_tol, dtype)
        p0 = jnp.where(interior, jnp.asarray(scale, dtype) * r, zero)

        def cond(c):
            return c[6] & (c[4] < max_iter)

        def body(c):
            x, r, p, rho, it, res, _ = c
            Ap = A(p)
            pAp = dot(p, Ap)
            bd1 = jnp.abs(pAp) < BREAKDOWN
            alpha = rho / jnp.where(bd1, 1.0, pAp)
            x = jnp.where(bd1, x, x + alpha * p)
            r = jnp.where(bd1, r, r - alpha * Ap)
            rr = dot(r, r)
            rho_new = jnp.asarray(scale, dtype) * rr
            res_new = jnp.sqrt(rr)
            check = (it % ci) == 0
            converged = check & ((res_new < tol)
                                 | (res_new < jnp.asarray(abs_tol, dtype)))
            bd2 = jnp.abs(rho) < BREAKDOWN
            beta = rho_new / jnp.where(bd2, 1.0, rho)
            z = jnp.asarray(scale, dtype) * r
            p = jnp.where(converged | bd1 | bd2, p, z + beta * p)
            stop = converged | bd1 | bd2
            return (x, r, p, rho_new, it + 1,
                    jnp.where(bd1, res, res_new), ~stop)

        x_f, _, _, _, it_f, res_f, running_f = lax.while_loop(
            cond, body, (x, r, p0, rho0, jnp.int32(0), initial_res,
                         ~already))

        out_ref[:, :] = mirror(x_f)
        stats_ref[0, 0] = initial_res
        stats_ref[0, 1] = jnp.where(already, initial_res, res_f)
        stats_ref[0, 2] = jnp.where(already, jnp.zeros((), dtype),
                                    it_f.astype(dtype))
        stats_ref[0, 3] = running_f.astype(dtype)

    call = pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((py, px), dtype),
                   jax.ShapeDtypeStruct((1, 4), dtype)],
        interpret=interpret,
    )

    def solve(x, rhs):
        xp = jnp.pad(x[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        rp = jnp.pad(rhs[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        out, stats = call(xp, rp)
        return (out[:ny, :nx][None], stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve


def make_bicgstab_vmem_solve(ny: int, nx: int,
                             inv_dx2: float, inv_dy2: float,
                             tolerance: float, abs_tol: float,
                             max_iterations: int, check_interval: int,
                             dtype=jnp.float32, interpret: bool = False):
    """Whole BiCGSTAB solve in one kernel (2D small grids).

    Same recursion, early s-exit, breakdown and status semantics as
    `krylov.make_bicgstab` (`linear_solver_bicgstab.c:303-500`).
    Returns fn(x, rhs) -> (x, r0, res, iters, running, stagnated) or None.
    """
    if not vmem_solve_supported(1, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    py, px = _padded_dims(ny, nx)
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        (_, _, interior, zero, laplacian, mirror, zero_boundary,
         dot) = _plane_helpers(ny, nx, py, px, inv_dx2, inv_dy2, dtype)
        rhsv = rhs_ref[:, :]
        one = jnp.ones((), dtype)

        def A(p):
            return zero_boundary(-laplacian(p))

        x = mirror(x_ref[:, :])
        r = zero_boundary(laplacian(x) - rhsv)
        r_hat = r
        v0 = jnp.where(interior, zero, zero)
        p0 = v0
        rr0 = dot(r, r)
        initial_res = jnp.sqrt(rr0)
        tol = jnp.maximum(jnp.asarray(tolerance, dtype) * initial_res,
                          jnp.asarray(abs_tol, dtype))
        abs_t = jnp.asarray(abs_tol, dtype)
        already = initial_res < abs_t

        def cond(c):
            return c[9] & (c[7] < max_iter)

        def body(c):
            x, r, p, v, rho, alpha, omega, it, res, _, _ = c
            rho_new = dot(r_hat, r)
            bd1 = jnp.abs(rho_new) < BREAKDOWN
            beta = (rho_new / jnp.where(bd1, 1.0, rho)) \
                * (alpha / jnp.where(jnp.abs(omega) < BREAKDOWN, one, omega))
            p_new = r + beta * (p - omega * v)
            v_new = A(p_new)
            rhv = dot(r_hat, v_new)
            bd2 = jnp.abs(rhv) < BREAKDOWN
            alpha_new = rho_new / jnp.where(bd2, 1.0, rhv)
            s = r - alpha_new * v_new
            s_norm = jnp.sqrt(dot(s, s))
            early = (s_norm < tol) | (s_norm < abs_t)

            t = A(s)
            tds = dot(t, s)
            tdt = dot(t, t)
            bd3 = jnp.abs(tdt) < BREAKDOWN
            omega_new = tds / jnp.where(bd3, 1.0, tdt)

            x_full = x + alpha_new * p_new + omega_new * s
            r_full = s - omega_new * t
            res_full = jnp.sqrt(dot(r_full, r_full))
            x_early = x + alpha_new * p_new

            bd = bd1 | bd2
            x_next = jnp.where(bd, x,
                               jnp.where(early | bd3, x_early, x_full))
            r_next = jnp.where(bd | early | bd3, r, r_full)
            res_next = jnp.where(bd, res,
                                 jnp.where(early | bd3, s_norm, res_full))

            check = (it % ci) == 0
            converged = early | (check & ((res_full < tol)
                                          | (res_full < abs_t)))
            bd4 = jnp.abs(omega_new) < BREAKDOWN
            stop = bd | bd3 | converged | (bd4 & ~converged)
            stagnated = bd | bd3 | (bd4 & ~converged)
            return (x_next, r_next, p_new, v_new, rho_new, alpha_new,
                    omega_new, it + 1, res_next, ~stop, stagnated)

        init = (x, r, p0, v0, one, one, one, jnp.int32(0), initial_res,
                ~already, already & False)
        (x_f, _, _, _, _, _, _, it_f, res_f, _, stagnated_f) = \
            lax.while_loop(cond, body, init)

        out_ref[:, :] = mirror(x_f)
        stats_ref[0, 0] = initial_res
        stats_ref[0, 1] = jnp.where(already, initial_res, res_f)
        stats_ref[0, 2] = jnp.where(already, jnp.zeros((), dtype),
                                    it_f.astype(dtype))
        stats_ref[0, 3] = stagnated_f.astype(dtype)

    call = pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((py, px), dtype),
                   jax.ShapeDtypeStruct((1, 4), dtype)],
        interpret=interpret,
    )

    def solve(x, rhs):
        xp = jnp.pad(x[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        rp = jnp.pad(rhs[0].astype(dtype), ((0, py - ny), (0, px - nx)))
        out, stats = call(xp, rp)
        return (out[:ny, :nx][None], stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve
