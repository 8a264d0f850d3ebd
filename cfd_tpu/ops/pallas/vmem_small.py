"""VMEM-resident whole-solve Poisson kernels for small grids (2D and 3D).

The reference publishes its Poisson baselines at 100×100
(`docs/reference/solvers.md:231-238`: Red-Black SOR ~2000 it / 8 ms), and
its 3D validation configs run at 64³-class sizes.  Grids that small are
pure launch-latency on an accelerator if each sweep is its own device
computation — a 100² plane is 40 KB and a 64³ volume ~1 MB, against
128 MiB of VMEM.

The TPU-native answer: put the ENTIRE solve inside one Pallas kernel.  The
iterate and rhs live in VMEM for the whole solve; the convergence loop is a
`lax.while_loop` carried on scalars + register/VMEM-resident arrays; each
iteration is a pure VPU sweep with zero HBM traffic and zero launch
overhead (measured ~0.24 µs per RB-SOR sweep at 100² — the ~30 ms a single
call appears to take over the remote transport is round-trip latency).

Layout: the volume is stored as a (rows, px) array with rows = nz·pny,
where pny pads ny to a POWER OF TWO (≥8) in 3D so the (k, j) row
decomposition is a shift/mask — Mosaic vector integer div/mod is
unreliable, `jj >> log2(pny)` and `jj & (pny-1)` are not.  In 2D pny is
just the 8-aligned ny.  Masks are rebuilt from iota against the TRUE dims,
so padded lanes/rows never update, never contribute to reductions, and are
sliced away by the wrapper.

Semantics match the jnp solvers exactly — `stationary.make_redblack_sor` +
`_common_while` (masked two-color update, post-sweep Neumann mirror with
the reference's x→y→z face order, check_interval chunking, status rules —
`linear_solver.c:397-485`) and `krylov.make_cg`/`make_bicgstab` (Dirichlet-0
correction space, L2 recursion residual, breakdown → STAGNATED, BiCGSTAB's
early s-exit — `linear_solver_cg.c:290-460`, `linear_solver_bicgstab.c:
303-500`).  Consistency is enforced by tests/math/test_vmem_small.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rolling import shift_x, shift_y

# Working set: iterate + rhs + a few full-volume temporaries / Krylov
# vectors.  Keep well under the 128 MiB v5e VMEM.
_VMEM_SOLVE_BUDGET = 24 * 1024 * 1024

BREAKDOWN = 1e-30  # matches krylov.BREAKDOWN


def _pow2_at_least(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


def _padded_dims(nz: int, ny: int, nx: int):
    """(pny, px, rows): padded plane height, padded lane width, total rows."""
    px = ((nx + 127) // 128) * 128
    if nz == 1:
        pny = ((ny + 7) // 8) * 8
    else:
        pny = _pow2_at_least(ny)
    return pny, px, nz * pny


def vmem_solve_supported(nz: int, ny: int, nx: int, itemsize: int = 4) -> bool:
    """nz == 1 or nz >= 3; ~8 copies of the padded volume must fit VMEM."""
    if nz != 1 and nz < 3:
        return False
    pny, px, rows = _padded_dims(nz, ny, nx)
    return 8 * rows * px * itemsize <= _VMEM_SOLVE_BUDGET


def _volume_helpers(nz, ny, nx, inv_dx2, inv_dy2, inv_dz2, dtype):
    """In-kernel building blocks over the padded (rows, px) volume."""
    pny, px, rows = _padded_dims(nz, ny, nx)
    jr = lax.broadcasted_iota(jnp.int32, (rows, px), 0)
    ii = lax.broadcasted_iota(jnp.int32, (rows, px), 1)
    if nz == 1:
        jj, kk = jr, jnp.zeros_like(jr)
        z_active = False
    else:
        shift = pny.bit_length() - 1          # pny is a power of two
        jj = jnp.bitwise_and(jr, pny - 1)
        kk = jnp.right_shift(jr, shift)
        z_active = True
    interior = (jj > 0) & (jj < ny - 1) & (ii > 0) & (ii < nx - 1)
    if z_active:
        interior = interior & (kk > 0) & (kk < nz - 1)
    red = jnp.bitwise_and(ii + jj + kk, 1) == 0
    zero = jnp.zeros((), dtype)

    def neighbors(p):
        nb = ((shift_x(p, 1) + shift_x(p, -1)) * inv_dx2
              + (shift_y(p, 1, rows) + shift_y(p, -1, rows)) * inv_dy2)
        if z_active:
            nb = nb + (shift_y(p, pny, rows)
                       + shift_y(p, -pny, rows)) * inv_dz2
        return nb

    def laplacian(p):
        lap = ((shift_x(p, 1) - 2.0 * p + shift_x(p, -1)) * inv_dx2
               + (shift_y(p, 1, rows) - 2.0 * p
                  + shift_y(p, -1, rows)) * inv_dy2)
        if z_active:
            lap = lap + (shift_y(p, pny, rows) - 2.0 * p
                         + shift_y(p, -pny, rows)) * inv_dz2
        return lap

    def mirror(p):
        # Reference Neumann face order: x columns, then y rows, then z
        # planes (later faces own corners) — `linear_solver.c:361-392` /
        # `apply_neumann_scalar`.
        p = jnp.where(ii == 0, shift_x(p, 1), p)
        p = jnp.where(ii == nx - 1, shift_x(p, -1), p)
        p = jnp.where(jj == 0, shift_y(p, 1, rows), p)
        p = jnp.where(jj == ny - 1, shift_y(p, -1, rows), p)
        if z_active:
            p = jnp.where(kk == 0, shift_y(p, pny, rows), p)
            p = jnp.where(kk == nz - 1, shift_y(p, -pny, rows), p)
        return p

    def zero_boundary(p):
        return jnp.where(interior, p, zero)

    def dot(a, b):
        return jnp.sum(jnp.where(interior, a * b, zero))

    return dict(pny=pny, px=px, rows=rows, interior=interior, red=red,
                zero=zero, neighbors=neighbors, laplacian=laplacian,
                mirror=mirror, zero_boundary=zero_boundary, dot=dot)


def _make_call(kernel, rows, px, dtype, interpret):
    return pl.pallas_call(
        kernel,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, px), dtype),
                   jax.ShapeDtypeStruct((1, 4), dtype)],
        compiler_params=pltpu.CompilerParams(
            # XLA's scoped-vmem default (16 MiB) is far below the chip's
            # 128 MiB; the whole-volume working set needs the real limit.
            vmem_limit_bytes=_VMEM_SOLVE_BUDGET + 40 * 1024 * 1024),
        interpret=interpret,
    )


def _wrap(call, nz, ny, nx, pny, px, dtype):
    """Pad (nz,ny,nx) → (rows,px) rows layout; slice the result back."""

    def prep(a):
        a = jnp.pad(a.astype(dtype),
                    ((0, 0), (0, pny - ny), (0, px - nx)))
        return a.reshape(nz * pny, px)

    def solve(x, rhs):
        out, stats = call(prep(x), prep(rhs))
        vol = out.reshape(nz, pny, px)[:, :ny, :nx]
        return vol, stats

    return solve


def make_rbsor_vmem_solve(nz: int, ny: int, nx: int,
                          inv_dx2: float, inv_dy2: float, inv_dz2: float,
                          inv_factor: float,
                          omega: float, tolerance: float, abs_tol: float,
                          max_iterations: int, check_interval: int,
                          dtype=jnp.float32, interpret: bool = False):
    """Whole Red-Black-SOR solve in one kernel.

    Returns fn(x, rhs) -> (x_new, initial_res, final_res, iterations,
    converged) with x, rhs shaped (nz, ny, nx), or None if unsupported.
    """
    if not vmem_solve_supported(nz, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        h = _volume_helpers(nz, ny, nx, inv_dx2, inv_dy2, inv_dz2, dtype)
        interior, red, zero = h["interior"], h["red"], h["zero"]
        rhsv = rhs_ref[:, :]

        def half(p, mask):
            gs = -(rhsv - h["neighbors"](p)) * inv_factor
            return jnp.where(mask & interior, p + omega * (gs - p), p)

        def residual(p):
            return jnp.max(jnp.where(interior,
                                     jnp.abs(h["laplacian"](p) - rhsv),
                                     zero))

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
                out_ref[:, :] = h["mirror"](p)
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

    pny, px, rows = _padded_dims(nz, ny, nx)
    base = _wrap(_make_call(kernel, rows, px, dtype, interpret),
                 nz, ny, nx, pny, px, dtype)

    def solve(x, rhs):
        vol, stats = base(x, rhs)
        return (vol, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve


def make_cg_vmem_solve(nz: int, ny: int, nx: int,
                       inv_dx2: float, inv_dy2: float, inv_dz2: float,
                       scale: float,
                       tolerance: float, abs_tol: float,
                       max_iterations: int, check_interval: int,
                       dtype=jnp.float32, interpret: bool = False):
    """Whole CG/PCG solve in one kernel (small grids).

    The constant-diagonal Jacobi preconditioner enters as the scalar
    ``scale`` exactly as in `krylov.make_cg_fused`.  Returns
    fn(x, rhs) -> (x, r0, res, iters, running) or None when unsupported.
    """
    if not vmem_solve_supported(nz, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        h = _volume_helpers(nz, ny, nx, inv_dx2, inv_dy2, inv_dz2, dtype)
        interior, zero, dot = h["interior"], h["zero"], h["dot"]
        rhsv = rhs_ref[:, :]

        def A(p):
            return h["zero_boundary"](-h["laplacian"](p))

        x = h["mirror"](x_ref[:, :])
        r = h["zero_boundary"](h["laplacian"](x) - rhsv)
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

        out_ref[:, :] = h["mirror"](x_f)
        stats_ref[0, 0] = initial_res
        stats_ref[0, 1] = jnp.where(already, initial_res, res_f)
        stats_ref[0, 2] = jnp.where(already, jnp.zeros((), dtype),
                                    it_f.astype(dtype))
        stats_ref[0, 3] = running_f.astype(dtype)

    pny, px, rows = _padded_dims(nz, ny, nx)
    base = _wrap(_make_call(kernel, rows, px, dtype, interpret),
                 nz, ny, nx, pny, px, dtype)

    def solve(x, rhs):
        vol, stats = base(x, rhs)
        return (vol, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve


def make_bicgstab_vmem_solve(nz: int, ny: int, nx: int,
                             inv_dx2: float, inv_dy2: float, inv_dz2: float,
                             tolerance: float, abs_tol: float,
                             max_iterations: int, check_interval: int,
                             dtype=jnp.float32, interpret: bool = False):
    """Whole BiCGSTAB solve in one kernel (small grids).

    Returns fn(x, rhs) -> (x, r0, res, iters, stagnated) or None.
    """
    if not vmem_solve_supported(nz, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        h = _volume_helpers(nz, ny, nx, inv_dx2, inv_dy2, inv_dz2, dtype)
        interior, zero, dot = h["interior"], h["zero"], h["dot"]
        rhsv = rhs_ref[:, :]
        one = jnp.ones((), dtype)

        def A(p):
            return h["zero_boundary"](-h["laplacian"](p))

        x = h["mirror"](x_ref[:, :])
        r = h["zero_boundary"](h["laplacian"](x) - rhsv)
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

        out_ref[:, :] = h["mirror"](x_f)
        stats_ref[0, 0] = initial_res
        stats_ref[0, 1] = jnp.where(already, initial_res, res_f)
        stats_ref[0, 2] = jnp.where(already, jnp.zeros((), dtype),
                                    it_f.astype(dtype))
        stats_ref[0, 3] = stagnated_f.astype(dtype)

    pny, px, rows = _padded_dims(nz, ny, nx)
    base = _wrap(_make_call(kernel, rows, px, dtype, interpret),
                 nz, ny, nx, pny, px, dtype)

    def solve(x, rhs):
        vol, stats = base(x, rhs)
        return (vol, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve


def make_jacobi_vmem_solve(nz: int, ny: int, nx: int,
                           inv_dx2: float, inv_dy2: float, inv_dz2: float,
                           inv_factor: float,
                           tolerance: float, abs_tol: float,
                           max_iterations: int, check_interval: int,
                           dtype=jnp.float32, interpret: bool = False):
    """Whole Jacobi solve in one kernel (double-buffered full sweep,
    `cpu/linear_solver_jacobi.c:76-129` semantics via the same
    check-interval chunking as `stationary.make_jacobi`).

    Returns fn(x, rhs) -> (x_new, initial_res, final_res, iterations,
    converged), or None if unsupported."""
    if not vmem_solve_supported(nz, ny, nx, jnp.dtype(dtype).itemsize):
        return None
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        h = _volume_helpers(nz, ny, nx, inv_dx2, inv_dy2, inv_dz2, dtype)
        interior, zero = h["interior"], h["zero"]
        rhsv = rhs_ref[:, :]

        def sweep(p):
            new = -(rhsv - h["neighbors"](p)) * inv_factor
            return h["mirror"](jnp.where(interior, new, p))

        def residual(p):
            return jnp.max(jnp.where(interior,
                                     jnp.abs(h["laplacian"](p) - rhsv),
                                     zero))

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
                out_ref[:, :] = sweep(out_ref[:, :])
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

    pny, px, rows = _padded_dims(nz, ny, nx)
    base = _wrap(_make_call(kernel, rows, px, dtype, interpret),
                 nz, ny, nx, pny, px, dtype)

    def solve(x, rhs):
        vol, stats = base(x, rhs)
        return (vol, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve
