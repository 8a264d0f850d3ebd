"""Geometric multigrid Poisson solver and MG-preconditioned CG.

The reference declares POISSON_METHOD_MULTIGRID but never implements it
(`linear_solver.c:236-238` returns NULL).  This module supplies it,
TPU-native: vertex-centered V-cycles with red-black Gauss-Seidel smoothing,
full-weighting restriction, and (bi/tri)linear prolongation — all as static
jnp programs (the level hierarchy is unrolled at trace time, so one jit
compiles the whole cycle).

Operates in the same Dirichlet-0 correction space as the Krylov solvers
(work arrays keep zero shells; the caller's x keeps its Neumann shell,
applied before/after — identical convention to `make_cg`).  Grids must be
coarsenable: every active dimension (n−1) divisible by 2 down to n ≥ 5 for
at least one level; otherwise the factory returns None and callers fall
back.

Two entry points:

* :func:`make_multigrid` — standalone V-cycle iteration (POISSON_METHOD_MULTIGRID).
* :func:`make_mg_cg` — CG preconditioned by one symmetric V-cycle
  (red-black pre-smoothing, black-red post-smoothing keeps M symmetric
  positive definite).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import (PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStatus)
from .krylov import BREAKDOWN


@dataclasses.dataclass(frozen=True)
class _Level:
    shape: tuple
    inv_dx2: float
    inv_dy2: float
    inv_dz2: float
    inv_factor: float


def _build_levels(problem: PoissonProblem, min_size: int = 5,
                  max_levels: int = 12) -> Optional[List[_Level]]:
    levels = []
    nz, ny, nx = problem.shape
    dx, dy, dz = problem.dx, problem.dy, problem.dz
    is_3d = nz > 1
    while len(levels) < max_levels:
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
        inv_dz2 = 1.0 / (dz * dz) if dz > 0 else 0.0
        shape = (nz, ny, nx)
        levels.append(_Level(
            shape, inv_dx2, inv_dy2, inv_dz2,
            1.0 / (2.0 * (inv_dx2 + inv_dy2 + inv_dz2))))
        can = (nx - 1) % 2 == 0 and (ny - 1) % 2 == 0 and nx >= 2 * min_size - 1 \
            and ny >= 2 * min_size - 1
        if is_3d:
            can = can and (nz - 1) % 2 == 0 and nz >= 2 * min_size - 1
        if not can:
            break
        nx = (nx - 1) // 2 + 1
        ny = (ny - 1) // 2 + 1
        dx, dy = dx * 2, dy * 2
        if is_3d:
            nz = (nz - 1) // 2 + 1
            dz = dz * 2
    if len(levels) < 2:
        return None
    return levels


def _zero_shell(a):
    z = jnp.zeros_like(a)
    if a.shape[0] > 1:
        return z.at[1:-1, 1:-1, 1:-1].set(a[1:-1, 1:-1, 1:-1])
    return z.at[:, 1:-1, 1:-1].set(a[:, 1:-1, 1:-1])


def _lap(x, lv: _Level):
    out = ((jnp.roll(x, -1, -1) - 2.0 * x + jnp.roll(x, 1, -1)) * lv.inv_dx2
           + (jnp.roll(x, -1, -2) - 2.0 * x + jnp.roll(x, 1, -2)) * lv.inv_dy2)
    if x.shape[0] > 1:
        out = out + (jnp.roll(x, -1, -3) - 2.0 * x
                     + jnp.roll(x, 1, -3)) * lv.inv_dz2
    return out


def _A(x, lv: _Level):
    """A = −∇² on the Dirichlet-0 interior."""
    return _zero_shell(-_lap(x, lv))


def _rb_sweep(x, b, lv: _Level, order=("red", "black")):
    """One red-black Gauss-Seidel sweep of A x = b (Dirichlet-0).

    Masks are built in-trace from iota (`stencils.checkerboard_mask`) —
    captured full-shape numpy constants bloat the compile payload
    (~135 MB bool per color at 513³) past the remote compile service's
    request limit."""
    from ...ops.stencils import checkerboard_mask
    for color in order:
        mask = checkerboard_mask(lv.shape, 0 if color == "red" else 1)
        nb = ((jnp.roll(x, -1, -1) + jnp.roll(x, 1, -1)) * lv.inv_dx2
              + (jnp.roll(x, -1, -2) + jnp.roll(x, 1, -2)) * lv.inv_dy2)
        if x.shape[0] > 1:
            nb = nb + (jnp.roll(x, -1, -3) + jnp.roll(x, 1, -3)) * lv.inv_dz2
        # A x = b ⇔ diag·x − nb = b (diag = 1/inv_factor)
        gs = (b + nb) * lv.inv_factor
        x = jnp.where(mask, gs, x)
    return x


def _fw_axis(a, axis):
    """Separable full-weighting [1/4, 1/2, 1/4] onto interior coarse nodes:
    coarse I ∈ [1, nc-2] gathers fine 2I−1, 2I, 2I+1."""
    nf = a.shape[axis]
    return (0.25 * lax.slice_in_dim(a, 1, nf - 3, 2, axis)
            + 0.5 * lax.slice_in_dim(a, 2, nf - 2, 2, axis)
            + 0.25 * lax.slice_in_dim(a, 3, nf - 1, 2, axis))


def _restrict(r_f, fine: _Level, coarse: _Level):
    """Full-weighting restriction to the coarse interior (shell zero)."""
    is_3d = r_f.shape[0] > 1
    if is_3d:
        a = _fw_axis(_fw_axis(_fw_axis(r_f, 0), 1), 2)
        out = jnp.zeros(coarse.shape, r_f.dtype)
        return out.at[1:-1, 1:-1, 1:-1].set(a)
    a = _fw_axis(_fw_axis(r_f[0], 0), 1)
    out = jnp.zeros(coarse.shape, r_f.dtype)
    return out.at[0, 1:-1, 1:-1].set(a)


def _interp_axis(a, axis):
    """Linear interpolation doubling one axis: out[2i] = a[i],
    out[2i+1] = (a[i] + a[i+1])/2, length 2·(n−1)+1."""
    lo = lax.slice_in_dim(a, 0, a.shape[axis] - 1, 1, axis)
    hi = lax.slice_in_dim(a, 1, a.shape[axis], 1, axis)
    mid = 0.5 * (lo + hi)
    # interleave: out[2i] = a[i], out[2i+1] = mid[i]
    stacked = jnp.stack([lo, mid], axis=axis + 1)
    new_shape = list(a.shape)
    new_shape[axis] = 2 * (a.shape[axis] - 1)
    out = stacked.reshape(new_shape)
    last = lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], 1, axis)
    return jnp.concatenate([out, last], axis=axis)


def _prolong(e_c, fine: _Level, coarse: _Level):
    """(Bi/tri)linear interpolation to the fine grid, zero shell."""
    is_3d = e_c.shape[0] > 1

    if is_3d:
        a = e_c
        a = _interp_axis(a, 0)
        a = _interp_axis(a, 1)
        a = _interp_axis(a, 2)
        return _zero_shell(a)
    a = _interp_axis(e_c[0], 0)
    a = _interp_axis(a, 1)
    return _zero_shell(a[None])


def _v_cycle(levels: List[_Level], lvl: int, b, pre: int, post: int,
             symmetric: bool, fused=None):
    lv = levels[lvl]
    if lvl == len(levels) - 1:
        # Coarsest: enough sweeps to solve nearly exactly.
        x = jnp.zeros(lv.shape, b.dtype)
        for _ in range(40):
            x = _rb_sweep(x, b, lv)
        return x
    kf = fused[lvl] if fused is not None else None
    if kf is not None and not (symmetric and kf[2] is None):
        sweep, sweep_res, sweep_br = kf
        post_sweep = sweep_br if symmetric else sweep
        nyp, nxp = _pad_dims(lv)
        bp = _pad(b, nyp, nxp)
        xp = jnp.zeros_like(bp)
        for _ in range(pre - 1):
            xp = sweep(xp, bp)
        xp, rp = sweep_res(xp, bp)
        r = _unpad(rp, lv)
        r_c = _restrict(r, lv, levels[lvl + 1])
        e_c = _v_cycle(levels, lvl + 1, r_c, pre, post, symmetric, fused)
        xp = xp + _pad(_prolong(e_c, lv, levels[lvl + 1]), nyp, nxp)
        for _ in range(post):
            xp = post_sweep(xp, bp)
        return _unpad(xp, lv)
    x = jnp.zeros(lv.shape, b.dtype)
    for _ in range(pre):
        x = _rb_sweep(x, b, lv, ("red", "black"))
    r = _zero_shell(b - _A(x, lv))
    r_c = _restrict(r, lv, levels[lvl + 1])
    e_c = _v_cycle(levels, lvl + 1, r_c, pre, post, symmetric, fused)
    x = x + _prolong(e_c, lv, levels[lvl + 1])
    order = ("black", "red") if symmetric else ("red", "black")
    for _ in range(post):
        x = _rb_sweep(x, b, lv, order)
    return x


def _pad_dims(lv: _Level):
    from ...ops.pallas.mg_kernels import pad_dims
    return pad_dims(lv.shape[1], lv.shape[2])


def _pad(a, nyp, nxp):
    nz, ny, nx = a.shape
    return jnp.pad(a, ((0, 0), (0, nyp - ny), (0, nxp - nx)))


def _unpad(a, lv: _Level):
    return a[:, :lv.shape[1], :lv.shape[2]]


def _build_fused_levels(levels: List[_Level], pre: int, post: int,
                        dtype, interpret: bool, min_fused_nx: int,
                        symmetric: bool = False) -> Optional[list]:
    """Per-level fused (sweep, sweep+residual, black-first-sweep) kernel
    triples; None entries fall back to the jnp sweep (coarse levels,
    unsupported shapes).  The black-first variant is built only for
    ``symmetric`` callers (the SPD MG-CG preconditioner's post order)."""
    from ...ops.pallas.mg_kernels import make_mg_rb_sweep, mg_sweep_supported

    if pre < 1 or post < 1 or dtype != jnp.float32:
        return None
    out = []
    for i, lv in enumerate(levels):
        nz, ny, nx = lv.shape
        kf = None
        if (i < len(levels) - 1 and nz > 2 and nx >= min_fused_nx
                and mg_sweep_supported(nz, ny, nx)):
            sweep = make_mg_rb_sweep(nz, ny, nx, lv.inv_dx2, lv.inv_dy2,
                                     lv.inv_dz2, lv.inv_factor, False,
                                     dtype, interpret)
            sweep_res = make_mg_rb_sweep(nz, ny, nx, lv.inv_dx2,
                                         lv.inv_dy2, lv.inv_dz2,
                                         lv.inv_factor, True, dtype,
                                         interpret)
            sweep_br = None
            if symmetric:
                sweep_br = make_mg_rb_sweep(nz, ny, nx, lv.inv_dx2,
                                            lv.inv_dy2, lv.inv_dz2,
                                            lv.inv_factor, False, dtype,
                                            interpret, first_color="black")
            if sweep is not None and sweep_res is not None \
                    and (not symmetric or sweep_br is not None):
                kf = (sweep, sweep_res, sweep_br)
        out.append(kf)
    return out if any(k is not None for k in out) else None


def make_multigrid(problem: PoissonProblem, params: PoissonParams,
                   pre: int = 2, post: int = 2, use_pallas: bool = None,
                   pallas_interpret: bool = False, min_fused_nx: int = 129):
    """Standalone V-cycle iteration solving ∇²x = rhs (Neumann outer shell,
    Dirichlet-0 correction space — the Krylov convention).

    ``use_pallas=None`` (auto) enables the fused wavefront RB sweeps
    (`ops/pallas/mg_kernels.py`: red+black+residual in one streaming pass
    on lane-padded 2^k+1 arrays) on TPU backends for float32 3D levels
    with nx ≥ ``min_fused_nx``; coarse/unsupported levels keep the jnp
    sweep.  Gauss-Seidel is affine in (x, b), so smoothing the running
    iterate in place of the zero-initialized correction is algebraically
    identical — iteration counts match the jnp path."""
    levels = _build_levels(problem)
    if levels is None:
        return None
    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fused = None
    if use_pallas and problem.is_3d:
        fused = _build_fused_levels(levels, pre, post, jnp.float32,
                                    pallas_interpret, min_fused_nx)

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        b = problem.zero_boundary(-(rhs - problem.laplacian(x)))
        # Solve A e = b with A = −∇² Dirichlet-0; x* = x + e.
        initial_res = jnp.sqrt(problem.dot_interior(b, b))
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        def cond(c):
            return c[3] & (c[1] < max_iter)

        # The fused sweeps are float32 kernels; other dtypes keep the jnp
        # body (trace-time gate — the frontend's fused solvers do the same).
        if (fused is not None and fused[0] is not None
                and x.dtype == jnp.float32):
            # Fast path: smooth the iterate directly (V-cycle with initial
            # guess); the pre/post residuals ride the fused sweeps, so the
            # standalone r / r2 passes of the jnp body disappear.
            sweep0, sweep_res0 = fused[0][:2]
            lv0 = levels[0]
            nyp, nxp = _pad_dims(lv0)

            def body_fused(c):
                e_p, it, res, _ = c
                for _ in range(pre - 1):
                    e_p = sweep0(e_p, bp)
                e_p, rp = sweep_res0(e_p, bp)
                r_c = _restrict(_unpad(rp, lv0), lv0, levels[1])
                de_c = _v_cycle(levels, 1, r_c, pre, post, False, fused)
                e_p = e_p + _pad(_prolong(de_c, lv0, levels[1]), nyp, nxp)
                for _ in range(post - 1):
                    e_p = sweep0(e_p, bp)
                e_p, rp2 = sweep_res0(e_p, bp)
                res_new = jnp.sqrt(jnp.sum(rp2 * rp2))
                check = (it % ci) == 0
                converged = check & ((res_new < tol) | (res_new < abs_tol))
                return (e_p, it + 1, res_new, ~converged)

            bp = _pad(b, nyp, nxp)
            e0 = jnp.zeros_like(bp)
            e_f, it_f, res_f, running = lax.while_loop(
                cond, body_fused, (e0, jnp.int32(0), initial_res, ~already))
            e_f = _unpad(e_f, lv0)
        else:
            def body(c):
                e, it, res, _ = c
                r = problem.zero_boundary(b - _A(e, levels[0]))
                de = _v_cycle(levels, 0, r, pre, post, False,
                              fused if x.dtype == jnp.float32 else None)
                e = e + de
                r2 = problem.zero_boundary(b - _A(e, levels[0]))
                res_new = jnp.sqrt(problem.dot_interior(r2, r2))
                check = (it % ci) == 0
                converged = check & ((res_new < tol) | (res_new < abs_tol))
                return (e, it + 1, res_new, ~converged)

            e0 = jnp.zeros_like(b)
            e_f, it_f, res_f, running = lax.while_loop(
                cond, body, (e0, jnp.int32(0), initial_res, ~already))
        x_f = problem.neumann_bc(x + e_f)
        converged = (res_f < tol) | (res_f < abs_tol) | already
        status = jnp.where(converged, jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_f,
                             iterations=jnp.where(already, 0,
                                                  jnp.minimum(it_f, max_iter)),
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return jax.jit(solve)


def make_multigrid_vmem(problem: PoissonProblem, params: PoissonParams,
                        pre: int = 2, post: int = 2, dtype=jnp.float32,
                        interpret: bool = False):
    """Whole-solve VMEM-resident multigrid for small 2D grids: the entire
    convergence loop — every V-cycle level, sweep, restriction and
    prolongation — runs inside ONE Pallas kernel with MXU-matmul
    inter-level transfers (see `ops/pallas/vmem_mg.py`).  Same algorithm
    and status semantics as :func:`make_multigrid`; iteration counts match
    up to matmul-vs-slice rounding.  Returns None when unsupported
    (3D grids, non-coarsenable, exceeds the VMEM budget)."""
    from ...ops.pallas.vmem_mg import make_mg_vmem_solve

    levels = _build_levels(problem)
    if levels is None:
        return None
    fn = make_mg_vmem_solve(levels, pre, post,
                            params.tolerance, params.absolute_tolerance,
                            params.max_iterations, params.check_interval,
                            dtype=dtype, interpret=interpret)
    if fn is None:
        return None
    abs_tol = params.absolute_tolerance
    max_iter = int(params.max_iterations)

    def solve(x, rhs):
        x_f, initial_res, res_f, it_f, converged_f = fn(x, rhs)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        converged = (res_f < tol) | (res_f < abs_tol) | already
        status = jnp.where(converged, jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_f,
                             iterations=jnp.where(already, 0,
                                                  jnp.minimum(it_f, max_iter)),
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return solve


def make_mg_cg(problem: PoissonProblem, params: PoissonParams,
               pre: int = 1, post: int = 1, use_pallas: bool = None,
               pallas_interpret: bool = False, min_fused_nx: int = 129):
    """CG preconditioned by one symmetric V-cycle (SPD preconditioner:
    red-black pre-smoothing, black-red post-smoothing).  ``use_pallas``
    (auto on TPU) runs the V-cycle sweeps as fused wavefront kernels —
    the black-first variant keeps the symmetric order, so M stays SPD."""
    levels = _build_levels(problem)
    if levels is None:
        return None
    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance
    lv0 = levels[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fused = None
    if use_pallas and problem.is_3d:
        fused = _build_fused_levels(levels, pre, post, jnp.float32,
                                    pallas_interpret, min_fused_nx,
                                    symmetric=True)

    def precond(r):
        f = fused if r.dtype == jnp.float32 else None
        return _v_cycle(levels, 0, r, pre, post, symmetric=True, fused=f)

    def solve(x, rhs):
        x = problem.neumann_bc(x)
        r = problem.zero_boundary(problem.laplacian(x) - rhs)
        z = precond(r)
        p = z
        rho = problem.dot_interior(r, z)
        initial_res = jnp.sqrt(problem.dot_interior(r, r))
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol

        def cond(c):
            return c[6] & (c[4] < max_iter)

        def body(c):
            x, r, p, rho, it, res, _ = c
            Ap = _A(p, lv0)
            pAp = problem.dot_interior(p, Ap)
            bd = jnp.abs(pAp) < BREAKDOWN
            alpha = jnp.where(bd, 0.0, rho / jnp.where(bd, 1.0, pAp))
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rho_new = problem.dot_interior(r, z)
            res_new = jnp.sqrt(problem.dot_interior(r, r))
            check = (it % ci) == 0
            converged = check & ((res_new < tol) | (res_new < abs_tol))
            bd2 = jnp.abs(rho) < BREAKDOWN
            beta = rho_new / jnp.where(bd2, 1.0, rho)
            p = jnp.where(converged | bd | bd2, p, z + beta * p)
            stop = converged | bd | bd2
            return (x, r, p, rho_new, it + 1, res_new, ~stop)

        x_f, r_f, _, _, it_f, res_f, _ = lax.while_loop(
            cond, body, (x, r, p, rho, jnp.int32(0), initial_res, ~already))
        x_f = problem.neumann_bc(x_f)
        converged = (res_f < tol) | (res_f < abs_tol) | already
        status = jnp.where(converged, jnp.int32(PoissonStatus.CONVERGED),
                           jnp.int32(PoissonStatus.MAX_ITER))
        return PoissonResult(x=x_f,
                             iterations=jnp.where(already, 0,
                                                  jnp.minimum(it_f, max_iter)),
                             initial_residual=initial_res,
                             final_residual=jnp.where(already, initial_res,
                                                      res_f),
                             status=status)

    return jax.jit(solve)
