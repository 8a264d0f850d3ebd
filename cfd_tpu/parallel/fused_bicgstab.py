"""Fused multi-chip BiCGSTAB: shard_map ring halos + psum dots.

The distributed twin of the three-pass fused BiCGSTAB
(`..solvers.poisson.krylov.make_bicgstab_fused`) for z- or (z, y)-
decomposed fields — the reference ships a device-resident BiCGSTAB
(`lib/src/solvers/linear/gpu/poisson_solver_bicgstab_gpu.cu`); this is
its ICI-ring equivalent, completing the multi-chip iterative-method
matrix alongside the fused CG (`.fused_cg`) and fused multigrid
(`.fused_mg`):

* passes 1 (p' / Ap') and 2 (s / t) exchange one edge-plane pair per ring
  neighbor per pass (plus the 4-row y ring on a (z, y) mesh) and run the
  shard-local rolling-plane kernels
  (`ops.pallas.bicgstab_kernels.BiCGSTABKernels(global_nz, global_ny)`);
* pass 3 (x/r update + next ρ) is pointwise — it runs the PLAIN
  single-chip kernel on a zero-padded owned block, no exchange at all;
* the five dots per iteration ride ``lax.psum`` over the mesh axes;
* all work vectors live in the global Dirichlet-0 correction space, so
  x keeps its caller shells bit-exactly (`linear_solver_cg.c:103-123`).

The recursion, breakdown and early s-exit semantics are identical to
``make_bicgstab_fused`` (same rotated loop).  Unlike CG, BiCGSTAB's
trajectory is sensitive to dot-product rounding (shard-wise partial sums
group differently than one-device sums, and the jnp vs single-chip-fused
solvers already differ by a few iterations), so the guarantee is
same-solution convergence, not bit-equal iteration counts — asserted by
tests/parallel/test_fused_bicgstab_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..solvers.poisson.base import (PoissonParams, PoissonProblem,
                                    PoissonResult, PoissonStatus, Precond)
from ..solvers.poisson.krylov import BREAKDOWN


def bicgstab_fused_sharded_unsupported_reason(problem: PoissonProblem,
                                              n_shards: int,
                                              dtype=jnp.float32,
                                              py: int = 1) -> str | None:
    """None when the fused sharded BiCGSTAB applies, else a reason."""
    from ..ops.pallas.bicgstab_kernels import bicgstab_kernels_supported

    nz, ny, nx = problem.shape
    if dtype != jnp.float32:
        return f"fused kernels are float32-only (got {dtype})"
    if nz <= 2:
        return "fused sharded BiCGSTAB is 3D-only"
    if nz % n_shards != 0 or nz // n_shards < 2:
        return (f"nz={nz} must be divisible by {n_shards} shards with >= 2 "
                "planes per shard")
    nyl = ny // py
    if py > 1 and (ny % py != 0 or nyl < 8 or nyl % 8 != 0):
        return (f"ny={ny} must be divisible by {py} y-shards with a "
                "multiple of 8 (>= 8) rows per shard")
    ny_k = (nyl + 8) if py > 1 else ny
    if not bicgstab_kernels_supported(nz // n_shards + 2, ny_k, nx):
        return (f"local block ({nz // n_shards}+2, {ny_k}, {nx}) outside "
                "rolling-kernel support (nx%128, ny%8, VMEM)")
    return None


def make_bicgstab_fused_sharded_local(problem: PoissonProblem,
                                      params: PoissonParams,
                                      n_shards: int, axis: str = "z",
                                      dtype=jnp.float32,
                                      interpret: bool = False,
                                      py: int = 1, yaxis: str = "y"):
    """Shard-LOCAL solve body: (x_local, rhs_local) → PoissonResult.
    Must run inside a shard_map over ``axis`` (and ``yaxis`` when
    ``py > 1``); returns None when unsupported."""
    from ..ops.pallas.bicgstab_kernels import BiCGSTABKernels

    if bicgstab_fused_sharded_unsupported_reason(problem, n_shards, dtype,
                                                 py) is not None:
        return None
    if params.preconditioner not in (Precond.NONE,):
        return None   # reference BiCGSTAB is unpreconditioned
    nz, ny, nx = problem.shape
    pz = n_shards
    nzl = nz // pz
    nyl = ny // py
    sharded_y = py > 1
    k = BiCGSTABKernels(nzl + 2, (nyl + 8) if sharded_y else ny, nx,
                        problem.inv_dx2, problem.inv_dy2, problem.inv_dz2,
                        dtype, interpret, global_nz=nz,
                        global_ny=ny if sharded_y else None)
    # xr is pointwise: run the plain kernel on the zero-padded owned block
    kxr = BiCGSTABKernels(nzl + 2, nyl, nx, problem.inv_dx2,
                          problem.inv_dy2, problem.inv_dz2, dtype,
                          interpret)
    if not (k.pv is not None and k.st is not None and kxr.xr is not None):
        return None

    ci = max(1, int(params.check_interval))
    max_iter = int(params.max_iterations)
    abs_tol = params.absolute_tolerance
    fwd = [(i, i + 1) for i in range(pz - 1)]
    bwd = [(i + 1, i) for i in range(pz - 1)]
    fwd_y = [(i, i + 1) for i in range(py - 1)]
    bwd_y = [(i + 1, i) for i in range(py - 1)]
    axes = (axis, yaxis) if sharded_y else axis
    inv_dx2, inv_dy2, inv_dz2 = (problem.inv_dx2, problem.inv_dy2,
                                 problem.inv_dz2)

    def ypad(a):
        if not sharded_y:
            return a
        lo = lax.ppermute(a[:, -4:], yaxis, fwd_y)
        hi = lax.ppermute(a[:, :4], yaxis, bwd_y)
        return jnp.concatenate([lo, a, hi], axis=1)

    def hpad(a):
        if pz == 1:
            return jnp.pad(a, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(a[-1:], axis, fwd)
        hi = lax.ppermute(a[:1], axis, bwd)
        return jnp.concatenate([lo, a, hi], axis=0)

    def pad(a):
        return hpad(ypad(a))

    def unpad(o):
        return o[1:-1, 4:-4] if sharded_y else o[1:-1]

    def zpad(a):
        """Zero z-pad for the pointwise xr pass (no exchange needed)."""
        return jnp.pad(a, ((1, 1), (0, 0), (0, 0)))

    def local_solve(x, rhs):
        idx = lax.axis_index(axis)
        first = idx == 0
        last = idx == pz - 1
        z_off = (idx * nzl - 1).astype(dtype)
        if sharded_y:
            yi = lax.axis_index(yaxis)
            firsty = yi == 0
            lasty = yi == py - 1
            y_off = (yi * nyl - 4).astype(dtype)
            extra = (z_off, y_off)
        else:
            firsty = lasty = True
            extra = (z_off,)

        def neumann(a):
            a = a.at[:, :, 0].set(a[:, :, 1])
            a = a.at[:, :, -1].set(a[:, :, -2])
            a = a.at[:, 0, :].set(jnp.where(firsty, a[:, 1, :], a[:, 0, :]))
            a = a.at[:, -1, :].set(jnp.where(lasty, a[:, -2, :],
                                             a[:, -1, :]))
            a = a.at[0].set(jnp.where(first, a[1], a[0]))
            a = a.at[-1].set(jnp.where(last, a[-2], a[-1]))
            return a

        jj = lax.broadcasted_iota(jnp.int32, (nyl, nx), 0)
        ii = lax.broadcasted_iota(jnp.int32, (nyl, nx), 1)
        if sharded_y:
            jj = jj + yi * nyl
        m2d = ((jj > 0) & (jj < ny - 1) & (ii > 0)
               & (ii < nx - 1)).astype(dtype)
        m = jnp.broadcast_to(m2d, (nzl, nyl, nx))
        zero2d = jnp.zeros_like(m2d)
        m = m.at[0].set(jnp.where(first, zero2d, m[0]))
        m = m.at[-1].set(jnp.where(last, zero2d, m[-1]))

        def lap3(ah):
            c = ah[1:-1]
            lap = ((jnp.roll(c, -1, -1) - 2.0 * c
                    + jnp.roll(c, 1, -1)) * inv_dx2
                   + (jnp.roll(c, -1, -2) - 2.0 * c
                      + jnp.roll(c, 1, -2)) * inv_dy2
                   + (ah[2:] - 2.0 * c + ah[:-2]) * inv_dz2)
            return lap[:, 4:-4] if sharded_y else lap

        x = neumann(x)
        r = (lap3(pad(x)) - rhs) * m
        r_hat = r
        v = jnp.zeros_like(r)
        p = jnp.zeros_like(r)
        rr0 = lax.psum(jnp.sum(r * r), axes)
        initial_res = jnp.sqrt(rr0)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        one = jnp.asarray(1.0, dtype)

        rhat_pad = ypad(r_hat)   # pointwise in pass 1's dot; rows suffice

        def cond(c):
            return c[10] & (c[8] < max_iter)

        def body(c):
            (x, r, p, v, rho_prev, rho_new, alpha, omega, it, res,
             _, _) = c
            bd1 = jnp.abs(rho_new) < BREAKDOWN
            beta = (rho_new / jnp.where(bd1, 1.0, rho_prev)) \
                * (alpha / jnp.where(jnp.abs(omega) < BREAKDOWN, 1.0,
                                     omega))
            scal1 = jnp.stack([beta, omega, *extra])
            pn_pad, ap_pad, rhv_loc = k.pv(scal1, pad(r), pad(p), pad(v),
                                           zpad(rhat_pad))
            p_new = unpad(pn_pad)
            v_new = unpad(ap_pad)
            rhv = lax.psum(rhv_loc, axes)
            bd2 = jnp.abs(rhv) < BREAKDOWN
            alpha_new = rho_new / jnp.where(bd2, 1.0, rhv)

            scal2 = jnp.stack([alpha_new, *extra])
            s_pad, t_pad, ss_l, ts_l, tt_l = k.st(scal2, pad(r),
                                                  pad(v_new))
            s = unpad(s_pad)
            t = unpad(t_pad)
            ss = lax.psum(ss_l, axes)
            ts = lax.psum(ts_l, axes)
            tt = lax.psum(tt_l, axes)
            s_norm = jnp.sqrt(ss)
            early = (s_norm < tol) | (s_norm < abs_tol)
            bd3 = jnp.abs(tt) < BREAKDOWN
            omega_new = ts / jnp.where(bd3, 1.0, tt)

            bd = bd1 | bd2
            alpha_eff = jnp.where(bd, 0.0, alpha_new)
            omega_eff = jnp.where(bd | early | bd3, 0.0, omega_new)
            scal3 = jnp.stack([alpha_eff, omega_eff])
            x_pad, r_pad, rr_l, rhr_l = kxr.xr(
                scal3, zpad(x), zpad(p_new), zpad(s), zpad(t),
                zpad(r_hat))
            x = x_pad[1:-1]
            r = r_pad[1:-1]
            rr = lax.psum(rr_l, axes)
            rhat_r = lax.psum(rhr_l, axes)
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
        x_f = neumann(x_f)
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

    return local_solve


def make_bicgstab_fused_sharded(problem: PoissonProblem,
                                params: PoissonParams, mesh: Mesh,
                                dtype=jnp.float32,
                                interpret: bool = None):
    """Standalone sharded fused BiCGSTAB over a z-only or (z, y) mesh:
    (x, rhs) global arrays → PoissonResult with ``x`` sharded over the
    mesh and replicated scalars."""
    from .fused import _mesh_zy_sizes

    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        raise ValueError("fused sharded BiCGSTAB needs a mesh over "
                         f"('z'[, 'y']) axes (got axes {dict(mesh.shape)})")
    pz, py = sizes
    reason = bicgstab_fused_sharded_unsupported_reason(problem, pz, dtype,
                                                       py)
    if reason is not None:
        raise ValueError(f"fused sharded BiCGSTAB unsupported: {reason}")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    local = make_bicgstab_fused_sharded_local(problem, params, pz,
                                              dtype=dtype,
                                              interpret=interpret, py=py)
    if local is None:
        raise ValueError("fused sharded BiCGSTAB: kernel build failed")

    spec = P("z", "y", None) if py > 1 else P("z", None, None)
    rspec = PoissonResult(x=spec, iterations=P(), initial_residual=P(),
                          final_residual=P(), status=P())
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                         out_specs=rspec, check_vma=False)
