"""Fused multi-chip CG pressure solve: shard_map + ring halos + psum dots.

The distributed twin of the single-chip two-pass fused CG
(`..solvers.poisson.krylov.make_cg_fused`) for z- or (z, y)-decomposed
fields, so non-DST-able pressure solves keep Pallas-kernel speed
multi-chip instead of dropping to jnp-roll stencils under GSPMD (one
~60 GB/s sweep per op).  TPU-native equivalent of the reference's
fully-device-resident CG
(`lib/src/solvers/linear/gpu/poisson_cg_gpu_solve.cuh`) stretched over an
ICI ring:

* each iteration, every shard exchanges ONE (r, p) edge-plane pair with
  each ring neighbor (two ``lax.ppermute``s; a (z, y) mesh adds the
  4-row y-halo ring, exchanged first so the z ring carries corners),
  then runs the shard-local rolling-plane kernel
  (`ops.pallas.cg_kernels.make_lap_dot_sharded`): p' = M⁻¹r + β·p
  computed in-kernel for the halo-padded block — the 7-point apply sees
  the neighbor shard's correction values — plus Ap' and the local
  ⟨p', Ap'⟩ partial, every plane fetched from HBM exactly once;
* the two dots per iteration (⟨p', Ap'⟩, ⟨r, r⟩) ride ``lax.psum`` over
  ICI — the same all-reduce the reference's OMP backend expresses with
  reduction pragmas (`linear_solver_cg_omp.c`);
* the axpy updates are plain jnp (XLA fuses them into two streaming
  passes); p'/Ap' carry zeros on the global Dirichlet-0 shell, so x and r
  keep their caller shells bit-exactly (`linear_solver_cg.c:103-123`).

Convergence / breakdown / status semantics are identical to
``make_cg_fused`` (same rotated PCG recursion), so iteration counts match
the single-chip solver exactly — asserted by
tests/parallel/test_fused_cg_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..solvers.poisson.base import (PoissonParams, PoissonProblem,
                                    PoissonResult, PoissonStatus, Precond)
from ..solvers.poisson.krylov import BREAKDOWN


def cg_fused_sharded_unsupported_reason(problem: PoissonProblem,
                                        n_shards: int,
                                        dtype=jnp.float32,
                                        py: int = 1) -> str | None:
    """None when the fused sharded CG applies, else a human reason.
    ``n_shards`` is the z-shard count; ``py`` the y-shard count."""
    from ..ops.pallas.rolling import rolling_supported

    nz, ny, nx = problem.shape
    if dtype != jnp.float32:
        return f"fused kernels are float32-only (got {dtype})"
    if nz <= 2:
        return "fused sharded CG is 3D-only"
    if nz % n_shards != 0 or nz // n_shards < 2:
        return (f"nz={nz} must be divisible by {n_shards} shards with >= 2 "
                "planes per shard")
    if py > 1:
        nyl = ny // py
        if ny % py != 0 or nyl < 8 or nyl % 8 != 0:
            return (f"ny={ny} must be divisible by {py} y-shards with a "
                    "multiple of 8 (>= 8) rows per shard")
        if not rolling_supported(nz // n_shards + 2, nyl + 8, nx, 2, 0, 2):
            return (f"local block ({nz // n_shards}+2, {nyl}+8, {nx}) "
                    "outside rolling-kernel support (nx%128, VMEM)")
    elif not rolling_supported(nz // n_shards + 2, ny, nx, 2, 0, 2):
        return (f"local block ({nz // n_shards}+2, {ny}, {nx}) outside "
                "rolling-kernel support (nx%128, ny%8, VMEM)")
    return None


def make_cg_fused_sharded_local(problem: PoissonProblem,
                                params: PoissonParams, n_shards: int,
                                axis: str = "z", dtype=jnp.float32,
                                interpret: bool = False, py: int = 1,
                                yaxis: str = "y"):
    """Shard-LOCAL solve body: (x_local, rhs_local) → PoissonResult with a
    sharded ``x`` and replicated scalars.  Must run inside a shard_map
    over ``axis`` (and ``yaxis`` when ``py > 1``);
    :func:`make_cg_fused_sharded` wraps it for standalone use, and the
    fused sharded projection step calls it inline for
    ``poisson_method=CG``.  Returns None when unsupported."""
    from ..ops.pallas.cg_kernels import make_lap_dot_sharded

    if cg_fused_sharded_unsupported_reason(problem, n_shards, dtype,
                                           py) is not None:
        return None
    nz, ny, nx = problem.shape
    pz = n_shards
    nzl = nz // pz
    nyl = ny // py
    sharded_y = py > 1
    use_precond = params.preconditioner == Precond.JACOBI
    if params.preconditioner == Precond.MULTIGRID:
        return None
    scale = problem.inv_factor if use_precond else 1.0
    lap_dot = make_lap_dot_sharded(
        nzl + 2, (nyl + 8) if sharded_y else ny, nx, problem.inv_dx2,
        problem.inv_dy2, problem.inv_dz2, scale, global_nz=nz,
        global_ny=ny if sharded_y else None, dtype=dtype,
        interpret=interpret)
    if lap_dot is None:
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
        """(nzl, nyl, nx) → (nzl, nyl+8, nx): 4 edge rows per side over
        the open y ring (edge shards get zeros — the kernel's global-row
        masks zero everything outside the Dirichlet-0 space anyway)."""
        if not sharded_y:
            return a
        lo = lax.ppermute(a[:, -4:], yaxis, fwd_y)
        hi = lax.ppermute(a[:, :4], yaxis, bwd_y)
        return jnp.concatenate([lo, a, hi], axis=1)

    def hpad(a):
        """z halo planes via ring ppermutes, applied after ypad so the
        exchanged planes carry the corner rows (edge shards get zero
        halos — outside the global Dirichlet-0 space anyway)."""
        if pz == 1:
            return jnp.pad(a, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(a[-1:], axis, fwd)
        hi = lax.ppermute(a[:1], axis, bwd)
        return jnp.concatenate([lo, a, hi], axis=0)

    def unpad(o):
        return o[1:-1, 4:-4] if sharded_y else o[1:-1]

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
        else:
            firsty = lasty = True
            y_off = None

        def neumann(a):
            """apply_neumann_scalar face order: x, global y rows (edge
            y-shards only), then global z faces (edge z-shards only;
            nzl/nyl >= 2 keep the source plane/row local)."""
            a = a.at[:, :, 0].set(a[:, :, 1])
            a = a.at[:, :, -1].set(a[:, :, -2])
            a = a.at[:, 0, :].set(jnp.where(firsty, a[:, 1, :], a[:, 0, :]))
            a = a.at[:, -1, :].set(jnp.where(lasty, a[:, -2, :],
                                             a[:, -1, :]))
            a = a.at[0].set(jnp.where(first, a[1], a[0]))
            a = a.at[-1].set(jnp.where(last, a[-2], a[-1]))
            return a

        # Global interior mask for this shard's owned block.
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
            """7-point Laplacian of the padded block at its owned cells."""
            c = ah[1:-1]
            lap = ((jnp.roll(c, -1, -1) - 2.0 * c
                    + jnp.roll(c, 1, -1)) * inv_dx2
                   + (jnp.roll(c, -1, -2) - 2.0 * c
                      + jnp.roll(c, 1, -2)) * inv_dy2
                   + (ah[2:] - 2.0 * c + ah[:-2]) * inv_dz2)
            return lap[:, 4:-4] if sharded_y else lap

        x = neumann(x)
        r = (lap3(hpad(ypad(x))) - rhs) * m
        rr0 = lax.psum(jnp.sum(r * r), axes)
        rho = scale * rr0
        initial_res = jnp.sqrt(rr0)
        tol = problem.tolerance_for(params, initial_res)
        already = initial_res < abs_tol
        p0 = jnp.zeros_like(r)

        def cond(carry):
            _, _, _, _, _, it, _, running = carry
            return running & (it < max_iter)

        def body(carry):
            x, r, p, rho, beta, it, res, _ = carry
            scal = (jnp.stack([beta, z_off, y_off]) if sharded_y
                    else jnp.stack([beta, z_off]))
            pn_pad, ap_pad, pap_loc = lap_dot(scal, hpad(ypad(r)),
                                              hpad(ypad(p)))
            p = unpad(pn_pad)
            Ap = unpad(ap_pad)
            pAp = lax.psum(pap_loc, axes)
            breakdown1 = jnp.abs(pAp) < BREAKDOWN
            alpha = jnp.where(breakdown1, 0.0,
                              rho / jnp.where(breakdown1, 1.0, pAp))
            # p'/Ap' are zero outside the global interior, so x and r keep
            # their shells bit-exactly.
            x = x + alpha * p
            r = r - alpha * Ap
            rr = lax.psum(jnp.sum(r * r), axes)
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
            (x, r, p0, rho, jnp.zeros((), dtype), jnp.int32(0),
             initial_res, ~already))

        converged = (res_f < tol) | (res_f < abs_tol) | already
        x_f = neumann(x_f)
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

    return local_solve


def make_cg_fused_sharded(problem: PoissonProblem, params: PoissonParams,
                          mesh: Mesh, dtype=jnp.float32,
                          interpret: bool = None):
    """Standalone sharded fused CG over a z-only or (z, y) mesh:
    (x, rhs) global arrays → PoissonResult with ``x`` sharded over the
    mesh and replicated scalars.  Raises on unsupported configurations
    (callers gate on :func:`cg_fused_sharded_unsupported_reason`)."""
    from .fused import _mesh_zy_sizes

    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        raise ValueError("fused sharded CG needs a mesh over ('z'[, 'y']) "
                         f"axes (got axes {dict(mesh.shape)})")
    pz, py = sizes
    reason = cg_fused_sharded_unsupported_reason(problem, pz, dtype, py)
    if reason is not None:
        raise ValueError(f"fused sharded CG unsupported: {reason}")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    local = make_cg_fused_sharded_local(problem, params, pz,
                                        dtype=dtype, interpret=interpret,
                                        py=py)
    if local is None:
        raise ValueError("fused sharded CG: kernel build failed")

    spec = P("z", "y", None) if py > 1 else P("z", None, None)
    rspec = PoissonResult(x=spec, iterations=P(), initial_residual=P(),
                          final_residual=P(), status=P())
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                         out_specs=rspec, check_vma=False)
