"""Chorin projection Navier-Stokes solver.

Re-design of `cpu/solver_projection.c:46-297` as ONE jitted step containing
the predictor sweep, the divergence RHS, the on-device Poisson solve (a
``lax.while_loop`` CG/RB-SOR from `..poisson`), the corrector, the energy
step, and the boundary restore — zero host round-trips per time step.  This
is the TPU answer to the reference GPU backend's fully-device-resident loop
(`solver_projection_gpu.cu:617-772`) without its 19 hand-managed device
buffers.

Semantics preserved:

* predictor u* = u + dt(−u·∇u + ν∇²u + f), clamped ±100 (`:111-189`);
  caller-set boundary values stay on u* (`:187-189`);
* ρ taken from the first grid point, floored at 1e-10 → 1.0 (`:195-198`);
* ∇²p = (ρ/dt)∇·u* solved with the pressure solver preset (default CG, as
  `solver_projection.c:217-218`); non-convergence fails the step with
  MAX_ITER;
* corrector u = u* − (dt/ρ)∇p, clamped (`:230-250`);
* energy step + thermal BCs after the correction (`:256-268`);
* caller velocity boundaries restored at the end (`:277-278`);
* NaN/Inf sweep → DIVERGED (`:281-289`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...boundary.apply import copy_boundary_velocities
from ...core.field import FlowField
from ...core.grid import Grid
from ...core.status import CFDError, Status
from ...ops import stencils
from ..energy import apply_thermal_bcs, compute_buoyancy, make_energy_step, \
    validate_thermal_bc
from ..poisson.base import Method, PoissonParams, PoissonProblem
from ..poisson.krylov import make_bicgstab, make_cg
from ..poisson.spectral import make_fft_direct
from ..poisson.stationary import make_jacobi, make_redblack_sor
from .common import (clamp, field_diagnostics, field_status_and_diagnostics,
                     iterate_with_divergence_guard, validate_grid_for_solver,
                     z_constants)
from .params import PROJ_MAX_VELOCITY, NSParams, StepResult, source_terms

def _make_multigrid(problem, pparams):
    from ..poisson.frontend import _make_multigrid_dispatch
    return _make_multigrid_dispatch(problem, pparams)


_POISSON_MAKERS = {
    Method.CG: make_cg,
    Method.BICGSTAB: make_bicgstab,
    Method.REDBLACK_SOR: make_redblack_sor,
    Method.JACOBI: make_jacobi,
    Method.MULTIGRID: _make_multigrid,
    Method.FFT_DIRECT: make_fft_direct,
}


def make_projection_step(grid: Grid, params: NSParams, dtype=None,
                         poisson_method: Method = Method.CG,
                         poisson_params: PoissonParams = None,
                         use_pallas: bool = None,
                         pallas_interpret: bool = False,
                         use_pallas_cg: bool = None,
                         spectral_precision=None,
                         differentiable: bool = False,
                         poisson_solve_override=None,
                         bc_refresh=None):
    """Build the jitted projection step: (field, dt, iter) → (field, StepResult).

    ``use_pallas`` enables the fused Pallas fast path (float32, aligned
    grids; falls back to the jnp step when unsupported): streaming
    predictor/divergence/corrector kernels (rolling-plane in 3D,
    block-marching in 2D), plus — per ``poisson_method`` — the two-pass
    fused Pallas CG, the VMEM whole-solve (small grids), or the direct
    spectral-input kernel.  Default ``None`` = auto: on a TPU backend the
    fast path is on (consistency-tested against the jnp step), elsewhere
    off.  ``use_pallas_cg`` is the original name, kept as an alias.
    The sharded wrapper (`parallel.sharded`) passes an explicit ``False``
    and selects its own shard_map variants — the single-chip manual-DMA
    kernels never run under GSPMD partitioning.

    ``spectral_precision`` overrides the FFT_DIRECT MXU contraction
    precision (default ``lax.Precision.HIGHEST``; ``HIGH`` runs the sine
    transforms as 3-pass bfloat16 — ~5e-5 relative solution error at
    2048², 25-40% faster).

    ``differentiable=True`` makes the whole step reverse-mode
    differentiable: it pins the jnp path (the Pallas kernels have no
    transpose rule) and swaps the pressure solve for its adjoint-capable
    twin (`..poisson.adjoint.make_adjoint_poisson` — exact VJP at one
    extra solve).  Everything else in the step is already plain jnp, so
    ``jax.grad`` flows through initial conditions, sources, and — when
    passed as traced values in ``params`` — physics parameters.
    Combining ``differentiable=True`` with an explicit ``use_pallas=True``
    builds the hybrid step instead: fused-kernel forward value, jnp
    adjoint for the reverse pass (`.hybrid.pair_vjp`) — kernel throughput
    for loss evaluation, reverse-mode-only differentiation.

    ``bc_refresh``: optional ``fn(u*, v*, w*, t_next) → (u*, v*, w*)``
    applied to the predictor state BEFORE the pressure solve.  The default
    (None) preserves the reference's save/restore idiom
    (`solver_projection.c:187-189`): caller-set boundary values pass
    through the predictor untouched, which leaves them one step stale
    relative to the driven interior — for time-varying or driven-interior
    BCs (pulsatile inlets, body-forced periodic channels) that excites an
    artificial edge divergence whose pressure response grows with 1/dx
    (~2% of the forcing at test resolutions; see
    tests/validation/test_pulsatile_channel.py).  Passing the same BC
    application the caller performs between steps makes the predictor's
    shell consistent with its interior and removes the deficit.
    ``t_next = (iter_idx + 1)·dt`` — the time level of the predictor
    state.  ``bc_refresh`` composes with the fused fast paths (r5): in 3D
    the hook runs between the per-component predictor kernels and the
    standalone b̃ kernel, which carries the same in-kernel DST transforms
    (+ Thomas forward carry) as the mega sweep — only the single-sweep
    mega predictor is bypassed, and the corrector keeps its fused
    diagnostics; in 2D the two-pass split kernels (predictor sweep →
    hook → b̃ sweep, `Projection2DKernels(split=True)`) keep the
    marching-kernel fast path, DST fusion included.
    """
    if differentiable:
        if use_pallas or use_pallas_cg:
            # Hybrid: fused Pallas forward, adjoint of the jnp step for
            # the reverse pass (`.hybrid.pair_vjp`).  The fused forward
            # matches the jnp forward at solver-tolerance level, so the
            # gradient is the inexact-primal/exact-adjoint trade.
            from .hybrid import pair_vjp
            common = dict(dtype=dtype, poisson_method=poisson_method,
                          poisson_params=poisson_params,
                          spectral_precision=spectral_precision,
                          bc_refresh=bc_refresh)
            return pair_vjp(
                make_projection_step(grid, params, use_pallas=True,
                                     pallas_interpret=pallas_interpret,
                                     **common),
                make_projection_step(grid, params, use_pallas=False,
                                     differentiable=True, **common))
        use_pallas = False
    if use_pallas is None:
        use_pallas = (bool(use_pallas_cg)
                      or jax.default_backend() == "tpu")
    validate_grid_for_solver(grid, grid.shape)
    if params.energy_enabled:
        validate_thermal_bc(params.thermal_bc, grid)
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)

    # Uniform spacing from the first cell (`solver_projection.c:72-75`).
    dx, dy = grid.dx0, grid.dy0
    inv_2dx, inv_2dy = 1.0 / (2.0 * dx), 1.0 / (2.0 * dy)
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    inv_2dz, inv_dz2 = z_constants(grid)
    nu = params.mu

    # Consistent-scheme projection on stretched x/y grids — a framework
    # extension past the reference's dx0-parity momentum + uniform
    # pressure Poisson, which cap stretched-grid projection at the O(h)
    # error floor `examples/poiseuille_stretched_grid.c:255-258`
    # documents.  Exact 3-point nonuniform momentum/divergence/gradient
    # operators (`common.spacing_operators`) + the variable-coefficient
    # pressure Poisson (`poisson.nonuniform`: FV-symmetrized CG/BiCGSTAB
    # or the generalized-eigenbasis direct solve).  Uniform grids keep
    # the reference-parity path regardless of the scheme flag (the two
    # coincide there).
    consistent = (params.nonuniform_scheme == "consistent"
                  and not (grid.is_uniform("x") and grid.is_uniform("y")))

    coords = grid.coordinate_arrays(dtype)
    energy_step = make_energy_step(grid, params.alpha,
                                   params.heat_source_func,
                                   scheme=params.nonuniform_scheme)

    # Derivative operators for the jnp step body: reference-parity
    # uniform-constant stencils, or the exact nonuniform triples.
    if consistent:
        from .common import spacing_operators
        cd1x, cd1y, cd2x, cd2y, _ = spacing_operators(grid, dtype,
                                                      "consistent")

        def op_ddx(f):
            return cd1x(stencils.sx_m(f), f, stencils.sx_p(f))

        def op_ddy(f):
            return cd1y(stencils.sy_m(f), f, stencils.sy_p(f))

        def op_lap(f):
            out = (cd2x(stencils.sx_m(f), f, stencils.sx_p(f))
                   + cd2y(stencils.sy_m(f), f, stencils.sy_p(f)))
            if grid.nz > 1:
                out = out + (stencils.sz_p(f) - 2.0 * f
                             + stencils.sz_m(f)) * inv_dz2
            return out

        def op_div(u, v, w):
            return op_ddx(u) + op_ddy(v) + stencils.ddz(w, inv_2dz)
    else:
        def op_ddx(f):
            return stencils.ddx(f, inv_2dx)

        def op_ddy(f):
            return stencils.ddy(f, inv_2dy)

        def op_lap(f):
            return stencils.laplacian(f, inv_dx2, inv_dy2, inv_dz2)

        def op_div(u, v, w):
            return stencils.divergence(u, v, w, inv_2dx, inv_2dy,
                                       inv_2dz)

    if consistent:
        from ..poisson.nonuniform import NonuniformPoissonProblem
        problem = NonuniformPoissonProblem.from_grid(grid)
    else:
        problem = PoissonProblem(grid.nx, grid.ny, grid.nz, dx, dy,
                                 grid.dz0)
    pparams = poisson_params or PoissonParams()
    # An externally built (x, rhs) → PoissonResult pressure solve wins over
    # every maker below.  The sharded dispatch uses this to run the fused
    # shard_map multigrid (`parallel.fused_mg`) under the GSPMD jnp
    # predictor/corrector — MG's 2^k+1 grids sit outside the rolling
    # kernels' nx%128 support, so the V-cycles are the only fusable cost.
    poisson_solve = poisson_solve_override
    if poisson_solve is None and consistent:
        # Variable-coefficient solves only: the unmodified Krylov makers
        # (legitimate on the FV-symmetrized operator via the problem's
        # volume-weighted dot) or the generalized-eigenbasis direct
        # solve.  Stationary/MG formulas still assume uniform weights.
        method = Method(poisson_method)
        if method == Method.FFT_DIRECT:
            from ..poisson.nonuniform import make_nonuniform_direct
            poisson_solve = make_nonuniform_direct(
                problem, pparams, dtype=dtype,
                precision=spectral_precision)
        elif method in (Method.CG, Method.BICGSTAB):
            if differentiable:
                # exact one-extra-solve VJP: the consistent operator is
                # SPD in the V-weighted inner product, so the transpose
                # solve is the volume-conjugated forward solve
                # (`..poisson.adjoint`, nonuniform branch)
                from ..poisson.adjoint import make_adjoint_poisson
                poisson_solve = make_adjoint_poisson(problem, pparams,
                                                     method)
            else:
                poisson_solve = (make_cg if method == Method.CG
                                 else make_bicgstab)(problem, pparams)
        else:
            raise CFDError(
                Status.ERROR_UNSUPPORTED,
                f"consistent-scheme projection supports poisson_method "
                f"FFT_DIRECT/CG/BICGSTAB, got {method.name}")
    if poisson_solve is None and use_pallas \
            and Method(poisson_method) == Method.CG \
            and dtype == jnp.float32:
        from ..poisson.krylov import make_cg_fused
        poisson_solve = make_cg_fused(problem, pparams, dtype,
                                      interpret=pallas_interpret)
    if poisson_solve is None and use_pallas and dtype == jnp.float32:
        # Small grids (2D, or 3D volumes that fit VMEM): whole-solve VMEM
        # kernels (latency-bound sizes); the makers self-gate on size.
        from ..poisson.krylov import make_bicgstab_vmem, make_cg_vmem
        from ..poisson.stationary import make_redblack_sor_vmem
        vmem_makers = {Method.REDBLACK_SOR: make_redblack_sor_vmem,
                       Method.CG: make_cg_vmem,
                       Method.BICGSTAB: make_bicgstab_vmem}
        mk = vmem_makers.get(Method(poisson_method))
        if mk is not None:
            poisson_solve = mk(problem, pparams, dtype,
                               interpret=pallas_interpret)
    if poisson_solve is None and differentiable \
            and Method(poisson_method) != Method.FFT_DIRECT:
        from ..poisson.adjoint import make_adjoint_poisson
        poisson_solve = make_adjoint_poisson(problem, pparams,
                                             Method(poisson_method))
    if poisson_solve is None:
        if (Method(poisson_method) == Method.FFT_DIRECT
                and spectral_precision is not None):
            poisson_solve = make_fft_direct(problem, pparams,
                                            precision=spectral_precision)
        else:
            poisson_solve = _POISSON_MAKERS[Method(poisson_method)](
                problem, pparams)

    # Fully fused 2D path: one predictor+Poisson-input sweep and one
    # corrector sweep on the block-marching engine (float32, nx%128,
    # ny block-divisible; same gating exclusions as 3D).
    proj2d = None
    btilde2d = None
    split2d = bc_refresh is not None
    if (use_pallas and dtype == jnp.float32 and grid.nz == 1
            and params.source_func is None and not consistent):
        from ...ops.pallas.projection2d import (Projection2DKernels,
                                                projection2d_supported)
        if projection2d_supported(grid.ny, grid.nx,
                                  buoyant=params.buoyancy_enabled,
                                  split=split2d):
            import jax.lax as _lax
            from ..poisson.spectral import spectral_supported
            use_bt = (Method(poisson_method) == Method.FFT_DIRECT
                      and spectral_supported(problem))
            kern2_kwargs = dict(
                with_sources=(params.source_amplitude_u != 0.0
                              or params.source_amplitude_v != 0.0),
                beta=params.beta, T_ref=params.T_ref,
                gravity=params.gravity, interpret=pallas_interpret,
                split=split2d)

            def accept2d(pk):
                return pk.split_ok if split2d else pk.ok

            pk2 = None
            # DST-fused 2D path (r5, mirroring the 3D r4 structure): the
            # predictor emits the x-transformed b̃ in-kernel and the
            # corrector inverse-DSTs the pressure blocks on arrival —
            # only the TDMA-y line solve (+ dense low-mode rescue) runs
            # between the two sweeps; both standalone x-transform stages
            # disappear from the step.  With ``bc_refresh`` the two-pass
            # split kernels carry the same in-kernel transforms.
            if (use_bt and spectral_precision
                    in (None, _lax.Precision.HIGHEST,
                        _lax.Precision.HIGH)):
                from ..poisson.spectral import (dst2d_fused_supported,
                                                make_dst2d_fused_pieces)
                if (dst2d_fused_supported(problem)
                        and projection2d_supported(
                            grid.ny, grid.nx,
                            buoyant=params.buoyancy_enabled, dst=True,
                            split=split2d)):
                    fxT, gxT, ysolve = make_dst2d_fused_pieces(
                        problem, dtype, interpret=pallas_interpret,
                        precision=(spectral_precision
                                   or _lax.Precision.HIGHEST))
                    pk2d = Projection2DKernels(
                        grid.ny, grid.nx, dx, dy, grid.xmin, grid.ymin,
                        dtype, emit="btilde", dst_mats=(fxT, gxT),
                        dst_precision=spectral_precision, **kern2_kwargs)
                    if accept2d(pk2d):
                        pk2 = pk2d
                        btilde2d = ysolve
            if pk2 is None:
                pk2 = Projection2DKernels(
                    grid.ny, grid.nx, dx, dy, grid.xmin, grid.ymin, dtype,
                    emit="btilde" if use_bt else "rhs", **kern2_kwargs)
                if accept2d(pk2) and use_bt:
                    from ..poisson.spectral import make_fft_btilde_solver
                    # z_mode="auto": at kernel-shaped sizes the TDMA
                    # y-stage (VMEM-resident Thomas solve) replaces the
                    # two y-axis DST matmuls — same direct solve, half
                    # the transform's MXU work (ops/pallas/tdma.py).
                    btilde2d = make_fft_btilde_solver(
                        problem, pparams, z_mode="auto",
                        interpret=pallas_interpret,
                        **({} if spectral_precision is None
                           else {"precision": spectral_precision}))
            if accept2d(pk2):
                proj2d = pk2

    # Fully fused predictor/divergence/corrector (float32 3D, no custom
    # source callables in the kernels — those variants use the jnp path
    # below; Boussinesq buoyancy fuses into the predictor sweep, the energy
    # equation runs as a jnp post-step either way).
    proj_kernels = None
    btilde_pipeline = None
    dst_fused = False
    if (use_pallas and dtype == jnp.float32 and grid.nz > 2
            and params.source_func is None and not consistent):
        from ...ops.pallas.projection_kernels import (
            ProjectionKernels, projection_kernels_supported)
        from ..poisson.spectral import spectral_supported
        use_bt3 = (Method(poisson_method) == Method.FFT_DIRECT
                   and spectral_supported(problem))
        kern_kwargs = dict(
            with_sources=(params.source_amplitude_u != 0.0
                          or params.source_amplitude_v != 0.0),
            beta=params.beta, T_ref=params.T_ref,
            gravity=params.gravity, interpret=pallas_interpret)
        if projection_kernels_supported(grid.nz, grid.ny, grid.nx):
            pk = None
            # DST-fused mega path: the predictor kernel emits the
            # xy-transformed b̃ (in-kernel MXU dots overlapping the
            # streaming DMA) and the corrector inverse-DSTs x̂ planes as
            # they arrive — the whole spectral solve collapses to the
            # z-TDMA between the two sweeps (no standalone transform
            # stages, no full-field HBM round-trips).  HIGHEST-precision
            # contractions, matching the eigen/tdma pipelines.
            # With ``bc_refresh`` the mega predictor is bypassed but the
            # DST fusion survives: the standalone b̃ kernel carries the
            # same in-kernel transforms (+ Thomas forward carry), so the
            # refreshed path still runs predictor kernels → hook → b̃
            # kernel → backward substitution → DST corrector.
            def accept_dst(pk):
                if bc_refresh is None:
                    return pk.ok and pk.mega_ok
                return (pk.ok and pk.corr_all is not None
                        and pk.btilde_k is not None)

            if use_bt3:
                import jax.lax as _lax
                from ..poisson.spectral import (dst_fused_supported,
                                                make_dst_fused_pieces)
                if (dst_fused_supported(problem)
                        and spectral_precision
                        in (None, _lax.Precision.HIGHEST,
                            _lax.Precision.HIGH)):
                    # Preferred: Thomas forward sweep fused into the
                    # predictor (d′, t outputs) — only the backward
                    # substitution runs between the sweeps.  Falls back
                    # to the emit-b̃ + full-TDMA form if the 5-output
                    # predictor doesn't fit VMEM at this grid.
                    # ``spectral_precision=HIGH`` runs the in-kernel DST
                    # dots as 3-pass bf16 (the TDMA line solve stays f32
                    # exact either way) — ~5e-5-class relative solution
                    # error for ~2× cheaper MXU transforms, matching the
                    # eigen pipeline's HIGH trade.
                    mats, tfwd, zbwd = make_dst_fused_pieces(
                        problem, dtype, interpret=pallas_interpret,
                        fuse_fwd=True)
                    # HIGH already trades ~2e-5 relative pressure error
                    # for 2× cheaper transforms — the analytic-t reverse
                    # corrector (4e-6-class, tdma.py docs) is free at
                    # that budget and drops the t stream (one 0.5 GB
                    # write + read per 512³ step).  HIGHEST keeps
                    # "stored": bit-identical to the three-pass family.
                    pk_dst = ProjectionKernels(
                        grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                        grid.xmin, grid.ymin, dtype, emit="btilde",
                        dst_mats=mats, tdma_fwd=tfwd,
                        tdma_bwd=("analytic" if spectral_precision
                                  == _lax.Precision.HIGH else "stored"),
                        dst_precision=spectral_precision, **kern_kwargs)
                    if accept_dst(pk_dst):
                        pk = pk_dst
                        btilde_pipeline = zbwd
                        dst_fused = True
                    else:
                        mats, zsolve = make_dst_fused_pieces(
                            problem, dtype, interpret=pallas_interpret)
                        pk_dst = ProjectionKernels(
                            grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                            grid.xmin, grid.ymin, dtype, emit="btilde",
                            dst_mats=mats,
                            dst_precision=spectral_precision,
                            **kern_kwargs)
                        if accept_dst(pk_dst):
                            pk = pk_dst
                            btilde_pipeline = zsolve
                            dst_fused = True
            if pk is None:
                pk = ProjectionKernels(
                    grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                    grid.xmin, grid.ymin, dtype,
                    emit="btilde" if use_bt3 else "rhs", **kern_kwargs)
            if pk.ok:
                proj_kernels = pk
            # Spectral fast path: the btilde/pred_bt kernel feeds the DST
            # pipeline directly (no materialized Poisson rhs, no residual
            # diagnostics — exactness is certified by
            # tests/solvers/test_spectral.py).
            if (pk.ok and use_bt3 and not dst_fused
                    and (pk.btilde_k is not None or pk.mega_ok)):
                from ..poisson.spectral import make_fft_btilde_solver
                # z_mode="auto": the TDMA z-stage (Pallas Thomas solve)
                # replaces the two z-axis DST matmuls when the kernel
                # shape qualifies — same direct solve, ~30% cheaper
                # transform (ops/pallas/tdma.py).
                btilde_pipeline = make_fft_btilde_solver(
                    problem, pparams, z_mode="auto",
                    interpret=pallas_interpret,
                    **({} if spectral_precision is None
                       else {"precision": spectral_precision}))

    # Fused consistent-scheme (stretched x/y) projection: the mega kernels
    # swap per-point nonuniform weight pins for the uniform constants and
    # the generalized eigenbasis for the DST sines — the accuracy-superior
    # path no longer pays the jnp-speed penalty.  Mega kernels only
    # (FFT_DIRECT rides the eigenbasis-fused pieces with the in-predictor
    # Thomas forward sweep; CG/BiCGSTAB get the fused predictor/corrector
    # around the jnp FV-symmetrized Krylov solve); anything unsupported
    # falls back to the jnp body below.
    if (use_pallas and dtype == jnp.float32 and grid.nz > 2
            and params.source_func is None and consistent
            and bc_refresh is None):
        from ...ops.pallas.projection_kernels import (
            ProjectionKernels, projection_kernels_supported)
        from ...ops.pallas.stretch import stretch_spacing_ok
        method = Method(poisson_method)
        if (projection_kernels_supported(grid.nz, grid.ny, grid.nx)
                and stretch_spacing_ok(grid.dx, grid.dy)):
            import jax.lax as _lax
            from ..poisson.nonuniform import (make_nonuniform_fused_pieces,
                                              nonuniform_face_coeffs,
                                              nonuniform_fused_supported)
            kern_kwargs = dict(
                with_sources=(params.source_amplitude_u != 0.0
                              or params.source_amplitude_v != 0.0),
                beta=params.beta, T_ref=params.T_ref,
                gravity=params.gravity, interpret=pallas_interpret,
                stretch_consistent=(grid.dx, grid.dy, grid.x, grid.y),
                face_coeffs=nonuniform_face_coeffs(problem))
            pk = None
            if (method == Method.FFT_DIRECT
                    and nonuniform_fused_supported(problem)
                    and spectral_precision
                    in (None, _lax.Precision.HIGHEST,
                        _lax.Precision.HIGH)):
                mats, tfwd, zbwd = make_nonuniform_fused_pieces(
                    problem, dtype, interpret=pallas_interpret,
                    fuse_fwd=True)
                pk_e = ProjectionKernels(
                    grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                    grid.xmin, grid.ymin, dtype, emit="btilde",
                    dst_mats=mats, tdma_fwd=tfwd,
                    tdma_bwd=("analytic" if spectral_precision
                              == _lax.Precision.HIGH else "stored"),
                    dst_precision=spectral_precision, **kern_kwargs)
                if pk_e.mega_ok:
                    pk = pk_e
                    btilde_pipeline = zbwd
                    dst_fused = True
                else:
                    mats, zsolve = make_nonuniform_fused_pieces(
                        problem, dtype, interpret=pallas_interpret)
                    pk_e = ProjectionKernels(
                        grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                        grid.xmin, grid.ymin, dtype, emit="btilde",
                        dst_mats=mats, dst_precision=spectral_precision,
                        **kern_kwargs)
                    if pk_e.mega_ok:
                        pk = pk_e
                        btilde_pipeline = zsolve
                        dst_fused = True
            elif method in (Method.CG, Method.BICGSTAB):
                pk_e = ProjectionKernels(
                    grid.nz, grid.ny, grid.nx, dx, dy, grid.dz0,
                    grid.xmin, grid.ymin, dtype, emit="rhs",
                    **kern_kwargs)
                if pk_e.mega_ok:
                    pk = pk_e
            if pk is not None:
                proj_kernels = pk

    def fused_step(field: FlowField, dt, iter_idx):
        """Fully fused kernel path — identical math to the jnp body below."""
        dt = jnp.asarray(dt, dtype)
        decay = jnp.exp(-params.source_decay_rate * iter_idx * dt)
        su = params.source_amplitude_u * decay
        sv = params.source_amplitude_v * decay
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0)
        mega = proj_kernels.mega_ok and bc_refresh is None

        if mega:
            pred_outs = proj_kernels.predictor_poisson_input(
                field.u, field.v, field.w, field.p, dt, params.mu,
                su, sv, rho0 / dt, T=field.T)
            us, vs, ws = pred_outs[:3]
            # tdma-fused DST mode emits (d′, t); otherwise one plane set
            pin = pred_outs[3:] if len(pred_outs) == 5 else pred_outs[3]
        else:
            us, vs, ws = proj_kernels.predictor(
                field.u, field.v, field.w, dt, params.mu, su, sv,
                T=field.T)
            if bc_refresh is not None:
                us, vs, ws = bc_refresh(us, vs, ws, (iter_idx + 1) * dt)
            pin = None

        kernel_diag = proj_kernels.corr_all is not None
        if dst_fused:
            # pin is the xy-transformed b̃ (or its pre-swept (d′, t)
            # pair); only the z line solve (or just its backward
            # substitution) runs between the two mega sweeps, and the
            # corrector inverse-transforms x̂ in its streaming window,
            # returning the physical pressure as a fourth output.  On the
            # bc_refresh (non-mega) path the standalone b̃ kernel emits
            # the same transformed pin after the hook runs.
            if pin is None:
                pin = proj_kernels.btilde(us, vs, ws, field.p, rho0 / dt)
            residual = jnp.zeros((), dtype)
            poisson_ok = jnp.bool_(True)   # direct solve
            pin_t = pin if isinstance(pin, tuple) else (pin,)
            n_bwd = 1 if proj_kernels.bwd_analytic else 2
            if (proj_kernels.corr_bwd is not None
                    and len(pin_t) == n_bwd):
                # Reverse-march corrector: the Thomas backward
                # substitution rides the corrector sweep itself — the
                # whole spectral step is two marching kernels, nothing
                # in between.  pin is (d′, t), or just (d′,) in
                # analytic mode (t rebuilt in-kernel).
                u, v, w, p_new, m2i, pmaxi, pabsi = \
                    proj_kernels.corrector_bwd_diag(us, vs, ws, *pin_t,
                                                    dt / rho0)
            else:
                xhat = (btilde_pipeline(*pin) if isinstance(pin, tuple)
                        else btilde_pipeline(pin))
                u, v, w, p_new, m2i, pmaxi, pabsi = \
                    proj_kernels.corrector_diag(us, vs, ws, xhat,
                                                dt / rho0)
        else:
            if btilde_pipeline is not None:
                if pin is None:
                    pin = proj_kernels.btilde(us, vs, ws, field.p,
                                              rho0 / dt)
                p_new = btilde_pipeline(pin)
                residual = jnp.zeros((), dtype)
                poisson_ok = jnp.bool_(True)   # direct solve
            else:
                if pin is None:
                    pin = proj_kernels.rhs(us, vs, ws, rho0 / dt)
                pres = poisson_solve(field.p, pin)
                p_new = pres.x
                residual = pres.final_residual
                poisson_ok = pres.status == 0

            if kernel_diag:
                u, v, w, m2i, pmaxi, pabsi = proj_kernels.corrector_diag(
                    us, vs, ws, p_new, dt / rho0)
            else:
                u, v, w = proj_kernels.corrector(us, vs, ws, p_new,
                                                 dt / rho0)
        new_field = field.replace(u=u, v=v, w=w, p=p_new)

        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        if kernel_diag:
            # Fused diagnostics: kernel max-reductions cover the interior
            # planes; fold in the two z-shell planes with cheap face maxima
            # (exact parity with field_status_and_diagnostics).
            def m2_face(k):
                return jnp.max(u[k] ** 2 + v[k] ** 2 + w[k] ** 2)

            m2 = jnp.maximum(m2i, jnp.maximum(m2_face(0), m2_face(-1)))
            pmax = jnp.maximum(pmaxi, jnp.maximum(jnp.max(p_new[0]),
                                                  jnp.max(p_new[-1])))
            pabs = jnp.maximum(pabsi,
                               jnp.maximum(jnp.max(jnp.abs(p_new[0])),
                                           jnp.max(jnp.abs(p_new[-1]))))
            tmax = jnp.max(new_field.T)
            finite = jnp.isfinite(m2) & jnp.isfinite(pabs)
            vmax = jnp.sqrt(m2)
        else:
            finite, vmax, pmax, tmax = field_status_and_diagnostics(
                new_field)
        status = jnp.where(~finite, jnp.int32(-6),
                           jnp.where(poisson_ok, jnp.int32(0),
                                     jnp.int32(-7)))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=residual,
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    def fused_step_2d(field: FlowField, dt, iter_idx):
        """2D fused kernel path — identical math to the jnp body below."""
        dt = jnp.asarray(dt, dtype)
        decay = jnp.exp(-params.source_decay_rate * iter_idx * dt)
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0)

        if bc_refresh is None:
            us, vs, ws, pin = proj2d.predictor_and_poisson_input(
                field.u, field.v, field.w, field.p, dt, params.mu,
                params.source_amplitude_u * decay,
                params.source_amplitude_v * decay, rho0 / dt, T=field.T)
        else:
            # Two-pass split kernels: predictor sweep → caller BC hook →
            # b̃ sweep (the stale-shell fix at marching-kernel speed).
            us, vs, ws = proj2d.predictor(
                field.u, field.v, field.w, dt, params.mu,
                params.source_amplitude_u * decay,
                params.source_amplitude_v * decay, T=field.T)
            us, vs, ws = bc_refresh(us, vs, ws, (iter_idx + 1) * dt)
            pin = proj2d.poisson_input(us, vs, field.p, rho0 / dt)

        if btilde2d is not None:
            residual = jnp.zeros((), dtype)
            poisson_ok = jnp.bool_(True)   # direct solve
            if proj2d.dst:
                # pin is the x-transformed b̃; the TDMA-y stage solves the
                # per-mode lines and the corrector inverse-transforms x̂
                # blocks on arrival, returning physical p as a 3rd output
                xhat = btilde2d(pin)
                u, v, p_new = proj2d.corrector(us, vs, xhat, dt / rho0)
            else:
                p_new = btilde2d(pin)
                u, v = proj2d.corrector(us, vs, p_new, dt / rho0)
        else:
            pres = poisson_solve(field.p, pin)
            p_new = pres.x
            residual = pres.final_residual
            poisson_ok = pres.status == 0
            u, v = proj2d.corrector(us, vs, p_new, dt / rho0)
        # w-correction is identically zero in 2D (inv_dz2 = 0).
        new_field = field.replace(u=u, v=v, w=ws, p=p_new)

        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6),
                           jnp.where(poisson_ok, jnp.int32(0),
                                     jnp.int32(-7)))
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=residual,
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    def step(field: FlowField, dt, iter_idx):
        if proj_kernels is not None:
            return fused_step(field, dt, iter_idx)
        if proj2d is not None:
            return fused_step_2d(field, dt, iter_idx)
        u, v, w, p = field.u, field.v, field.w, field.p

        # ---- Predictor: u* = u + dt(−u·∇u + ν∇²u + f) --------------------
        du_dx = op_ddx(u)
        du_dy = op_ddy(u)
        du_dz = stencils.ddz(u, inv_2dz)
        dv_dx = op_ddx(v)
        dv_dy = op_ddy(v)
        dv_dz = stencils.ddz(v, inv_2dz)
        dw_dx = op_ddx(w)
        dw_dy = op_ddy(w)
        dw_dz = stencils.ddz(w, inv_2dz)

        conv_u = u * du_dx + v * du_dy + w * du_dz
        conv_v = u * dv_dx + v * dv_dy + w * dv_dz
        conv_w = u * dw_dx + v * dw_dy + w * dw_dz

        visc_u = nu * op_lap(u)
        visc_v = nu * op_lap(v)
        visc_w = nu * op_lap(w)

        su, sv, sw = source_terms(coords, params, iter_idx, dt)
        if params.buoyancy_enabled:
            bu, bv, bw = compute_buoyancy(field.T, params.beta, params.T_ref,
                                          params.gravity)
            su, sv, sw = su + bu, sv + bv, sw + bw

        u_star_i = clamp(u + dt * (-conv_u + visc_u + su), PROJ_MAX_VELOCITY)
        v_star_i = clamp(v + dt * (-conv_v + visc_v + sv), PROJ_MAX_VELOCITY)
        w_star_i = clamp(w + dt * (-conv_w + visc_w + sw), PROJ_MAX_VELOCITY)

        # Interior-only update keeps caller-set boundaries on u*
        # (the reference's copy_boundary_velocities_3d at `:187-189`).
        u_star = stencils.set_interior(u, u_star_i)
        v_star = stencils.set_interior(v, v_star_i)
        w_star = stencils.set_interior(w, w_star_i)
        if bc_refresh is not None:
            # opt-in: caller BCs re-applied at the predictor's time level,
            # killing the stale-shell edge divergence (see docstring)
            u_star, v_star, w_star = bc_refresh(u_star, v_star, w_star,
                                                (iter_idx + 1) * dt)

        # ---- Poisson: ∇²p = (ρ/dt)·∇·u* ----------------------------------
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0)
        div = op_div(u_star, v_star, w_star)
        rhs = problem.zero_boundary((rho0 / dt) * div)

        pres = poisson_solve(p, rhs)
        p_new = pres.x
        poisson_ok = pres.status == 0  # PoissonStatus.CONVERGED

        # ---- Corrector: u = u* − (dt/ρ)∇p --------------------------------
        dt_over_rho = dt / rho0
        u_corr = clamp(u_star - dt_over_rho * op_ddx(p_new),
                       PROJ_MAX_VELOCITY)
        v_corr = clamp(v_star - dt_over_rho * op_ddy(p_new),
                       PROJ_MAX_VELOCITY)
        w_corr = clamp(w_star - dt_over_rho * stencils.ddz(p_new, inv_2dz),
                       PROJ_MAX_VELOCITY)

        new_field = field.replace(
            u=stencils.set_interior(u_star, u_corr),
            v=stencils.set_interior(v_star, v_corr),
            w=stencils.set_interior(w_star, w_corr),
            p=p_new)

        # ---- Energy + thermal BCs (`:256-268`) ---------------------------
        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        # ---- Restore caller boundary velocities (`:277-278`) -------------
        ru, rv, rw = copy_boundary_velocities(
            new_field.u, new_field.v, new_field.w, u_star, v_star, w_star)
        new_field = new_field.replace(u=ru, v=rv, w=rw)

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6),          # DIVERGED
                           jnp.where(poisson_ok, jnp.int32(0),
                                     jnp.int32(-7)))        # MAX_ITER
        return new_field, StepResult(iterations=jnp.int32(1), status=status,
                                     residual=pres.final_residual,
                                     max_velocity=vmax, max_pressure=pmax,
                                     max_temperature=tmax)

    return step


def make_projection_solve(grid: Grid, params: NSParams, dtype=None,
                          poisson_method: Method = Method.CG,
                          poisson_params: PoissonParams = None):
    step = make_projection_step(grid, params, dtype, poisson_method,
                                poisson_params)

    @jax.jit
    def solve(field: FlowField, dt):
        return iterate_with_divergence_guard(step, field, dt, params.max_iter)

    return solve
