"""Sharded solver entry points.

The solver step functions in `cfd_tpu.solvers` are pure array programs
(rolls, slices, masked updates, reductions), so running them multi-chip is a
*placement* decision, not a code fork: jit the same step with sharded inputs
and XLA GSPMD partitions the stencils (halo collective-permutes) and the CG
reductions (all-reduces) over ICI.  These helpers package that decision.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from ..core.field import FlowField
from ..core.grid import Grid
from ..solvers.ns.params import NSParams
from ..solvers.ns.projection import make_projection_step
from ..solvers.ns.euler import make_euler_step
from ..solvers.ns.rk import make_rk2_step, make_rk4_step
from .mesh import field_sharding, shard_field

_BUILDERS = {
    "explicit_euler": make_euler_step,
    "rk2": make_rk2_step,
    "rk4": make_rk4_step,
    "projection": make_projection_step,
}


def _make_sharded_mg_projection(grid: Grid, params: NSParams, mesh: Mesh,
                                dtype, kw):
    """Projection step with the fused shard_map multigrid pressure solve
    (`.fused_mg`), jnp GSPMD predictor/corrector.  Returns the raw step,
    or a human-readable disqualifier string."""
    from ..solvers.poisson.base import PoissonParams, PoissonProblem
    from .fused import _mesh_zy_sizes
    from .fused_mg import (make_multigrid_sharded,
                           mg_fused_sharded_unsupported_reason)

    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        return ("fused sharded multigrid needs a mesh over ('z'[, 'y']) "
                f"axes (got axes {dict(mesh.shape)})")
    problem = PoissonProblem(grid.nx, grid.ny, grid.nz,
                             grid.dx0, grid.dy0, grid.dz0)
    reason = mg_fused_sharded_unsupported_reason(problem, sizes[0], dtype,
                                                 sizes[1])
    if reason is not None:
        return reason
    try:
        mg_solve = make_multigrid_sharded(
            problem, kw.get("poisson_params") or PoissonParams(), mesh,
            dtype=dtype, interpret=kw.get("pallas_interpret"))
        return make_projection_step(
            grid, params, dtype=dtype,
            poisson_method=kw.get("poisson_method"),
            poisson_params=kw.get("poisson_params"),
            use_pallas=False, poisson_solve_override=mg_solve)
    except ValueError as e:
        return str(e)


def make_sharded_raw_step(grid: Grid, params: NSParams, mesh: Mesh,
                          method: str = "projection", **kw):
    """Build the *raw* (unjitted) sharded step.

    Returns ``(raw_step, out_field_shardings, place_fn)``: callers jit
    ``raw_step`` themselves — directly for single-step use, or inside a
    larger program (e.g. `iterate_with_divergence_guard` for a sharded
    multi-step solve, as the `Simulation` facade does) with
    ``out_shardings`` built from ``out_field_shardings``.  Selection logic
    and keywords are those of `make_sharded_step`.
    """
    import jax.numpy as jnp

    from ..core.logging import warning
    from .fused import (fused_sharded_unsupported_reason,
                        make_fused_sharded_projection_step)

    up = kw.pop("use_pallas", None)
    if up is None:
        # Auto-on-TPU, mirroring the single-chip builders: the SHARDED
        # dispatch level is safe to auto-enable (it selects the shard_map
        # fused paths with their explicit ring halos — never the
        # single-chip kernels under GSPMD), and callers like the
        # `Simulation` facade get kernel speed without opting in.
        # Non-qualifying configs fall back with a logged warning.
        up = mesh.devices.flat[0].platform == "tpu"
    use_pallas = bool(up or kw.pop("use_pallas_cg", False))
    kw.pop("use_pallas_cg", None)
    strict = bool(kw.pop("strict", False))

    def fallback(reason):
        if strict:
            raise ValueError(
                f"use_pallas strict: fused sharded {method} unavailable: "
                f"{reason}")
        warning("parallel", "use_pallas: %s; falling back to the "
                "GSPMD jnp path", reason)

    def finish(raw):
        sharding = field_sharding(mesh, grid.nz > 1, grid.shape)
        out_field = FlowField(u=sharding, v=sharding, w=sharding,
                              p=sharding, rho=sharding, T=sharding)
        return raw, out_field, lambda field: shard_field(field, mesh)

    if use_pallas:
        dtype = kw.get("dtype") or jnp.float32
        if method == "explicit_euler":
            from .fused import (fused_sharded_euler_unsupported_reason,
                                make_fused_sharded_euler_step)
            reason = fused_sharded_euler_unsupported_reason(grid, params,
                                                            mesh, dtype)
            if reason is None:
                # Build failures past the generic gate fall back rather
                # than raise, unless strict (mirrors projection).
                try:
                    return finish(make_fused_sharded_euler_step(
                        grid, params, mesh, dtype=dtype,
                        interpret=kw.get("pallas_interpret")))
                except ValueError as e:
                    reason = str(e)
            fallback(reason)
        elif method in ("rk2", "rk4"):
            from .fused import (fused_sharded_rk_unsupported_reason,
                                make_fused_sharded_rk_step)
            reason = fused_sharded_rk_unsupported_reason(grid, params,
                                                         mesh, dtype)
            if reason is None:
                try:
                    return finish(make_fused_sharded_rk_step(
                        grid, params, mesh,
                        order=2 if method == "rk2" else 4,
                        dtype=dtype, interpret=kw.get("pallas_interpret")))
                except ValueError as e:
                    reason = str(e)
            fallback(reason)
        elif method != "projection":
            fallback(f"no fused sharded {method} step")
        else:
            pm = kw.get("poisson_method")
            from ..solvers.poisson.base import Method
            if pm is not None and Method(pm) == Method.MULTIGRID:
                # Fused sharded multigrid pressure solve under the GSPMD
                # jnp predictor/corrector: MG's coarsenable (2^k+1) grids
                # sit outside the rolling predictor kernels' support
                # (nx%128, nz%P), so the shard_map wavefront V-cycles —
                # the dominant per-step cost — are the fusable part.
                raw = _make_sharded_mg_projection(grid, params, mesh,
                                                  dtype, kw)
                if not isinstance(raw, str):
                    return finish(raw)
                fallback(raw)
                kw.setdefault("use_pallas", False)
                return finish(_BUILDERS[method](grid, params, **kw))
            reason = fused_sharded_unsupported_reason(grid, params, mesh,
                                                      dtype)
            if pm is not None and Method(pm) not in (Method.FFT_DIRECT,
                                                     Method.CG,
                                                     Method.BICGSTAB):
                reason = reason or (f"no fused sharded {Method(pm).name} "
                                    "pressure solve (FFT_DIRECT/CG/"
                                    "BICGSTAB only)")
            if (pm is not None and Method(pm) != Method.FFT_DIRECT
                    and grid.nz <= 2):
                reason = reason or (f"no fused sharded 2D {Method(pm).name}"
                                    " pressure solve (FFT_DIRECT only)")
            if reason is None:
                # Build failures past the generic gate (e.g. a CG shape or
                # preconditioner the fused sharded CG can't take) also fall
                # back rather than raise, unless strict.
                try:
                    return finish(make_fused_sharded_projection_step(
                        grid, params, mesh, dtype=dtype,
                        poisson_params=kw.get("poisson_params"),
                        poisson_method=pm,
                        interpret=kw.get("pallas_interpret"),
                        spectral_precision=kw.get("spectral_precision")))
                except ValueError as e:
                    reason = str(e)
            fallback(reason)
    # Explicit off for every builder: the single-chip kernels' auto-on-TPU
    # default must never engage under GSPMD partitioning (shard-boundary
    # shell passthrough / periodic wraps would be silently wrong).
    kw.setdefault("use_pallas", False)
    return finish(_BUILDERS[method](grid, params, **kw))


def make_sharded_step(grid: Grid, params: NSParams, mesh: Mesh,
                      method: str = "projection", **kw):
    """Build a jitted step whose outputs stay sharded over the mesh.

    Returns (step_fn, place_fn): ``place_fn(field)`` shards the initial
    state; ``step_fn(field, dt, iter)`` runs one step with all collectives
    inside the single XLA program.

    ``use_pallas=True`` selects the fused multi-chip fast path (`.fused`:
    shard_map + ring-halo rolling kernels; projection adds the
    pencil-transpose DST or the ring-halo fused CG per ``poisson_method``,
    and a y-decomposed 2D variant) for every integrator when the
    mesh/grid qualify; otherwise it falls back to the GSPMD jnp step with
    a logged warning — the single-chip manual-DMA kernels are never run
    under GSPMD partitioning, where their shell passthrough would be
    silently wrong at shard boundaries.  Default (None) is
    auto-on-TPU: fused when the mesh devices are TPUs and the config
    qualifies, GSPMD jnp otherwise (so `Simulation(mesh=...)` sessions
    get kernel speed without opting in); pass ``use_pallas=False`` to
    force the jnp path.
    ``strict=True`` turns that silent fallback into a ValueError carrying
    the disqualifying reason, for callers who *require* kernel speed.
    """
    raw, out_field, place = make_sharded_raw_step(grid, params, mesh,
                                                  method, **kw)
    step = jax.jit(raw, out_shardings=(out_field, None))
    return step, place
