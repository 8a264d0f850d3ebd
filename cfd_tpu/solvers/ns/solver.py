"""The pluggable NSSolver object — the vtable made Pythonic.

Re-design of `struct NSSolver` (`navier_stokes_solver.h:254-277`) and the
per-solver wrapper structs in `solver_registry.c`: one class whose
``init`` builds jitted step/solve closures for a (grid, params) pair, with
the same lifecycle (create → init → step/solve → destroy == GC) and the same
stats reporting.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Callable, Optional

from ...core.field import FlowField
from ...core.grid import Grid
from ...core.status import CFDError, Status
from ...core.features import Backend
from ..poisson.base import Method as PoissonMethod
from ..poisson.base import PoissonParams
from .common import compute_dt as _compute_dt
from .common import iterate_with_divergence_guard
from .euler import make_euler_step
from .params import NSParams, NSStats, StepResult
from .projection import make_projection_step
from .rk import make_rk2_step, make_rk4_step

import jax


class Capability(enum.IntFlag):
    """Mirrors ns_solver_capabilities_t (`navier_stokes_solver.h:183-192`)."""

    NONE = 0
    INCOMPRESSIBLE = 1 << 0
    COMPRESSIBLE = 1 << 1
    STEADY_STATE = 1 << 2
    TRANSIENT = 1 << 3
    SIMD = 1 << 4
    PARALLEL = 1 << 5
    GPU = 1 << 6


_STEP_BUILDERS = {
    "explicit_euler": make_euler_step,
    "rk2": make_rk2_step,
    "rk4": make_rk4_step,
    "projection": make_projection_step,
}


@dataclasses.dataclass
class NSSolver:
    """A named, configured NS time integrator.

    ``method`` ∈ {explicit_euler, rk2, rk4, projection}; ``backend`` is the
    reference-compat tag (all map to the XLA path).
    """

    name: str
    method: str
    description: str = ""
    version: str = "1.0"
    backend: Backend = Backend.SCALAR
    capabilities: Capability = (Capability.INCOMPRESSIBLE
                                | Capability.TRANSIENT | Capability.SIMD
                                | Capability.PARALLEL)
    poisson_method: PoissonMethod = PoissonMethod.CG
    poisson_params: Optional[PoissonParams] = None
    #: projection-only performance knob (framework extension): in-kernel
    #: spectral transform precision for the DST-fused fast paths.  None =
    #: exact (HIGHEST); ``jax.lax.Precision.HIGH`` = bf16_3x transforms,
    #: ~1.4× faster steps at ~2e-5-class relative pressure error
    #: (docs/performance.md).  Honored single-chip and on meshes.
    spectral_precision: Optional[object] = None
    #: multi-chip placement: when set (a `jax.sharding.Mesh`), `init` builds
    #: the step/solve closures through `parallel.make_sharded_raw_step`, so
    #: both single steps and the whole guarded solve loop run as one GSPMD
    #: program over the mesh (the facade's TPU-native stand-in for the
    #: reference's per-solver backend matrix — SURVEY.md §2.9).
    mesh: Optional[object] = None

    # bound at init()
    grid: Optional[Grid] = None
    params: Optional[NSParams] = None
    _step_fn: Optional[Callable] = None
    _solve_fn: Optional[Callable] = None
    _place_fn: Optional[Callable] = None

    def init(self, grid: Grid, params: NSParams) -> Status:
        """Build jitted step/solve closures (mirrors solver_init)."""
        self.grid = grid
        self.params = params
        out_shardings = None
        if self.mesh is not None:
            from ...parallel.sharded import make_sharded_raw_step
            kw = {}
            if self.method == "projection":
                kw = dict(poisson_method=self.poisson_method,
                          poisson_params=self.poisson_params,
                          spectral_precision=self.spectral_precision)
            raw_step, out_field, self._place_fn = make_sharded_raw_step(
                grid, params, self.mesh, self.method, **kw)
            out_shardings = (out_field, None)
        elif self.method == "projection":
            raw_step = make_projection_step(
                grid, params, poisson_method=self.poisson_method,
                poisson_params=self.poisson_params,
                spectral_precision=self.spectral_precision)
        else:
            raw_step = _STEP_BUILDERS[self.method](grid, params)
        self._step_fn = jax.jit(raw_step, out_shardings=out_shardings)

        max_iter = params.max_iter

        def solve(field, dt):
            return iterate_with_divergence_guard(raw_step, field, dt, max_iter)

        self._solve_fn = jax.jit(solve, out_shardings=out_shardings)
        return Status.SUCCESS

    def place(self, field: FlowField) -> FlowField:
        """Shard a host/single-device field over the solver's mesh (identity
        when the solver is single-device)."""
        return field if self._place_fn is None else self._place_fn(field)

    def _require_init(self):
        if self._step_fn is None:
            raise CFDError(Status.ERROR_INVALID, "solver not initialized")

    def step(self, field: FlowField, dt: Optional[float] = None,
             iter_idx: int = 0):
        """One time step (mirrors solver_step); returns (field, NSStats)."""
        self._require_init()
        dt = self.params.dt if dt is None else dt
        t0 = time.perf_counter()
        new_field, res = self._step_fn(field, dt, iter_idx)
        new_field.u.block_until_ready()
        ms = (time.perf_counter() - t0) * 1e3
        return new_field, self._stats(res, dt, ms)

    def solve(self, field: FlowField, dt: Optional[float] = None):
        """max_iter steps (mirrors solver_solve); returns (field, NSStats)."""
        self._require_init()
        dt = self.params.dt if dt is None else dt
        t0 = time.perf_counter()
        new_field, res = self._solve_fn(field, dt)
        new_field.u.block_until_ready()
        ms = (time.perf_counter() - t0) * 1e3
        return new_field, self._stats(res, dt, ms)

    def step_result(self, field: FlowField, dt, iter_idx=0):
        """Device-side step (no host sync) for embedding in larger jits."""
        self._require_init()
        return self._step_fn(field, dt, iter_idx)

    def apply_boundary(self, field: FlowField) -> FlowField:
        """Default periodic BCs on all variables (solver_apply_boundary)."""
        from ...boundary.apply import apply_periodic_field
        return apply_periodic_field(field)

    def compute_dt(self, field: FlowField) -> float:
        self._require_init()
        return _compute_dt(field, self.grid, self.params)

    def _stats(self, res: StepResult, dt, ms) -> NSStats:
        status_code = int(res.status)
        dmin = min(float(self.grid.dx.min()), float(self.grid.dy.min()))
        vmax = float(res.max_velocity)
        return NSStats(
            iterations=int(res.iterations),
            residual=float(res.residual),
            max_velocity=vmax,
            max_pressure=float(res.max_pressure),
            max_temperature=float(res.max_temperature),
            cfl_number=vmax * float(dt) / dmin if dmin > 0 else 0.0,
            elapsed_time_ms=ms,
            status=Status(status_code) if status_code else Status.SUCCESS)
