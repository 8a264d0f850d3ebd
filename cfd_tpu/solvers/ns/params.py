"""Navier-Stokes solver parameters and statistics.

Re-design of ns_solver_params_t / ns_solver_stats_t
(`navier_stokes_solver.h:121-207`).  Parameters are *build-time static*
configuration: step functions are built per (grid, params) closure, so XLA
constant-folds every coefficient — the TPU analogue of the reference's
solver_init(params) contract.  Only (field, dt, iter) flow through the jitted
step dynamically (dt changes per step under CFL control).

The C host callbacks become jax-traceable callables:

* ``source_func(X, Y, Z, t) -> (su, sv, sw)`` arrays — replaces
  ns_source_func_t (`navier_stokes_solver.h:77-80`);
* ``heat_source_func(X, Y, Z, t) -> Q`` — replaces ns_heat_source_func_t.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...boundary.types import ThermalBCConfig
from ...core.status import Status

# Defaults (`navier_stokes_solver.h:37-49`).
DEFAULT_TIME_STEP = 0.001
DEFAULT_CFL_NUMBER = 0.2
DEFAULT_GAMMA = 1.4
DEFAULT_VISCOSITY = 0.01
DEFAULT_THERMAL_CONDUCTIVITY = 0.0242
DEFAULT_MAX_ITERATIONS = 100
DEFAULT_TOLERANCE = 1e-6
DEFAULT_SOURCE_AMPLITUDE_U = 0.1
DEFAULT_SOURCE_AMPLITUDE_V = 0.05
DEFAULT_SOURCE_DECAY_RATE = 0.1
DEFAULT_PRESSURE_COUPLING = 0.1

# Stability limits (`solver_explicit_euler.c:24-55`).
MAX_DERIVATIVE_LIMIT = 100.0
MAX_SECOND_DERIVATIVE_LIMIT = 1000.0
MAX_VELOCITY_LIMIT = 100.0
MAX_DIVERGENCE_LIMIT = 10.0
UPDATE_LIMIT = 1.0
DT_MAX_LIMIT = 0.01
DT_MIN_LIMIT = 1e-6
DT_CONSERVATIVE_LIMIT = 1e-4
VELOCITY_EPSILON = 1e-20
SPEED_EPSILON = 1e-10

# Projection limits (`solver_projection.c:40-41`).
PROJ_MAX_VELOCITY = 100.0
PROJ_MAX_PRESSURE = 1000.0


@dataclasses.dataclass(frozen=True)
class NSParams:
    """Mirrors ns_solver_params_t with the same defaults
    (ns_solver_params_default, `solver_explicit_euler.c:58-78`)."""

    dt: float = DEFAULT_TIME_STEP
    cfl: float = DEFAULT_CFL_NUMBER
    gamma: float = DEFAULT_GAMMA
    mu: float = DEFAULT_VISCOSITY
    k: float = DEFAULT_THERMAL_CONDUCTIVITY
    max_iter: int = DEFAULT_MAX_ITERATIONS
    tolerance: float = DEFAULT_TOLERANCE
    source_amplitude_u: float = DEFAULT_SOURCE_AMPLITUDE_U
    source_amplitude_v: float = DEFAULT_SOURCE_AMPLITUDE_V
    source_decay_rate: float = DEFAULT_SOURCE_DECAY_RATE
    pressure_coupling: float = DEFAULT_PRESSURE_COUPLING
    source_func: Optional[Callable] = None
    alpha: float = 0.0
    beta: float = 0.0
    T_ref: float = 0.0
    gravity: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    heat_source_func: Optional[Callable] = None
    thermal_bc: ThermalBCConfig = ThermalBCConfig()
    # Framework extension (no reference counterpart): x/y derivative
    # stencils on stretched grids.  "parity" = the reference's per-point
    # forward-spacing formulas (`solver_explicit_euler.c:409` — only
    # O(h)-consistent off uniform grids); "consistent" = exact 3-point
    # nonuniform weights (O(h²) on smoothly graded grids; identical to
    # parity on uniform grids).  See `common.spacing_operators`.
    nonuniform_scheme: str = "parity"

    def __post_init__(self):
        # Validate eagerly: the fused TPU dispatchers only test for
        # "consistent", so a typo here would otherwise silently select
        # the parity kernels.
        if self.nonuniform_scheme not in ("parity", "consistent"):
            raise ValueError(
                f"nonuniform_scheme must be 'parity' or 'consistent', "
                f"got {self.nonuniform_scheme!r}")

    def replace(self, **kw) -> "NSParams":
        return dataclasses.replace(self, **kw)

    @property
    def energy_enabled(self) -> bool:
        from ..energy import static_bool
        return static_bool(self.alpha > 0.0)

    @property
    def buoyancy_enabled(self) -> bool:
        from ..energy import static_bool
        return static_bool(self.beta != 0.0)


@dataclasses.dataclass
class NSStats:
    """Mirrors ns_solver_stats_t (`navier_stokes_solver.h:198-207`)."""

    iterations: int = 0
    residual: float = 0.0
    max_velocity: float = 0.0
    max_pressure: float = 0.0
    max_temperature: float = 0.0
    cfl_number: float = 0.0
    elapsed_time_ms: float = 0.0
    status: Status = Status.SUCCESS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepResult:
    """Device-side per-solve diagnostics carried out of the jitted loop."""

    iterations: jax.Array     # int32: steps actually applied
    status: jax.Array         # int32 Status code (0 ok, -6 diverged, -7 max_iter)
    residual: jax.Array       # method-specific (projection: poisson residual)
    max_velocity: jax.Array
    max_pressure: jax.Array
    max_temperature: jax.Array

    @property
    def diverged(self):
        return self.status == Status.ERROR_DIVERGED


def default_source_terms(X, Y, params: NSParams, iter_idx, dt):
    """Default decaying sinusoidal momentum source
    (compute_source_terms, `solver_explicit_euler.c:317-333`)."""
    t = iter_idx * dt
    decay = jnp.exp(-params.source_decay_rate * t)
    su = params.source_amplitude_u * jnp.sin(jnp.pi * Y) * decay
    sv = params.source_amplitude_v * jnp.sin(2.0 * jnp.pi * X) * decay
    return su, sv, 0.0


def source_terms(coords, params: NSParams, iter_idx, dt):
    """Source dispatch: custom traceable callable or the default."""
    X, Y, Z = coords
    if params.source_func is not None:
        t = iter_idx * dt
        return params.source_func(X, Y, Z, t)
    return default_source_terms(X, Y, params, iter_idx, dt)
