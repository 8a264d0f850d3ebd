"""Solver registry: name → factory, with backend tags and availability.

Re-design of `lib/src/api/solver_registry.c` (1694 LoC of C vtable plumbing
→ a dict).  The same 16 default solver names register
(`solver_registry.c:213-249`); backend is inferred from the name suffix
(`:253-270`); ``create_checked`` validates backend availability
(`:383-407`).  On TPU every name maps to the same XLA implementation — the
suffixes survive so code written against the reference's registry behaves
identically, with CUDA-suffixed names gated on an accelerator being present.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from ..core.features import Backend, backend_is_available
from ..core.status import CFDError, Status, set_error
from ..solvers.ns.solver import Capability, NSSolver, PoissonMethod

# Standard built-in solver type names (`navier_stokes_solver.h:376-391`).
SOLVER_TYPE_EXPLICIT_EULER = "explicit_euler"
SOLVER_TYPE_EXPLICIT_EULER_OPTIMIZED = "explicit_euler_optimized"
SOLVER_TYPE_EXPLICIT_EULER_OMP = "explicit_euler_omp"
SOLVER_TYPE_EXPLICIT_EULER_GPU = "explicit_euler_gpu"
SOLVER_TYPE_PROJECTION = "projection"
SOLVER_TYPE_PROJECTION_OPTIMIZED = "projection_optimized"
SOLVER_TYPE_PROJECTION_OMP = "projection_omp"
SOLVER_TYPE_PROJECTION_GPU = "projection_gpu"
SOLVER_TYPE_RK2 = "rk2"
SOLVER_TYPE_RK2_OPTIMIZED = "rk2_optimized"
SOLVER_TYPE_RK2_OMP = "rk2_omp"
SOLVER_TYPE_RK2_GPU = "rk2_gpu"
SOLVER_TYPE_RK4 = "rk4"
SOLVER_TYPE_RK4_OPTIMIZED = "rk4_optimized"
SOLVER_TYPE_RK4_OMP = "rk4_omp"
SOLVER_TYPE_RK4_GPU = "rk4_gpu"

# TPU extensions beyond the reference's 16: projection with the exact
# spectral (DST-I) pressure solve (uniform grids only), and projection
# with the multigrid pressure solve (coarsenable 2^k+1-style grids; the
# reference declares POISSON_METHOD_MULTIGRID but never implements it).
SOLVER_TYPE_PROJECTION_SPECTRAL = "projection_spectral"
SOLVER_TYPE_PROJECTION_MULTIGRID = "projection_multigrid"


def infer_backend(name: str) -> Backend:
    """Backend from name suffix (`solver_registry.c:253-270`)."""
    if name.endswith("_gpu"):
        return Backend.CUDA
    if name.endswith("_omp"):
        return Backend.OMP
    if name.endswith("_optimized"):
        return Backend.SIMD
    return Backend.SCALAR


def _base_method(name: str) -> str:
    for suffix in ("_optimized", "_omp", "_gpu"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    return name


_DESCRIPTIONS = {
    "explicit_euler": "Explicit Euler time integration",
    "rk2": "RK2 (Heun) time integration, O(dt^2)",
    "rk4": "Classical RK4 time integration, O(dt^4)",
    "projection": "Chorin projection method (pressure Poisson)",
    "projection_spectral": ("Chorin projection with exact spectral (DST-I) "
                            "pressure solve — uniform grids"),
    "projection_multigrid": ("Chorin projection with multigrid pressure "
                             "solve — coarsenable grids, O(N) iterative"),
}


def _default_factory(name: str) -> Callable[[], NSSolver]:
    method = _base_method(name)
    backend = infer_backend(name)
    poisson_method = PoissonMethod.CG
    if name == SOLVER_TYPE_PROJECTION_SPECTRAL:
        method, poisson_method = "projection", PoissonMethod.FFT_DIRECT
    elif name == SOLVER_TYPE_PROJECTION_MULTIGRID:
        method, poisson_method = "projection", PoissonMethod.MULTIGRID

    def factory() -> NSSolver:
        caps = (Capability.INCOMPRESSIBLE | Capability.TRANSIENT
                | Capability.SIMD | Capability.PARALLEL)
        if backend == Backend.CUDA:
            caps |= Capability.GPU
        return NSSolver(name=name, method=method,
                        description=_DESCRIPTIONS.get(
                            _base_method(name), ""),
                        backend=backend, capabilities=caps,
                        poisson_method=poisson_method)

    return factory


class SolverRegistry:
    """Per-simulation registry (context-bound, not global — matching the
    reference's design choice)."""

    def __init__(self):
        self._factories: Dict[str, Callable[[], NSSolver]] = {}

    def register_defaults(self) -> None:
        """Register the 16 built-in solvers (`solver_registry.c:213-249`).
        Unlike the C build, nothing is compile-time gated: OMP names are
        always available (XLA parallelizes), GPU names register and are
        gated at create_checked time on accelerator presence."""
        for name in (
                SOLVER_TYPE_EXPLICIT_EULER,
                SOLVER_TYPE_EXPLICIT_EULER_OPTIMIZED,
                SOLVER_TYPE_EXPLICIT_EULER_OMP,
                SOLVER_TYPE_EXPLICIT_EULER_GPU,
                SOLVER_TYPE_PROJECTION,
                SOLVER_TYPE_PROJECTION_OPTIMIZED,
                SOLVER_TYPE_PROJECTION_OMP,
                SOLVER_TYPE_PROJECTION_GPU,
                SOLVER_TYPE_RK2,
                SOLVER_TYPE_RK2_OPTIMIZED,
                SOLVER_TYPE_RK2_OMP,
                SOLVER_TYPE_RK2_GPU,
                SOLVER_TYPE_RK4,
                SOLVER_TYPE_RK4_OPTIMIZED,
                SOLVER_TYPE_RK4_OMP,
                SOLVER_TYPE_RK4_GPU,
                SOLVER_TYPE_PROJECTION_SPECTRAL,   # TPU extension
                SOLVER_TYPE_PROJECTION_MULTIGRID,  # TPU extension
        ):
            self.register(name, _default_factory(name))

    def register(self, name: str, factory: Callable[[], NSSolver]) -> int:
        if not name or factory is None:
            return -1
        self._factories[name] = factory
        return 0

    def unregister(self, name: str) -> int:
        return 0 if self._factories.pop(name, None) is not None else -1

    def list(self) -> List[str]:
        return list(self._factories)

    def list_by_backend(self, backend: Backend) -> List[str]:
        return [n for n in self._factories if infer_backend(n) == backend]

    def has(self, name: str) -> bool:
        return name in self._factories

    def describe(self, name: str) -> Optional[str]:
        f = self._factories.get(name)
        return f().description if f else None

    def create(self, name: str) -> Optional[NSSolver]:
        """cfd_solver_create: None (with last-error set) for unknown names."""
        f = self._factories.get(name)
        if f is None:
            set_error(Status.ERROR_NOT_FOUND,
                      f"solver type '{name}' not registered")
            return None
        return f()

    def create_checked(self, name: str) -> Optional[NSSolver]:
        """cfd_solver_create_checked: also validates backend availability."""
        f = self._factories.get(name)
        if f is None:
            set_error(Status.ERROR_NOT_FOUND,
                      f"solver type '{name}' not registered")
            return None
        if not backend_is_available(infer_backend(name)):
            set_error(Status.ERROR_UNSUPPORTED,
                      f"backend for '{name}' is not available")
            return None
        return f()


def create_registry() -> SolverRegistry:
    """cfd_registry_create + cfd_registry_register_defaults."""
    reg = SolverRegistry()
    reg.register_defaults()
    return reg
