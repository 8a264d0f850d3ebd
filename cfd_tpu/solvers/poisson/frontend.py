"""Poisson solver front-end: creation, the solver object, and the cached
convenience API.

Re-design of `linear_solver.c`'s lifecycle + cached-preset machinery:

* ``poisson_solver_create(method, backend)`` → :func:`create_solver` — the
  backend argument survives for API parity but selects nothing; XLA is the
  backend (availability rules in `cfd_tpu.core.features`).
* the common/custom solve loops → each method's jitted function (built in
  ``stationary.py`` / ``krylov.py``), compiled once per (problem, params,
  dtype) and cached on the solver object;
* ``poisson_solve_3d``'s per-preset solver cache keyed on grid dims/spacing
  (`linear_solver.c:537-706`) → a module-level dict cache with the same
  recreate-on-change behavior.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ...core.status import CFDError, Status
from .base import (Method, PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStats, PoissonStatus, Precond, result_to_stats)
from .krylov import (make_bicgstab, make_bicgstab_fused, make_bicgstab_vmem,
                     make_cg, make_cg_fused, make_cg_vmem)
from .multigrid import make_mg_cg, make_multigrid
from .spectral import make_fft_direct, spectral_supported
from .stationary import (make_jacobi, make_jacobi_vmem, make_redblack_sor,
                         make_redblack_sor_fused, make_redblack_sor_vmem,
                         make_sor)


def _make_cg_dispatch(problem, params):
    if params.preconditioner == Precond.MULTIGRID:
        fn = make_mg_cg(problem, params)
        if fn is None:
            raise CFDError(Status.ERROR_UNSUPPORTED,
                           "multigrid preconditioner: grid not coarsenable "
                           "(needs (n-1) divisible by 2 per active axis)")
        return fn
    return make_cg(problem, params)


def _make_fft_dispatch(problem, params):
    if not spectral_supported(problem):
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "fft_direct: needs nz==1 or (nz>=3 with dz>0)")
    return make_fft_direct(problem, params)


def _make_multigrid_dispatch(problem, params):
    fn = make_multigrid(problem, params)
    if fn is None:
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "multigrid: grid not coarsenable "
                       "(needs (n-1) divisible by 2 per active axis)")
    return fn


_MAKERS = {
    Method.JACOBI: make_jacobi,
    Method.SOR: make_sor,
    Method.GAUSS_SEIDEL: make_sor,   # GS == SOR with omega resolved normally
    Method.REDBLACK_SOR: make_redblack_sor,
    Method.CG: _make_cg_dispatch,
    Method.BICGSTAB: make_bicgstab,
    Method.MULTIGRID: _make_multigrid_dispatch,
    Method.FFT_DIRECT: _make_fft_dispatch,
}

def _fused_maker(method: Method, problem: PoissonProblem,
                 params: PoissonParams, interpret: bool):
    """Fused-Pallas builder for the methods that have one, else None.

    CG's multigrid preconditioner has no fused kernel; Jacobi/SOR gain
    nothing from fusion that XLA doesn't already do (Jacobi is one fused
    sweep under jit; SOR is scan-bound)."""
    # Small grids (2D or 3D volumes that fit VMEM): the whole solve runs
    # VMEM-resident in one kernel — these sizes are launch-latency-bound,
    # not bandwidth-bound.
    fn = None
    if method == Method.REDBLACK_SOR:
        fn = make_redblack_sor_vmem(problem, params, interpret=interpret)
    elif method == Method.JACOBI:
        fn = make_jacobi_vmem(problem, params, interpret=interpret)
    elif method == Method.CG:
        fn = make_cg_vmem(problem, params, interpret=interpret)
    elif method == Method.BICGSTAB:
        fn = make_bicgstab_vmem(problem, params, interpret=interpret)
    elif method == Method.MULTIGRID:
        # 2D hierarchies: whole V-cycle solve in one kernel (3D multigrid
        # fuses its sweeps internally via make_multigrid's use_pallas).
        from .multigrid import make_multigrid_vmem
        fn = make_multigrid_vmem(problem, params, interpret=interpret)
    # Large 3D grids: streaming rolling-plane kernels.
    if fn is None and problem.is_3d:
        if method == Method.REDBLACK_SOR:
            fn = make_redblack_sor_fused(problem, params, interpret=interpret)
        elif method == Method.CG \
                and params.preconditioner != Precond.MULTIGRID:
            fn = make_cg_fused(problem, params, interpret=interpret)
        elif method == Method.BICGSTAB:
            fn = make_bicgstab_fused(problem, params, interpret=interpret)
    import jax
    return None if fn is None else jax.jit(fn)


_METHOD_NAMES = {
    Method.JACOBI: "jacobi",
    Method.GAUSS_SEIDEL: "gauss_seidel",
    Method.SOR: "sor",
    Method.REDBLACK_SOR: "redblack",
    Method.CG: "cg",
    Method.BICGSTAB: "bicgstab",
    Method.MULTIGRID: "multigrid",
    Method.FFT_DIRECT: "fft_direct",
}


class SolverPreset(enum.IntEnum):
    """Mirrors poisson_solver_type (`poisson_solver.h:405-415`).  The backend
    suffixes are kept for source compatibility; all map to the XLA path."""

    SOR_SCALAR = 0
    JACOBI_SIMD = 1
    REDBLACK_SIMD = 2
    REDBLACK_OMP = 3
    REDBLACK_SCALAR = 4
    CG_SCALAR = 5
    CG_SIMD = 6
    CG_OMP = 7
    SOR_SIMD = 8


_PRESET_METHOD = {
    SolverPreset.SOR_SCALAR: Method.SOR,
    SolverPreset.JACOBI_SIMD: Method.JACOBI,
    SolverPreset.REDBLACK_SIMD: Method.REDBLACK_SOR,
    SolverPreset.REDBLACK_OMP: Method.REDBLACK_SOR,
    SolverPreset.REDBLACK_SCALAR: Method.REDBLACK_SOR,
    SolverPreset.CG_SCALAR: Method.CG,
    SolverPreset.CG_SIMD: Method.CG,
    SolverPreset.CG_OMP: Method.CG,
    SolverPreset.SOR_SIMD: Method.SOR,
}

#: Default preset for the projection pressure solve
#: (DEFAULT_POISSON_SOLVER, `poisson_solver.h:418`).
DEFAULT_PRESET = SolverPreset.REDBLACK_SIMD


@dataclasses.dataclass
class PoissonSolver:
    """A configured Poisson solver bound to one problem geometry.

    Mirrors the reference's poisson_solver_t lifecycle: create → init →
    solve → (destroy is garbage collection).
    """

    method: Method
    problem: Optional[PoissonProblem] = None
    params: PoissonParams = PoissonParams()
    _solve_fn: Optional[object] = None
    _fused_fn: Optional[object] = None
    _params_user_set: bool = False

    @property
    def name(self) -> str:
        return _METHOD_NAMES[self.method]

    def init(self, nx: int, ny: int, nz: int = 1,
             dx: float = 1.0, dy: float = 1.0, dz: float = 0.0,
             params: Optional[PoissonParams] = None,
             use_pallas: Optional[bool] = None) -> "PoissonSolver":
        """Bind to a problem geometry (mirrors poisson_solver_init).

        ``use_pallas``: None (default) enables the fused Pallas fast path
        automatically on TPU for the methods that have one (Red-Black SOR,
        CG/PCG, BiCGSTAB — the reference's GPU-backed methods,
        `lib/src/solvers/linear/gpu/`); True forces it (interpret mode off
        TPU, for tests); False disables it.  The fused path engages only
        for float32 inputs; other dtypes keep the jnp reference numerics.
        """
        self.problem = PoissonProblem(nx, ny, nz, dx, dy, dz)
        if params is not None:
            self.params = params
            self._params_user_set = True
        elif self.method == Method.JACOBI and not self._params_user_set:
            # Jacobi needs more iterations when defaulted
            # (`linear_solver.c:276-278`, factory at `linear_solver_jacobi.c:
            # 146-147` also uses check_interval=10).
            self.params = dataclasses.replace(self.params,
                                              max_iterations=2000,
                                              check_interval=10)
        self._solve_fn = _MAKERS[self.method](self.problem, self.params)
        self._fused_fn = None
        import jax
        on_tpu = jax.default_backend() == "tpu"
        if use_pallas or (use_pallas is None and on_tpu):
            self._fused_fn = _fused_maker(self.method, self.problem,
                                          self.params, interpret=not on_tpu)
        return self

    def _dispatch(self, x):
        if self._fused_fn is not None and x.dtype == jnp.float32:
            return self._fused_fn
        return self._solve_fn

    def solve(self, x, rhs) -> Tuple[jnp.ndarray, PoissonStats]:
        """Solve ∇²x = rhs from initial guess x; returns (x, stats)."""
        if self._solve_fn is None:
            raise CFDError(Status.ERROR_INVALID, "solver not initialized")
        x = jnp.asarray(x)
        rhs = jnp.asarray(rhs)
        if x.ndim == 2:
            x, rhs = x[None], rhs[None]
            squeeze = True
        else:
            squeeze = False
        t0 = time.perf_counter()
        result: PoissonResult = self._dispatch(x)(x, rhs)
        result.x.block_until_ready()
        ms = (time.perf_counter() - t0) * 1e3
        out = result.x[0] if squeeze else result.x
        return out, result_to_stats(result, ms)

    def solve_result(self, x, rhs) -> PoissonResult:
        """Device-side solve (no host sync) for embedding in larger jits."""
        if self._solve_fn is None:
            raise CFDError(Status.ERROR_INVALID, "solver not initialized")
        return self._dispatch(x)(x, rhs)

    def compute_residual(self, x, rhs) -> float:
        x = jnp.asarray(x)
        rhs = jnp.asarray(rhs)
        if x.ndim == 2:
            x, rhs = x[None], rhs[None]
        return float(self.problem.residual_inf(x, rhs))


def create_solver(method: Method, params: Optional[PoissonParams] = None,
                  backend=None) -> PoissonSolver:
    """Mirrors poisson_solver_create; backend accepted for parity."""
    method = Method(method)
    if method not in _MAKERS:
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       f"Poisson method {method.name} not implemented")
    solver = PoissonSolver(method=method)
    if params is not None:
        solver.params = params
        # Factory defaults (e.g. Jacobi's larger budget,
        # `linear_solver_jacobi.c:146-147`) never override user params.
        solver._params_user_set = True
    return solver


# ---------------------------------------------------------------------------
# Cached convenience API (poisson_solve / poisson_solve_3d equivalents)
# ---------------------------------------------------------------------------

_cache: Dict[SolverPreset, PoissonSolver] = {}


def clear_cache() -> None:
    _cache.clear()


def poisson_solve_3d(p, rhs, nx: int, ny: int, nz: int,
                     dx: float, dy: float, dz: float,
                     preset: SolverPreset = DEFAULT_PRESET):
    """Convenience solve with per-preset solver caching.

    Mirrors poisson_solve_3d (`linear_solver.c:589-705`): one cached solver
    per preset, recreated when dims/spacing change; returns
    (p, iterations) with iterations == -1 on non-convergence.
    """
    preset = SolverPreset(preset)
    solver = _cache.get(preset)
    prob = (nx, ny, nz, dx, dy, dz)
    if (solver is None or solver.problem is None
            or (solver.problem.nx, solver.problem.ny, solver.problem.nz,
                solver.problem.dx, solver.problem.dy,
                solver.problem.dz) != prob):
        solver = create_solver(_PRESET_METHOD[preset])
        solver.init(nx, ny, nz, dx, dy, dz)
        _cache[preset] = solver
    p_out, stats = solver.solve(p, rhs)
    if stats.status == PoissonStatus.CONVERGED:
        return p_out, stats.iterations
    return p_out, -1


def poisson_solve(p, rhs, nx: int, ny: int, dx: float, dy: float,
                  preset: SolverPreset = DEFAULT_PRESET):
    """2D convenience wrapper (mirrors poisson_solve)."""
    return poisson_solve_3d(p, rhs, nx, ny, 1, dx, dy, 0.0, preset)
