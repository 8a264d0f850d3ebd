from .adjoint import make_adjoint_poisson
from .base import (Method, PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStats, PoissonStatus, Precond)
from .frontend import (DEFAULT_PRESET, PoissonSolver, SolverPreset,
                       clear_cache, create_solver, poisson_solve,
                       poisson_solve_3d)

__all__ = [
    "Method", "PoissonParams", "PoissonProblem", "PoissonResult",
    "PoissonStats", "PoissonStatus", "Precond", "DEFAULT_PRESET",
    "PoissonSolver", "SolverPreset", "clear_cache", "create_solver",
    "make_adjoint_poisson", "poisson_solve", "poisson_solve_3d",
]
