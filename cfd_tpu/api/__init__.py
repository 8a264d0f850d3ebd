from .outputs import OutputRegistry, OutputType
from .registry import Backend, SolverRegistry, create_registry, infer_backend
from .simulation import Simulation, has_solver, list_solvers

__all__ = ["OutputRegistry", "OutputType", "Backend", "SolverRegistry",
           "create_registry", "infer_backend", "Simulation", "has_solver",
           "list_solvers"]
