from .params import NSParams, NSStats, StepResult
from .solver import Capability, NSSolver
from .common import compute_dt
from .euler import make_euler_solve, make_euler_step
from .projection import make_projection_solve, make_projection_step
from .rk import make_momentum_rhs, make_rk2_solve, make_rk2_step, \
    make_rk4_solve, make_rk4_step
from .rollout import make_rollout

__all__ = [
    "NSParams", "NSStats", "StepResult", "Capability", "NSSolver",
    "compute_dt", "make_euler_solve", "make_euler_step",
    "make_projection_solve", "make_projection_step", "make_momentum_rhs",
    "make_rk2_solve", "make_rk2_step", "make_rk4_solve", "make_rk4_step",
    "make_rollout",
]
