"""The simulation façade — session object tying grid, field, params, solver,
registry, outputs and checkpointing together.

Re-design of `lib/src/api/simulation_api.c` with the same lifecycle and the
same deliberate quirks:

* ``init_simulation`` builds a uniform grid, the default sinusoidal initial
  field, a registry with the default solvers, and the requested solver with
  ``max_iter = 1`` for stepping (`simulation_api.c:72-77`);
* ``run_simulation_step`` hard-codes ``dt = 0.005`` before stepping — the
  reference's animation-stability quirk (`simulation_api.c:191`), preserved
  deliberately (SURVEY.md §7);
* ``run_simulation_solve`` accumulates ``current_time += dt·iterations``;
* checkpoint save / load (fresh sim) / restore (into an existing sim, with
  strong exception-safety ordering and callback preservation).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

from ..core.field import FlowField
from ..core.grid import Grid
from ..core.status import CFDError, Status, set_error
from ..io import checkpoint as ckpt
from ..solvers.ns.params import NSParams, NSStats
from ..solvers.ns.solver import NSSolver
from .outputs import OutputRegistry, OutputType
from .registry import SolverRegistry, create_registry

DEFAULT_SOLVER_TYPE = "explicit_euler"
STEP_DT = 0.005  # run_simulation_step's fixed dt (`simulation_api.c:191`)


class Simulation:
    """Mirrors simulation_data (`simulation_api.h:22-33`)."""

    def __init__(self, grid: Grid, field: FlowField, params: NSParams,
                 solver: NSSolver, registry: SolverRegistry,
                 outputs: OutputRegistry,
                 output_base_dir: str = "artifacts"):
        self.grid = grid
        self.field = field
        self.params = params
        self.solver = solver
        self.registry = registry
        self.outputs = outputs
        self.output_base_dir = output_base_dir
        self.run_prefix: Optional[str] = None
        self.current_time: float = 0.0
        self.last_stats = NSStats()
        self.mesh = None  # multi-chip placement; set by from_grid(mesh=...)

    # ---- construction ------------------------------------------------------

    @classmethod
    def create(cls, nx: int, ny: int, nz: int = 1,
               xmin: float = 0.0, xmax: float = 1.0,
               ymin: float = 0.0, ymax: float = 1.0,
               zmin: float = 0.0, zmax: float = 0.0,
               solver_type: Optional[str] = None,
               params: Optional[NSParams] = None,
               mesh=None) -> "Simulation":
        """init_simulation[_with_solver] (`simulation_api.c:24-140`)."""
        grid = Grid.uniform(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax)
        return cls.from_grid(grid, solver_type, params, mesh=mesh)

    @classmethod
    def from_grid(cls, grid: Grid, solver_type: Optional[str] = None,
                  params: Optional[NSParams] = None,
                  mesh=None) -> "Simulation":
        """``create`` for a caller-built grid (framework extension: the
        reference's `init_simulation` is uniform-only, `simulation_api.c:121`
        + `grid_initialize_uniform`; stretched runs there assemble the
        solver by hand as `poiseuille_stretched_grid.c` does).  Use with
        `Grid.stretched(...)` — e.g. wall-clustered grids with
        ``NSParams(nonuniform_scheme="consistent")``.

        ``mesh`` (a `jax.sharding.Mesh`) runs the whole simulation
        multi-chip: the field is sharded over the mesh and every solver
        bound to this session builds its step/solve as one GSPMD program
        (framework extension — the reference is single-node; SURVEY.md
        §2.9)."""
        # Lazy global init, as init_simulation lazy-calls cfd_init (`:26`).
        from ..core.runtime import init as cfd_init
        cfd_init()
        field = FlowField.initialize(grid)
        if params is None:
            params = NSParams(dt=0.001, cfl=0.2, mu=0.01, max_iter=1)
        registry = create_registry()
        name = solver_type or DEFAULT_SOLVER_TYPE
        solver = registry.create(name)
        if solver is None:
            raise CFDError(Status.ERROR_NOT_FOUND,
                           f"solver '{name}' not registered")
        solver.mesh = mesh
        solver.init(grid, params)
        sim = cls(grid, solver.place(field), params, solver, registry,
                  OutputRegistry())
        sim.mesh = mesh
        return sim

    # ---- solver management -------------------------------------------------

    def set_solver(self, solver: NSSolver) -> None:
        """simulation_set_solver.  The session's mesh (if any) carries over
        to the new solver, and the field is re-placed under it."""
        solver.mesh = self.mesh
        solver.init(self.grid, self.params)
        self.solver = solver
        self.field = solver.place(self.field)

    def set_solver_by_name(self, solver_type: str) -> int:
        """simulation_set_solver_by_name; -1 on unknown name."""
        solver = self.registry.create(solver_type)
        if solver is None:
            return -1
        self.set_solver(solver)
        return 0

    def get_stats(self) -> NSStats:
        return self.last_stats

    # ---- stepping ----------------------------------------------------------

    def step(self) -> Status:
        """run_simulation_step: fixed dt=0.005, one solver step."""
        self.params = self.params.replace(dt=STEP_DT)
        self._rebind_if_needed()
        self.field, self.last_stats = self.solver.step(self.field, STEP_DT)
        if self.last_stats.status != Status.SUCCESS:
            return self.last_stats.status
        self.current_time += STEP_DT
        return Status.SUCCESS

    def solve(self) -> Status:
        """run_simulation_solve: max_iter steps, accumulate elapsed time."""
        self.params = self.params.replace(dt=STEP_DT)
        self._rebind_if_needed()
        self.field, self.last_stats = self.solver.solve(self.field, STEP_DT)
        self.current_time += STEP_DT * self.last_stats.iterations
        return self.last_stats.status

    def _rebind_if_needed(self):
        if self.solver.params is not self.params:
            # params replaced (e.g. dt quirk) — params are build-time static
            # only in *structure*; dt flows dynamically, so rebind only when
            # the structural config changed.
            if self.solver.params is None or \
                    _structural(self.solver.params) != _structural(self.params):
                self.solver.init(self.grid, self.params)
            else:
                self.solver.params = self.params

    # ---- outputs -----------------------------------------------------------

    def register_output(self, field_type: OutputType, interval: int,
                        prefix: Optional[str] = None) -> None:
        self.outputs.add(field_type, interval, prefix)

    def clear_outputs(self) -> None:
        self.outputs.clear()

    def set_output_dir(self, base_dir: str) -> None:
        if base_dir:
            self.output_base_dir = base_dir

    def set_run_prefix(self, prefix: Optional[str]) -> None:
        self.run_prefix = prefix

    def write_outputs(self, step: int) -> None:
        """simulation_write_outputs (`simulation_api.c:563-603`)."""
        run_dir = self.outputs.get_run_dir(self.output_base_dir,
                                           self.run_prefix,
                                           self.grid.nx, self.grid.ny)
        self.outputs.write_outputs(run_dir, step, self.current_time,
                                   self.field, self.grid, self.params,
                                   self.last_stats)

    # ---- checkpointing -----------------------------------------------------

    def save_checkpoint(self, path: str) -> Status:
        """save_simulation_checkpoint."""
        ckpt.write_checkpoint(path, self.grid, self.field, self.params,
                              self.current_time, self.solver.name,
                              self.run_prefix, self.output_base_dir)
        return Status.SUCCESS

    @classmethod
    def load_checkpoint(cls, path: str, mesh=None) -> "Simulation":
        """load_simulation_from_checkpoint: build a fresh simulation.
        Callback fields restore as None by contract.  ``mesh`` re-places
        the restored state multi-chip (resuming on a different device
        topology than the one that saved is fine: checkpoints are
        placement-free host bytes)."""
        grid, field, params, t, solver_name, run_prefix, base_dir = \
            ckpt.read_checkpoint(path)
        registry = create_registry()
        solver = registry.create(solver_name)
        if solver is None:
            raise CFDError(Status.ERROR_NOT_FOUND,
                           "checkpoint solver not registered")
        solver.mesh = mesh
        solver.init(grid, params)
        sim = cls(grid, solver.place(field), params, solver, registry,
                  OutputRegistry(), base_dir or "artifacts")
        sim.mesh = mesh
        sim.current_time = t
        sim.run_prefix = run_prefix or None
        return sim

    def restore_checkpoint(self, path: str) -> Status:
        """restore_simulation_checkpoint: restore into this simulation.

        Strong exception safety: the new state is fully constructed (incl.
        solver init) before the old is replaced; the caller's traceable
        callbacks are preserved (`simulation_api.c:389-412`).
        """
        grid, field, params, t, solver_name, run_prefix, base_dir = \
            ckpt.read_checkpoint(path)
        new_solver = self.registry.create(solver_name)
        if new_solver is None:
            set_error(Status.ERROR_NOT_FOUND,
                      "restore: solver not registered")
            return Status.ERROR_NOT_FOUND
        # Preserve caller's callables; only scalar parameters restore.
        params = params.replace(
            source_func=self.params.source_func,
            heat_source_func=self.params.heat_source_func)
        new_solver.mesh = self.mesh
        status = new_solver.init(grid, params)
        if status != Status.SUCCESS:
            return status
        self.grid = grid
        self.field = new_solver.place(field)
        self.solver = new_solver
        self.params = params
        self.current_time = t
        self.run_prefix = run_prefix or None
        self.output_base_dir = base_dir or "artifacts"
        self.outputs.reset_run_dir()
        return Status.SUCCESS


def _structural(p: NSParams):
    """Fields whose change requires rebuilding the jitted step."""
    return dataclasses.replace(p, dt=0.0)


# ---- module-level solver discovery (simulation_api.c:452-490) ---------------

_SOLVER_NAMES = [
    "explicit_euler", "explicit_euler_optimized", "projection",
    "projection_optimized", "explicit_euler_gpu", "projection_gpu",
    "explicit_euler_omp", "projection_omp",
    "projection_spectral",   # TPU extension: exact DST-I pressure solve
    "projection_multigrid",  # TPU extension: O(N) multigrid pressure solve
]


def list_solvers() -> List[str]:
    return list(_SOLVER_NAMES)


def has_solver(solver_type: str) -> bool:
    return solver_type in _SOLVER_NAMES
