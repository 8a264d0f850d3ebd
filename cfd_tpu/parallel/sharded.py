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


def make_sharded_step(grid: Grid, params: NSParams, mesh: Mesh,
                      method: str = "projection", **kw):
    """Build a jitted step whose outputs stay sharded over the mesh.

    Returns (step_fn, place_fn): ``place_fn(field)`` shards the initial
    state; ``step_fn(field, dt, iter)`` runs one step with all collectives
    inside the single XLA program.
    """
    raw_step = _BUILDERS[method](grid, params, **kw)
    sharding = field_sharding(mesh, grid.nz > 1)
    out_field = FlowField(u=sharding, v=sharding, w=sharding, p=sharding,
                          rho=sharding, T=sharding)

    step = jax.jit(raw_step, out_shardings=(out_field, None))

    def place(field: FlowField) -> FlowField:
        return shard_field(field, mesh)

    return step, place
