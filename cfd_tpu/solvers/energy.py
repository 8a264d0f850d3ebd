"""Energy equation: explicit temperature advection-diffusion, Boussinesq
buoyancy, and thermal boundary conditions.

Re-design of `lib/src/solvers/energy/cpu/energy_solver.c` +
`lib/include/cfd/solvers/energy_solver.h`:

* ``energy_step`` — T ← T + dt·(−u·∇T + α∇²T + Q), skipped when α ≤ 0,
  uniform-spacing-only (validated at build time, the reference's runtime
  check at `energy_solver.c:55-91` becomes a trace-time error);
* ``compute_buoyancy`` — source += −β(T − T_ref)·g (`energy_solver.c:185-196`);
* ``apply_thermal_bcs`` — per-face PERIODIC/NEUMANN/DIRICHLET applied in the
  reference's sequential face order (left, right, bottom, top, back, front;
  last-face-wins corners, `energy_solver.c:246-331`).

The heat-source host callback (`ns_heat_source_func_t`) becomes a
jax-traceable callable ``q(X, Y, Z, t) -> Q`` evaluated on the coordinate
grids inside jit — no host round trip (the reference's GPU backend simply
refused host callbacks, `navier_stokes_solver.h:140-146`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..boundary.types import BCType, ThermalBCConfig
from ..core.grid import Grid
from ..core.status import CFDError, Status
from ..ops import stencils


def static_bool(x, default: bool = True) -> bool:
    """``bool(x)``, but `default` when x is a tracer.

    Enablement predicates (α > 0, β ≠ 0) gate *structure* at build time;
    when the physics parameter is a traced value (the differentiable-
    params pattern — e.g. ``jax.grad`` of a rollout w.r.t. β), its truth
    value is unknowable at trace time, so the term is kept (``default=
    True``) and the gradient flows through it.  Concrete values keep the
    reference's skip-when-disabled semantics (`energy_solver.c:37-39`).
    """
    try:
        return bool(x)
    except jax.errors.TracerBoolConversionError:
        return default


def validate_energy_grid(grid: Grid, scheme: str = "parity") -> None:
    """Uniform-spacing requirement (`energy_solver.c:55-91`).

    Framework extension: ``nonuniform_scheme="consistent"`` lifts the
    x/y restriction — the exact 3-point nonuniform weights make the
    advection-diffusion stencils well-defined on tanh-stretched grids
    (z must stay uniform, as for the momentum integrators)."""
    if grid.nx < 3 or grid.ny < 3:
        raise CFDError(Status.ERROR_INVALID, "energy_solver: grid too small")
    if scheme != "consistent" and (not grid.is_uniform("x")
                                   or not grid.is_uniform("y")):
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "energy_solver: non-uniform dx/dy not supported "
                       "(opt into NSParams(nonuniform_scheme='consistent'))")
    if grid.nz > 1 and not grid.is_uniform("z"):
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "energy_solver: non-uniform dz not supported")


def validate_thermal_bc(config: ThermalBCConfig, grid: Grid) -> None:
    """Reject unsupported face types / too-small grids
    (`energy_solver.c:221-244`)."""
    supported = (BCType.PERIODIC, BCType.NEUMANN, BCType.DIRICHLET)
    faces = [config.left, config.right, config.bottom, config.top]
    if grid.nz > 1:
        faces += [config.front, config.back]
    for f in faces:
        if BCType(f) not in supported:
            raise CFDError(
                Status.ERROR_INVALID,
                "thermal BC: only PERIODIC, NEUMANN, DIRICHLET are valid")
    if ((config.left == BCType.PERIODIC or config.right == BCType.PERIODIC)
            and grid.nx < 3):
        raise CFDError(Status.ERROR_INVALID, "grid too small for periodic x")
    if ((config.bottom == BCType.PERIODIC or config.top == BCType.PERIODIC)
            and grid.ny < 3):
        raise CFDError(Status.ERROR_INVALID, "grid too small for periodic y")
    if grid.nz > 1 and (config.back == BCType.PERIODIC
                        or config.front == BCType.PERIODIC) and grid.nz < 3:
        raise CFDError(Status.ERROR_INVALID, "grid too small for periodic z")


def make_energy_step(grid: Grid, alpha: float, heat_source=None,
                     scheme: str = "parity"):
    """Build T-update closure; returns None when the energy equation is
    disabled (α ≤ 0 — `energy_solver.c:37-39`; traced α keeps it on).

    ``scheme="consistent"`` enables tanh-stretched x/y grids via the
    exact 3-point nonuniform weights (`ns.common.consistent_triples`);
    on uniform grids both schemes use the identical uniform constants."""
    if not static_bool(alpha > 0.0):
        return None
    validate_energy_grid(grid, scheme)

    inv_2dz = 1.0 / (2.0 * grid.dz0) if grid.nz > 1 else 0.0
    inv_dz2 = grid.inv_dz2 if grid.nz > 1 else 0.0
    coords = grid.coordinate_arrays() if heat_source is not None else None

    stretched = not (grid.is_uniform("x") and grid.is_uniform("y"))
    if stretched:
        import numpy as np

        from .ns.common import consistent_triples
        xw = [np.asarray(a)[None, None, :]
              for a in consistent_triples(grid.dx)]
        yw = [np.asarray(a)[None, :, None]
              for a in consistent_triples(grid.dy)]

        def step(T, u, v, w, dt, time):
            wxm, wxc, wxp, lxm, lxc, lxp = [jnp.asarray(a, T.dtype)
                                            for a in xw]
            wym, wyc, wyp, lym, lyc, lyp = [jnp.asarray(a, T.dtype)
                                            for a in yw]
            Txm, Txp = stencils.sx_m(T), stencils.sx_p(T)
            Tym, Typ = stencils.sy_m(T), stencils.sy_p(T)
            dT_dx = Txm * wxm + T * wxc + Txp * wxp
            dT_dy = Tym * wym + T * wyc + Typ * wyp
            dT_dz = stencils.ddz(T, inv_2dz)
            advection = u * dT_dx + v * dT_dy + w * dT_dz
            diffusion = (Txm * lxm + T * lxc + Txp * lxp
                         + Tym * lym + T * lyc + Typ * lyp
                         + stencils.d2dz2(T, inv_dz2))
            diffusion = alpha * diffusion
            if heat_source is not None:
                X, Y, Z = coords
                Q = heat_source(X, Y, Z, time)
            else:
                Q = 0.0
            T_new = T + dt * (-advection + diffusion + Q)
            return stencils.set_interior(T, T_new)

        return step

    inv_2dx = 1.0 / (2.0 * grid.dx0)
    inv_2dy = 1.0 / (2.0 * grid.dy0)
    inv_dx2 = 1.0 / grid.dx0 ** 2
    inv_dy2 = 1.0 / grid.dy0 ** 2

    def step(T, u, v, w, dt, time):
        dT_dx = stencils.ddx(T, inv_2dx)
        dT_dy = stencils.ddy(T, inv_2dy)
        dT_dz = stencils.ddz(T, inv_2dz)
        advection = u * dT_dx + v * dT_dy + w * dT_dz
        diffusion = alpha * stencils.laplacian(T, inv_dx2, inv_dy2, inv_dz2)
        if heat_source is not None:
            X, Y, Z = coords
            Q = heat_source(X, Y, Z, time)
        else:
            Q = 0.0
        T_new = T + dt * (-advection + diffusion + Q)
        return stencils.set_interior(T, T_new)

    return step


def compute_buoyancy(T, beta: float, T_ref: float, gravity):
    """Boussinesq momentum sources (−β·(T−T_ref)·g)."""
    if not static_bool(beta != 0.0):
        return 0.0, 0.0, 0.0
    dT = T - T_ref
    return (-beta * dT * gravity[0],
            -beta * dT * gravity[1],
            -beta * dT * gravity[2])


def apply_thermal_bcs(T, config: ThermalBCConfig):
    """Sequential per-face thermal BCs; corner cells take the value of the
    face applied last (reference order: L, R, B, T, back, front)."""
    v = config.dirichlet_values
    nz = T.shape[0]

    def face(T, bc, dst, src_neumann, src_periodic, value):
        bc = BCType(bc)
        if bc == BCType.DIRICHLET:
            return T.at[dst].set(value)
        if bc == BCType.NEUMANN:
            return T.at[dst].set(T[src_neumann])
        if bc == BCType.PERIODIC:
            return T.at[dst].set(T[src_periodic])
        return T

    s = slice(None)
    T = face(T, config.left, (s, s, 0), (s, s, 1), (s, s, -2), v.left)
    T = face(T, config.right, (s, s, -1), (s, s, -2), (s, s, 1), v.right)
    T = face(T, config.bottom, (s, 0, s), (s, 1, s), (s, -2, s), v.bottom)
    T = face(T, config.top, (s, -1, s), (s, -2, s), (s, 1, s), v.top)
    if nz > 1:
        T = face(T, config.back, (0, s, s), (1, s, s), (-2, s, s), v.back)
        T = face(T, config.front, (-1, s, s), (-2, s, s), (1, s, s), v.front)
    return T


def thermal_dt_limit(alpha: float, dmin: float, ndim: int, cfl: float) -> float:
    """Thermal diffusion stability bound dt < dmin²/(2·α·ndim)·cfl
    (`solver_explicit_euler.c:214-219`)."""
    if alpha <= 0.0:
        return float("inf")
    return (dmin * dmin) / (2.0 * alpha * ndim) * cfl
