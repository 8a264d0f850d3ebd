"""Flow field state: a pytree of (nz, ny, nx) arrays.

Re-design of the reference's SoA ``flow_field`` (`navier_stokes_solver.h:54-64`,
`solver_explicit_euler.c:79-160`):

* The six C arrays (u, v, w, p, rho, T) become the leaves of a frozen
  dataclass pytree, so a whole field flows through ``jit`` / ``lax.scan`` /
  ``jax.sharding`` as one value.
* ``w`` is always allocated and zero in 2D, matching the reference contract.
* The 32-byte-aligned host allocation concern disappears — XLA owns layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import resolve_dtype
from .grid import Grid

# Initial condition constants (`solver_explicit_euler.c:30-44`).
INIT_U_BASE = 1.0
INIT_U_VAR = 0.1
INIT_V_VAR = 0.05
INIT_PRESSURE = 1.0
INIT_DENSITY = 1.0
INIT_TEMP = 300.0

PERTURB_CENTER_X = 1.0
PERTURB_CENTER_Y = 0.5
PERTURB_RADIUS = 0.2
PERTURB_WIDTH_SQ = 0.02
PERTURB_MAG = 0.1
PERTURB_GRAD_FACTOR = 2.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowField:
    """Solution state: velocity (u, v, w), pressure p, density rho, temperature T.

    All leaves have shape (nz, ny, nx).
    """

    u: jax.Array
    v: jax.Array
    w: jax.Array
    p: jax.Array
    rho: jax.Array
    T: jax.Array

    @property
    def shape(self):
        return self.u.shape

    @property
    def nx(self) -> int:
        return self.u.shape[2]

    @property
    def ny(self) -> int:
        return self.u.shape[1]

    @property
    def nz(self) -> int:
        return self.u.shape[0]

    @property
    def dtype(self):
        return self.u.dtype

    def replace(self, **kwargs) -> "FlowField":
        return dataclasses.replace(self, **kwargs)

    # ---- constructors -------------------------------------------------------

    @classmethod
    def zeros(cls, nx: int, ny: int, nz: int = 1, dtype=None) -> "FlowField":
        """All-zero field (mirrors flow_field_create's calloc semantics)."""
        dt = resolve_dtype(dtype)
        z = jnp.zeros((nz, ny, nx), dtype=dt)
        return cls(u=z, v=z, w=z, p=z, rho=z, T=z)

    @classmethod
    def quiescent(cls, nx: int, ny: int, nz: int = 1, dtype=None,
                  pressure: float = INIT_PRESSURE,
                  density: float = INIT_DENSITY,
                  temperature: float = INIT_TEMP) -> "FlowField":
        """Zero velocity with physical rest-state scalars."""
        dt = resolve_dtype(dtype)
        z = jnp.zeros((nz, ny, nx), dtype=dt)
        return cls(u=z, v=z, w=z,
                   p=jnp.full((nz, ny, nx), pressure, dtype=dt),
                   rho=jnp.full((nz, ny, nx), density, dtype=dt),
                   T=jnp.full((nz, ny, nx), temperature, dtype=dt))

    @classmethod
    def initialize(cls, grid: Grid, dtype=None) -> "FlowField":
        """Default initial condition (mirrors initialize_flow_field,
        `solver_explicit_euler.c:124-160`):

          u = 1 + 0.1 sin(pi*y),  v = 0.05 sin(2*pi*x),  w = 0,
          p = 1, rho = 1, T = 300,
        plus a Gaussian pressure bump at (1, 0.5) with matched velocity
        perturbation inside radius 0.2.
        """
        dt = resolve_dtype(dtype)
        nz, ny, nx = grid.nz, grid.ny, grid.nx
        # Constant-fold the coordinate grids on the host.
        x = np.asarray(grid.x)[None, None, :]
        y = np.asarray(grid.y)[None, :, None]
        X = np.broadcast_to(x, (nz, ny, nx))
        Y = np.broadcast_to(y, (nz, ny, nx))

        u = INIT_U_BASE + INIT_U_VAR * np.sin(np.pi * Y)
        v = INIT_V_VAR * np.sin(2.0 * np.pi * X)
        p = np.full((nz, ny, nx), INIT_PRESSURE)

        cx, cy = PERTURB_CENTER_X, PERTURB_CENTER_Y
        r = np.sqrt((X - cx) ** 2 + (Y - cy) ** 2)
        bump = PERTURB_MAG * np.exp(-r * r / PERTURB_WIDTH_SQ)
        inside = r < PERTURB_RADIUS
        dp_dx = -PERTURB_MAG * PERTURB_GRAD_FACTOR * (X - cx) / PERTURB_WIDTH_SQ \
            * np.exp(-r * r / PERTURB_WIDTH_SQ)
        dp_dy = -PERTURB_MAG * PERTURB_GRAD_FACTOR * (Y - cy) / PERTURB_WIDTH_SQ \
            * np.exp(-r * r / PERTURB_WIDTH_SQ)

        p = np.where(inside, p + bump, p)
        u = np.where(inside, u - PERTURB_MAG * dp_dx, u)
        v = np.where(inside, v - PERTURB_MAG * dp_dy, v)

        zero = jnp.zeros((nz, ny, nx), dtype=dt)
        return cls(u=jnp.asarray(u, dtype=dt),
                   v=jnp.asarray(v, dtype=dt),
                   w=zero,
                   p=jnp.asarray(p, dtype=dt),
                   rho=jnp.full((nz, ny, nx), INIT_DENSITY, dtype=dt),
                   T=jnp.full((nz, ny, nx), INIT_TEMP, dtype=dt))

    # ---- diagnostics ---------------------------------------------------------

    def is_finite(self) -> jax.Array:
        """Traceable all-finite check over u, v, w, p (the reference's NaN sweep,
        `solver_explicit_euler.c:560-575`)."""
        ok = jnp.isfinite(self.u).all() & jnp.isfinite(self.v).all()
        ok &= jnp.isfinite(self.w).all() & jnp.isfinite(self.p).all()
        return ok
