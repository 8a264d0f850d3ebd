"""Structured grid geometry (uniform and tanh-stretched).

TPU-native re-design of the reference grid (`lib/include/cfd/core/grid.h:18-89`,
`lib/src/core/grid.c:92-191`).  Key differences from the C design:

* The grid is **static configuration**, not device data.  Coordinate and
  spacing arrays are host numpy arrays; solvers close over them when building
  jitted step functions, so XLA embeds them as constants (a grid never changes
  during a simulation).
* The reference's precomputed branch-free 3D constants (``stride_z``,
  ``inv_dz2``, ``k_start/k_end``; `grid.c:60-75`) survive as properties — with
  vectorized array code the ``inv_dz2 = 0`` trick is exactly as effective as
  in the C scalar loops (z-stencil terms multiply to zero when nz == 1).

Array layout convention for fields defined on this grid: ``(nz, ny, nx)`` with
x fastest — matching the reference's row-major ``IDX_3D`` layout
(`core/indexing.h:17-20`) and putting the unit-stride axis on the TPU lane
dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import resolve_dtype
from .status import CFDError, Status


@dataclasses.dataclass(frozen=True)
class Grid:
    """Structured (optionally stretched) collocated grid.

    Coordinates are node-centered: ``x[0] == xmin``, ``x[nx-1] == xmax``.
    ``dx[i] = x[i+1] - x[i]`` (length nx-1), as in `grid.c:107-112`.
    """

    nx: int
    ny: int
    nz: int
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    zmin: float
    zmax: float
    x: np.ndarray
    y: np.ndarray
    dx: np.ndarray
    dy: np.ndarray
    z: Optional[np.ndarray] = None
    dz: Optional[np.ndarray] = None
    inv_dz2: float = 0.0

    # ---- construction -----------------------------------------------------

    @staticmethod
    def _validate(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax):
        if nx <= 0 or ny <= 0 or nz <= 0:
            raise CFDError(Status.ERROR_INVALID,
                           "grid dimensions must be positive")
        if xmax <= xmin or ymax <= ymin:
            raise CFDError(Status.ERROR_INVALID,
                           "grid bounds invalid (max must be > min)")
        if nz > 1 and zmax <= zmin:
            raise CFDError(Status.ERROR_INVALID,
                           "grid z-bounds invalid (zmax must be > zmin when nz > 1)")

    @classmethod
    def uniform(cls, nx: int, ny: int, nz: int = 1,
                xmin: float = 0.0, xmax: float = 1.0,
                ymin: float = 0.0, ymax: float = 1.0,
                zmin: float = 0.0, zmax: float = 0.0) -> "Grid":
        """Uniform grid (mirrors grid_create + grid_initialize_uniform)."""
        cls._validate(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax)
        x = np.linspace(xmin, xmax, nx)
        y = np.linspace(ymin, ymax, ny)
        dx = np.diff(x)
        dy = np.diff(y)
        z = dz = None
        inv_dz2 = 0.0
        if nz > 1:
            z = np.linspace(zmin, zmax, nz)
            dz = np.diff(z)
            inv_dz2 = 1.0 / float(dz[0] ** 2)
        return cls(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax,
                   x, y, dx, dy, z, dz, inv_dz2)

    @classmethod
    def stretched(cls, nx: int, ny: int, nz: int = 1,
                  xmin: float = 0.0, xmax: float = 1.0,
                  ymin: float = 0.0, ymax: float = 1.0,
                  zmin: float = 0.0, zmax: float = 0.0,
                  beta: float = 0.0, stretch_axes: str = "xyz") -> "Grid":
        """Tanh-stretched grid clustering points at both boundaries.

        x[i] = xmin + L * (1 + tanh(beta*(2*xi - 1)) / tanh(beta)) / 2,
        xi = i/(n-1) — the formula at `grid.c:129-160`.  beta≈0 falls back to
        uniform (tanh(0)=0 would divide by zero).

        ``stretch_axes`` selects which axes stretch (default all, the
        reference's behavior); the rest stay uniform.  E.g. ``"y"`` builds
        the wall-resolved-channel layout — and 3D grids stretched in x/y
        only keep the uniform-z layout the NS integrators require (and
        that the fused kernels' per-point coefficient pins support).
        """
        bad = set(stretch_axes) - set("xyz")
        if bad or not stretch_axes:
            raise ValueError(f"stretch_axes must name axes from 'xyz', "
                             f"got {stretch_axes!r}")
        if abs(beta) < 1e-10:
            return cls.uniform(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax)
        cls._validate(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax)

        tb = np.tanh(beta)

        def stretch(n, lo, hi, axis):
            if axis not in stretch_axes:
                return np.linspace(lo, hi, n)
            xi = np.arange(n) / (n - 1)
            return lo + (hi - lo) * (1.0 + np.tanh(beta * (2.0 * xi - 1.0)) / tb) / 2.0

        x = stretch(nx, xmin, xmax, "x")
        y = stretch(ny, ymin, ymax, "y")
        dx = np.diff(x)
        dy = np.diff(y)
        z = dz = None
        inv_dz2 = 0.0
        if nz > 1:
            z = stretch(nz, zmin, zmax, "z")
            dz = np.diff(z)
            # Conservative: min dz, as in grid.c:182-189.
            inv_dz2 = 1.0 / float(np.min(dz) ** 2)
        return cls(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax,
                   x, y, dx, dy, z, dz, inv_dz2)

    # ---- derived (branch-free 2D/3D) constants -----------------------------

    @property
    def is_3d(self) -> bool:
        return self.nz > 1

    @property
    def k_start(self) -> int:
        return 1 if self.nz > 1 else 0

    @property
    def k_end(self) -> int:
        return self.nz - 1 if self.nz > 1 else 1

    @property
    def shape(self):
        """Field array shape (nz, ny, nx)."""
        return (self.nz, self.ny, self.nx)

    @property
    def dx0(self) -> float:
        return float(self.dx[0])

    @property
    def dy0(self) -> float:
        return float(self.dy[0])

    @property
    def dz0(self) -> float:
        """First z-spacing; 0.0 in 2D (the inv_dz2=0 convention)."""
        return float(self.dz[0]) if self.nz > 1 else 0.0

    # ---- helpers ------------------------------------------------------------

    def is_uniform(self, axis: str = "all", rtol: float = 1e-12) -> bool:
        """Check (near-)uniform spacing, as the energy solver requires
        (`energy_solver.c:55-91`)."""
        def uni(d):
            if d is None or len(d) == 0:
                return True
            tol = rtol * max(1.0, abs(float(d[0])))
            return bool(np.all(np.abs(d - d[0]) <= tol))

        if axis == "x":
            return uni(self.dx)
        if axis == "y":
            return uni(self.dy)
        if axis == "z":
            return uni(self.dz)
        return uni(self.dx) and uni(self.dy) and uni(self.dz)

    def coordinate_arrays(self, dtype=None):
        """Broadcastable (nz,ny,nx) coordinate arrays X, Y, Z.

        Used by traceable source-term callables (the TPU replacement for the
        reference's per-point host callbacks, `navier_stokes_solver.h:77-92`).

        Returned as numpy constants on purpose (trace-safety): solver
        factories call this at build time and capture the results in step
        closures; a jnp array created while an enclosing trace is active
        (a differentiable step built under ``jax.jit(jax.grad(...))``)
        would be a tracer and leak across scan re-staging.  jnp consumers
        convert at trace time.
        """
        import numpy as _np
        dt = _np.dtype(resolve_dtype(dtype))
        X = _np.asarray(self.x, dtype=dt)[None, None, :]
        Y = _np.asarray(self.y, dtype=dt)[None, :, None]
        if self.nz > 1:
            Z = _np.asarray(self.z, dtype=dt)[:, None, None]
        else:
            Z = _np.zeros((1, 1, 1), dtype=dt)
        return X, Y, Z
