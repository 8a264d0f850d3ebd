"""Poisson solver suite: shared types and device-side building blocks.

TPU-native re-design of the reference linear-solver suite
(`lib/include/cfd/solvers/poisson_solver.h`, `lib/src/solvers/linear/`).
The C design — a vtable of (method × backend) implementations driven by a
host-side iteration loop with per-iteration BC application and residual
checks — becomes, per method, ONE jitted function whose iteration loop is a
``lax.while_loop`` carried entirely on device.  There is no backend axis:
XLA is the backend.

Semantics preserved from the reference:

* solve ∇²x = rhs on interior points [1, n-2] with default Neumann BCs
  (`linear_solver.c:348-392`);
* relative tolerance ``tol·‖r₀‖`` floored by ``absolute_tolerance``
  (`linear_solver.c:416-421`);
* stationary methods measure the ∞-norm residual ‖∇²x − rhs‖∞
  (`linear_solver.c:304-346`), Krylov methods the L2 norm of their recursion
  residual (`linear_solver_cg.c:341`);
* convergence is only *checked* every ``check_interval`` iterations
  (`linear_solver.c:461-472`);
* status codes CONVERGED / MAX_ITER / DIVERGED / STAGNATED.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
import numpy as np

from ...boundary.apply import apply_neumann_scalar
from ...core.status import CFDError, Status


class Method(enum.IntEnum):
    """Mirrors poisson_solver_method_t (`poisson_solver.h:53-61`)."""

    JACOBI = 0
    GAUSS_SEIDEL = 1
    SOR = 2
    REDBLACK_SOR = 3
    CG = 4
    BICGSTAB = 5
    MULTIGRID = 6
    FFT_DIRECT = 7   # TPU extension: exact DST-I solve on uniform grids


class PoissonStatus(enum.IntEnum):
    """Mirrors poisson_solver_status_t (`poisson_solver.h:77-83`)."""

    CONVERGED = 0
    MAX_ITER = 1
    DIVERGED = 2
    STAGNATED = 3
    ERROR = -1


class Precond(enum.IntEnum):
    NONE = 0
    JACOBI = 1
    MULTIGRID = 2  # cfd_tpu extension: one symmetric V-cycle per apply


@dataclasses.dataclass(frozen=True)
class PoissonParams:
    """Mirrors poisson_solver_params_t with the same defaults
    (`linear_solver.c:37-47`)."""

    tolerance: float = 1e-6
    absolute_tolerance: float = 1e-10
    max_iterations: int = 5000
    omega: float = 0.0          # 0 = auto-optimal from grid dims
    check_interval: int = 1
    verbose: bool = False
    preconditioner: Precond = Precond.NONE


@dataclasses.dataclass(frozen=True)
class PoissonStats:
    """Host-side stats (mirrors poisson_solver_stats_t)."""

    status: PoissonStatus = PoissonStatus.ERROR
    iterations: int = 0
    initial_residual: float = 0.0
    final_residual: float = 0.0
    elapsed_time_ms: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonResult:
    """Device-side solve result flowing out of the jitted loop."""

    x: jax.Array
    iterations: jax.Array        # int32
    initial_residual: jax.Array
    final_residual: jax.Array
    status: jax.Array            # int32 PoissonStatus code


@dataclasses.dataclass(frozen=True)
class PoissonProblem:
    """Static problem geometry (nz==1, dz==0 for 2D)."""

    nx: int
    ny: int
    nz: int = 1
    dx: float = 1.0
    dy: float = 1.0
    dz: float = 0.0

    def __post_init__(self):
        # Same dimensional validation as poisson_solver_init
        # (`linear_solver.c:256-259`).
        if self.nx < 3 or self.ny < 3 or (self.nz > 1 and self.nz < 3):
            raise CFDError(Status.ERROR_INVALID,
                           "Poisson grid needs >= 3 points per active axis")

    @property
    def shape(self):
        return (self.nz, self.ny, self.nx)

    @property
    def inv_dx2(self) -> float:
        return 1.0 / (self.dx * self.dx)

    @property
    def inv_dy2(self) -> float:
        return 1.0 / (self.dy * self.dy)

    @property
    def inv_dz2(self) -> float:
        """0 when dz==0 (2D) — poisson_solver_compute_inv_dz2."""
        return 1.0 / (self.dz * self.dz) if self.dz > 0.0 else 0.0

    @property
    def inv_factor(self) -> float:
        """1 / diag of the (negative) Laplacian."""
        return 1.0 / (2.0 * (self.inv_dx2 + self.inv_dy2 + self.inv_dz2))

    @property
    def is_3d(self) -> bool:
        return self.nz > 1

    def optimal_omega(self) -> float:
        """Auto-optimal SOR omega from the Jacobi spectral radius
        (`linear_solver_internal.h:184-203`)."""
        inv_dx2, inv_dy2, inv_dz2 = self.inv_dx2, self.inv_dy2, self.inv_dz2
        num = (np.cos(np.pi / (self.nx - 1)) * inv_dx2
               + np.cos(np.pi / (self.ny - 1)) * inv_dy2)
        denom = inv_dx2 + inv_dy2
        if self.nz > 1 and inv_dz2 > 0.0:
            num += np.cos(np.pi / (self.nz - 1)) * inv_dz2
            denom += inv_dz2
        rho_j = num / denom
        return float(2.0 / (1.0 + np.sqrt(1.0 - rho_j * rho_j)))

    def resolve_omega(self, omega: float) -> float:
        return self.optimal_omega() if omega <= 0.0 else float(omega)

    # ---- device-side building blocks ---------------------------------------

    def interior(self, a):
        """Interior view [k_start:k_end, 1:-1, 1:-1]."""
        if self.nz > 1:
            return a[1:-1, 1:-1, 1:-1]
        return a[:, 1:-1, 1:-1]

    def zero_boundary(self, a):
        """a with its boundary shell zeroed (interior kept)."""
        z = jnp.zeros_like(a)
        if self.nz > 1:
            return z.at[1:-1, 1:-1, 1:-1].set(a[1:-1, 1:-1, 1:-1])
        return z.at[:, 1:-1, 1:-1].set(a[:, 1:-1, 1:-1])

    def set_interior(self, dst, src):
        if self.nz > 1:
            return dst.at[1:-1, 1:-1, 1:-1].set(src[1:-1, 1:-1, 1:-1])
        return dst.at[:, 1:-1, 1:-1].set(src[:, 1:-1, 1:-1])

    def laplacian(self, x):
        """Full-array 5/7-point Laplacian; only interior entries meaningful."""
        out = ((jnp.roll(x, -1, -1) - 2.0 * x + jnp.roll(x, 1, -1)) * self.inv_dx2
               + (jnp.roll(x, -1, -2) - 2.0 * x + jnp.roll(x, 1, -2)) * self.inv_dy2)
        if self.nz > 1:
            out = out + (jnp.roll(x, -1, -3) - 2.0 * x
                         + jnp.roll(x, 1, -3)) * self.inv_dz2
        return out

    def residual_inf(self, x, rhs):
        """‖∇²x − rhs‖∞ over interior (`linear_solver.c:304-346`)."""
        r = self.laplacian(x) - rhs
        return jnp.max(jnp.abs(self.interior(r)))

    def dot_interior(self, a, b):
        """Interior dot product (`linear_solver_cg.c:67-80`), accumulated in
        the array dtype (f32 on TPU uses compensated-free jnp.sum which XLA
        reduces in f32; for large grids prefer f32 fields + this being fine
        because CG re-orthogonalizes every iteration)."""
        return jnp.sum(self.interior(a) * self.interior(b))

    def neumann_bc(self, x):
        """Default Neumann BC on all faces (`linear_solver.c:361-392`)."""
        return apply_neumann_scalar(x)

    def tolerance_for(self, params: PoissonParams, initial_res):
        tol = params.tolerance * initial_res
        return jnp.maximum(tol, params.absolute_tolerance)


def result_to_stats(result: PoissonResult, elapsed_ms: float = 0.0) -> PoissonStats:
    return PoissonStats(
        status=PoissonStatus(int(result.status)),
        iterations=int(result.iterations),
        initial_residual=float(result.initial_residual),
        final_residual=float(result.final_residual),
        elapsed_time_ms=float(elapsed_ms))
