"""Variable-coefficient pressure Poisson for stretched (tanh) grids.

The reference discretizes the pressure Poisson equation with uniform
first-cell spacings even on stretched grids (`solver_projection.c:72-75`),
which caps projection accuracy at O(h) off uniform grids — the error
floor its own stretched-grid example documents
(`examples/poiseuille_stretched_grid.c:255-258`).  This module lifts the
framework past that: the exact 3-point nonuniform Laplacian
(`ns.common.consistent_triples`) as a :class:`PoissonProblem` subclass
whose building blocks make the *unmodified* Krylov solvers
(`krylov.make_cg` / `make_bicgstab`) correct on stretched grids.

Key identity: the consistent operator factors as L = D⁻¹·S with
D = diag(cell volumes) and S symmetric tridiagonal (face
transmissibilities 1/h) per axis — the finite-volume form.  L is
therefore self-adjoint in the volume-weighted inner product
⟨a, b⟩_V = Σ V·a·b, so CG applied with :meth:`dot_interior` overridden
to the V-weighted dot converges exactly as in the uniform case (where
V is constant and the weighting cancels).  No solver code changes.

The same factoring gives the direct solve: the generalized symmetric
eigenproblem S·q = λ·D·q yields a V-orthonormal eigenbasis Q
(Qᵀ D Q = I), so forward transform F = Qᵀ·D and inverse G = Q
diagonalize L per axis — the DST-I of the uniform spectral path is the
special case Q = sine modes.  :func:`make_nonuniform_direct` plugs these
dense factors into MXU matmuls + the z-TDMA, giving stretched grids the
same direct-solve speed class as the uniform FFT_DIRECT path.

Semantics match the uniform iterative solvers (CLAUDE.md): Dirichlet-0
correction space (shells never written by the iteration), Neumann applied
to x before/after, interior-only residual norms.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .base import (PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStatus)


def _axis_weights(gaps):
    """(lm, lc, lp, vol): consistent 3-point Laplacian weights and cell
    volumes per point (length n = len(gaps)+1), float64 numpy.  Edge
    entries substitute the edge gap for the missing one-sided spacing
    (finite values only; solvers consume interior points)."""
    from ..ns.common import consistent_triples
    _, _, _, lm, lc, lp = consistent_triples(gaps)
    h = np.asarray(gaps, np.float64)
    hm = np.concatenate([h[:1], h])
    hp = np.concatenate([h, h[-1:]])
    return lm, lc, lp, (hm + hp) / 2.0


@dataclasses.dataclass(frozen=True)
class NonuniformPoissonProblem(PoissonProblem):
    """Problem geometry with per-axis x/y gap sequences (z stays uniform —
    the framework-wide rule, `ns.common.validate_grid_for_solver`).

    ``dx``/``dy`` inherit the first-gap values so the base-class omega /
    frontend heuristics remain sensible; ``x_gaps``/``y_gaps`` are the
    full spacing tuples (hashable — the problem is a jit-static closure).
    """

    x_gaps: tuple = ()
    y_gaps: tuple = ()

    @classmethod
    def from_grid(cls, grid):
        return cls(nx=grid.nx, ny=grid.ny, nz=grid.nz,
                   dx=grid.dx0, dy=grid.dy0,
                   dz=(grid.dz0 if grid.nz > 1 else 0.0),
                   x_gaps=tuple(float(g) for g in grid.dx),
                   y_gaps=tuple(float(g) for g in grid.dy))

    # cached_property writes straight into __dict__, which frozen
    # dataclasses permit (only __setattr__ is blocked).
    @cached_property
    def _wx(self):
        return _axis_weights(self.x_gaps)

    @cached_property
    def _wy(self):
        return _axis_weights(self.y_gaps)

    @cached_property
    def _diag_np(self):
        """diag(−L) as (ny, nx) float64 numpy (z contributes 2/dz²)."""
        lcx = self._wx[1]
        lcy = self._wy[1]
        return (-lcx[None, :] - lcy[:, None]) + 2.0 * self.inv_dz2

    @cached_property
    def _vol_np(self):
        """(ny, nx) cell volumes, normalized to mean 1 over the interior
        (pure scaling of the inner product — keeps residual magnitudes,
        and therefore relative tolerances, comparable to uniform runs)."""
        v = self._wy[3][:, None] * self._wx[3][None, :]
        return v / v[1:-1, 1:-1].mean()

    @property
    def inv_factor(self):
        """1 / diag(−L), per point (Jacobi preconditioner weights)."""
        return 1.0 / self._diag_np

    def laplacian(self, x):
        lmx, lcx, lpx, _ = self._wx
        lmy, lcy, lpy, _ = self._wy
        dt = x.dtype
        cx = (jnp.roll(x, 1, -1) * jnp.asarray(lmx, dt)
              + x * jnp.asarray(lcx, dt)
              + jnp.roll(x, -1, -1) * jnp.asarray(lpx, dt))
        cy = (jnp.roll(x, 1, -2) * jnp.asarray(lmy, dt)[:, None]
              + x * jnp.asarray(lcy, dt)[:, None]
              + jnp.roll(x, -1, -2) * jnp.asarray(lpy, dt)[:, None])
        out = cx + cy
        if self.nz > 1:
            out = out + (jnp.roll(x, -1, -3) - 2.0 * x
                         + jnp.roll(x, 1, -3)) * self.inv_dz2
        return out

    def dot_interior(self, a, b):
        """Volume-weighted interior dot — the inner product in which the
        consistent operator is self-adjoint (SPD), making CG exact."""
        v = jnp.asarray(self._vol_np[1:-1, 1:-1], a.dtype)
        return jnp.sum(self.interior(a) * self.interior(b) * v)


def nonuniform_eigenbasis(gaps):
    """Per-axis dense factors diagonalizing the consistent 1D Laplacian
    on interior points with Dirichlet-0 ends.

    Returns ``(lam, F, G)``: eigenvalues of −L_axis (ascending, > 0) and
    (m, m) float64 forward/inverse matrices with m = n − 2, such that
    x̂ = F·x, x = G·x̂, and −L x = G·diag(lam)·F·x.  Computed from the
    symmetric FV form: S q = λ D q ⇒ with C = D^{1/2}, the standard
    symmetric problem (C⁻¹ S C⁻¹) u = λ u gives Q = C⁻¹·U,
    F = Qᵀ D = Uᵀ C, G = Q.  The uniform case reduces to the DST-I pair
    (`spectral._sine_matrix` et al.) up to column signs."""
    h = np.asarray(gaps, np.float64)
    n = h.size + 1
    m = n - 2
    vol = (h[:-1] + h[1:]) / 2.0                  # interior cell volumes
    inv_h = 1.0 / h
    # S: symmetric tridiagonal FV form of −L on interior points —
    # diag[k] = 1/h_k + 1/h_{k+1}, offdiag[k] = −1/h_{k+1}
    S = (np.diag(inv_h[:-1] + inv_h[1:])
         - np.diag(inv_h[1:-1], -1)
         - np.diag(inv_h[1:-1], 1))
    c = np.sqrt(vol)
    M = S / c[:, None] / c[None, :]
    lam, U = np.linalg.eigh(M)                    # symmetric, exact SPD
    F = U.T * c[None, :]
    G = U / c[:, None]
    assert lam.shape == (m,) and lam.min() > 0.0
    return lam, F, G


def nonuniform_face_coeffs(problem: NonuniformPoissonProblem):
    """b̃ face-coefficient scalars ``(cxm, cxp, cym, cyp)`` — the
    nonuniform off-diagonal Laplacian weights toward the dropped shell
    neighbor at i = 1, i = nx−2, j = 1, j = ny−2 (the x0-mirror shell
    term of the Krylov limit; uniform case: all four equal 1/h²).  Used
    by the fused consistent-scheme projection kernels, whose b̃ pass
    otherwise matches :func:`make_nonuniform_direct`'s convention."""
    nx, ny = problem.nx, problem.ny
    return (float(problem._wx[0][1]), float(problem._wx[2][nx - 2]),
            float(problem._wy[0][1]), float(problem._wy[2][ny - 2]))


def nonuniform_fused_supported(problem: NonuniformPoissonProblem) -> bool:
    """Whether the in-kernel eigenbasis-fused projection pieces apply —
    the same geometry gate as the uniform DST-fused path (3D, TDMA-z
    kernel shape, mode dims == grid dims); the dense generalized
    eigenbasis replaces the sine matrices, nothing else changes shape."""
    from .spectral import dst_fused_supported
    return dst_fused_supported(problem)


def _nonuniform_fused_mats(problem: NonuniformPoissonProblem, np_dt):
    """Shared factor builder for the eigenbasis-fused projection kernels:
    ``(mats, mu, w)`` with ``mats = (FxT, Fy, GxT, Gy)`` host numpy
    generalized-eigenbasis matrices padded to the grid dims (zero rows
    for the shell columns, mirror-extended inverse rows so the output
    carries its own Neumann shells — the exact structural twin of
    `spectral._dst_fused_mats`, with Q-eigenvectors in place of sines),
    ``mu`` the (ny, nx) per-mode eigenvalue-sum plane for the z line
    solve, ``w = 1/dz²``."""
    mx, my = problem.nx - 2, problem.ny - 2
    nx, ny = problem.nx, problem.ny
    lx, Fx, Gx = nonuniform_eigenbasis(problem.x_gaps)
    ly, Fy, Gy = nonuniform_eigenbasis(problem.y_gaps)
    w = float(problem.inv_dz2)
    mu_np = (np.pad(ly, (0, ny - my), mode="edge")[:, None]
             + np.pad(lx, (0, nx - mx), mode="edge")[None, :])

    Fxp = np.zeros((nx, nx), np_dt)
    Fxp[:mx, 1:nx - 1] = Fx
    Fyp = np.zeros((ny, ny), np_dt)
    Fyp[:my, 1:ny - 1] = Fy
    Gxp = np.zeros((nx, nx), np_dt)
    Gxp[:, :mx] = np.concatenate([Gx[:1], Gx, Gx[-1:]], axis=0)
    Gyp = np.zeros((ny, ny), np_dt)
    Gyp[:, :my] = np.concatenate([Gy[:1], Gy, Gy[-1:]], axis=0)
    mats = (np.ascontiguousarray(Fxp.T), Fyp,
            np.ascontiguousarray(Gxp.T), Gyp)
    return mats, mu_np, w


def make_nonuniform_fused_pieces(problem: NonuniformPoissonProblem,
                                 dtype=jnp.float32, use_kernel: bool = True,
                                 interpret: bool = False,
                                 fuse_fwd: bool = False):
    """Pieces for the eigenbasis-fused consistent-scheme projection step
    (`ops/pallas/projection_kernels.ProjectionKernels(dst_mats=...,
    stretch_consistent=...)`): the stretched-grid twin of
    `spectral.make_dst_fused_pieces` — the predictor mega kernel applies
    the forward generalized-eigenbasis transform per b̃ plane in-kernel
    (F = QᵀD dense MXU dots, exactly where the uniform path runs its
    sine matrices), the corrector applies the mirror-extended inverse
    (G = Q) per x̂ plane on window arrival, and only the z line solve —
    the unchanged uniform-z TDMA over the generalized eigenvalue sums —
    runs between the two sweeps.

    Returns ``(mats, zsolve)``, or with ``fuse_fwd=True``
    ``(mats, (mu_plane, w), zbwd)`` — identical contracts to
    :func:`spectral.make_dst_fused_pieces`; numerically the same factors
    as :func:`make_nonuniform_direct`'s einsums."""
    mats, mu_np, w = _nonuniform_fused_mats(problem, np.dtype(dtype))
    nx, ny, nz = problem.nx, problem.ny, problem.nz
    np_dt = np.dtype(dtype)

    from ...ops.pallas.tdma import (make_tdma_z, make_tdma_z_bwd,
                                    tdma_z_bwd_reference, tdma_z_reference)

    if fuse_fwd:
        zbwd = None
        if use_kernel and dtype == jnp.float32:
            zbwd = make_tdma_z_bwd(nz, ny, nx, mu_np, w, jnp.float32,
                                   interpret=interpret)
        if zbwd is None:
            zbwd = tdma_z_bwd_reference
        return mats, (mu_np.astype(np_dt), w), zbwd

    zfn = None
    if use_kernel and dtype == jnp.float32:
        zfn = make_tdma_z(nz, ny, nx, mu_np, w, jnp.float32,
                          interpret=interpret)
    if zfn is None:
        # numpy held, converted per trace (trace safety, docs/design.md)
        def zfn(a, _mu=mu_np.astype(np_dt)):
            return tdma_z_reference(a, jnp.asarray(_mu), w)

    return mats, zfn


def nonuniform_fused_sharded_supported(problem: NonuniformPoissonProblem,
                                       n_shards: int) -> bool:
    """Whether the z-sharded eigenbasis-fused projection applies — the
    same geometry gate as the uniform DST-fused sharded path (the dense
    generalized eigenbasis has the same shapes as the sine matrices)."""
    from .spectral import dst_fused_sharded_supported
    return dst_fused_sharded_supported(problem, n_shards)


def make_nonuniform_fused_sharded_pieces(problem: NonuniformPoissonProblem,
                                         n_shards: int,
                                         axis_name: str = "z",
                                         dtype=jnp.float32,
                                         use_kernel: bool = True,
                                         interpret: bool = False):
    """z-sharded twin of :func:`make_nonuniform_fused_pieces` for use
    inside ``shard_map`` — the consistent-scheme analog of
    `spectral.make_dst_fused_sharded_pieces`: the generalized-eigenbasis
    xy transforms stay in the per-shard mega kernels (plane-local under z
    decomposition), and the returned ``zsolve_local`` runs the z line
    solve as two y-pencil ``all_to_all``s around a runtime-μ TDMA over
    the generalized eigenvalue sums (z stays uniform framework-wide, so
    the Thomas coefficients are the uniform ``w = 1/dz²``)."""
    P = int(n_shards)
    if not nonuniform_fused_sharded_supported(problem, P):
        raise ValueError("eigenbasis-fused sharded pieces unsupported for "
                         "this (problem, n_shards)")
    np_dt = np.dtype(dtype)
    mats, mu_np, w = _nonuniform_fused_mats(problem, np_dt)
    from .spectral import _make_sharded_zsolve
    zsolve_local = _make_sharded_zsolve(
        mu_np.astype(np_dt), w, problem.nz, problem.ny, problem.nx, P,
        axis_name, dtype, use_kernel, interpret)
    return mats, zsolve_local


def make_nonuniform_direct(problem: NonuniformPoissonProblem,
                           params: PoissonParams = None,
                           dtype=None, precision=None):
    """Direct solve with the Krylov fixed-point semantics: the interior
    Dirichlet-0 system (−L_D)·x = b̃ with b̃ = face_coeff·x0 − rhs (the
    x0-mirror shell data the converged CG limit carries — the same b̃
    convention as the uniform `spectral.make_fft_direct`), Neumann
    shells applied on output like the iterative paths.

    The x/y axes diagonalize through the dense generalized eigenbasis
    (MXU matmuls, HIGHEST precision by default — same compute class as
    the uniform DST path); 3D adds the uniform-z Thomas solve
    (`tdma.tdma_z_reference`) over per-mode eigenvalue sums.
    """
    del params
    dtype = dtype or jnp.float64
    prec = precision or jax.lax.Precision.HIGHEST
    lx, Fx, Gx = nonuniform_eigenbasis(problem.x_gaps)
    ly, Fy, Gy = nonuniform_eigenbasis(problem.y_gaps)
    np_dt = np.dtype(jnp.float32 if dtype == jnp.float32 else np.float64)
    mats = tuple(a.astype(np_dt) for a in (Fx, Fy, Gx, Gy))
    mu_np = (ly[:, None] + lx[None, :]).astype(np_dt)  # (my, mx) > 0
    w = float(problem.inv_dz2)

    # b̃ face coefficients: the x0-mirror shell term the Krylov limit
    # carries (same convention as the uniform `spectral.make_fft_direct`
    # b̃ = coeff·x − rhs; the weights are the nonuniform off-diagonals
    # toward the dropped shell neighbor).
    nz, ny, nx = problem.shape
    fxc = np.zeros(nx)
    fxc[1], fxc[nx - 2] = problem._wx[0][1], problem._wx[2][nx - 2]
    fyc = np.zeros(ny)
    fyc[1], fyc[ny - 2] = problem._wy[0][1], problem._wy[2][ny - 2]
    fzc = np.zeros(max(nz, 1))
    if nz > 1:
        fzc[1] = fzc[nz - 2] = w

    def solve(x0, rhs):
        coeff = (jnp.asarray(fzc, dtype)[:, None, None]
                 + jnp.asarray(fyc, dtype)[None, :, None]
                 + jnp.asarray(fxc, dtype)[None, None, :])
        bt = coeff * x0 - rhs                    # (−L_D)·x_new = b̃
        b = bt[..., 1:-1, 1:-1]                  # (nz|1, my, mx) interior
        fx, fy, gx, gy = (jnp.asarray(a, dtype) for a in mats)
        # modes (..., cy, ax): B̂ = Fy · P · Fxᵀ per plane
        bh = jnp.einsum("cj,...jb,ab->...ca", fy, b, fx, precision=prec)
        if problem.nz > 1:
            from ...ops.pallas.tdma import tdma_z_reference
            pad = jnp.zeros_like(bh[:1])
            xh = tdma_z_reference(
                jnp.concatenate([pad, bh[1:-1], pad], 0),
                jnp.asarray(mu_np, dtype), w)[1:-1]
        else:
            xh = bh / jnp.asarray(mu_np, dtype)
        xi = jnp.einsum("jc,...ca,ia->...ji", gy, xh, gx, precision=prec)
        x = jnp.zeros(problem.shape, dtype)
        if problem.nz > 1:
            x = x.at[1:-1, 1:-1, 1:-1].set(xi)
        else:
            x = x.at[:, 1:-1, 1:-1].set(xi)
        x = problem.neumann_bc(x)
        # CG-convention residual: converged interior inside the INITIAL
        # mirror shell (matches `spectral.make_fft_direct`).
        xh0 = problem.set_interior(problem.neumann_bc(x0), x)
        r_f = problem.zero_boundary(problem.laplacian(xh0) - rhs)
        res = jnp.sqrt(problem.dot_interior(r_f, r_f))
        return PoissonResult(x=x, iterations=jnp.int32(1),
                             initial_residual=jnp.zeros((), dtype),
                             final_residual=res,
                             status=jnp.int32(PoissonStatus.CONVERGED))

    return jax.jit(solve)
