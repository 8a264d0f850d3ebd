"""Variable-coefficient (stretched-grid) pressure Poisson
(`solvers/poisson/nonuniform.py`).

The consistent 3-point operator factors as L = D⁻¹·S (FV form), so CG
with the volume-weighted dot is exact Krylov on an SPD system and the
generalized eigenbasis gives a direct solve.  Tests pin (1) the operator
against a dense matrix build, (2) unmodified make_cg/make_bicgstab
convergence on stretched grids to the dense solution, (3) the direct
eigen solve against the dense solution and its uniform-grid reduction to
the DST path.  Reference error floor this module lifts:
`/root/reference/examples/poiseuille_stretched_grid.c:255-258`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import Grid
from cfd_tpu.solvers.poisson.base import PoissonParams
from cfd_tpu.solvers.poisson.krylov import make_bicgstab, make_cg
from cfd_tpu.solvers.poisson.nonuniform import (NonuniformPoissonProblem,
                                                make_nonuniform_direct,
                                                nonuniform_eigenbasis)


def _grid(nx=18, ny=14, nz=1, beta=1.5):
    if nz > 1:
        return Grid.stretched(nx, ny, nz, xmax=2.0, ymax=1.0, beta=beta,
                              zmin=0.0, zmax=1.0)
    return Grid.stretched(nx, ny, xmax=2.0, ymax=1.0, beta=beta)


def _dense_operator(problem):
    """−L as a dense matrix over interior unknowns (Dirichlet-0)."""
    nz, ny, nx = problem.shape
    kz = range(1, nz - 1) if nz > 1 else range(nz)
    idx = {}
    for k in kz:
        for j in range(1, ny - 1):
            for i in range(1, nx - 1):
                idx[(k, j, i)] = len(idx)
    n = len(idx)
    A = np.zeros((n, n))
    lmx, lcx, lpx, _ = problem._wx
    lmy, lcy, lpy, _ = problem._wy
    w = problem.inv_dz2
    for (k, j, i), r in idx.items():
        A[r, r] = -(lcx[i] + lcy[j]) + 2.0 * w
        for (dk, dj, di, c) in ((0, 0, -1, -lmx[i]), (0, 0, 1, -lpx[i]),
                                (0, -1, 0, -lmy[j]), (0, 1, 0, -lpy[j]),
                                (-1, 0, 0, -w), (1, 0, 0, -w)):
            nb = (k + dk, j + dj, i + di)
            if nb in idx:
                A[r, idx[nb]] = c
    return A, idx


def _dense_solve(problem, rhs):
    A, idx = _dense_operator(problem)
    b = np.array([-rhs[k] for k in idx])
    xi = np.linalg.solve(A, b)
    x = np.zeros(problem.shape)
    for pos, r in idx.items():
        x[pos] = xi[r]
    # mirrored-Neumann shells like problem.neumann_bc
    x[:, :, 0], x[:, :, -1] = x[:, :, 1], x[:, :, -2]
    x[:, 0, :], x[:, -1, :] = x[:, 1, :], x[:, -2, :]
    if problem.nz > 1:
        x[0], x[-1] = x[1], x[-2]
    return x


def _random_rhs(problem, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.standard_normal(problem.shape)
    return np.asarray(problem.zero_boundary(jnp.asarray(r)))


def test_operator_matches_dense():
    problem = NonuniformPoissonProblem.from_grid(_grid())
    A, idx = _dense_operator(problem)
    rng = np.random.default_rng(1)
    x = np.asarray(problem.zero_boundary(
        jnp.asarray(rng.standard_normal(problem.shape))))
    got = -np.asarray(problem.laplacian(jnp.asarray(x)))
    want_flat = A @ np.array([x[k] for k in idx])
    got_flat = np.array([got[k] for k in idx])
    np.testing.assert_allclose(got_flat, want_flat, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("nz", [1, 10])
@pytest.mark.parametrize("maker", [make_cg, make_bicgstab])
def test_krylov_converges_on_stretched(maker, nz):
    """Unmodified Krylov solvers on the nonuniform problem: converged
    status and the dense interior solution (the volume-weighted dot is
    what makes CG legitimate here)."""
    problem = NonuniformPoissonProblem.from_grid(_grid(nz=nz))
    rhs = _random_rhs(problem, seed=nz)
    solve = maker(problem, PoissonParams(tolerance=1e-12,
                                         absolute_tolerance=1e-12,
                                         max_iterations=2000))
    res = solve(jnp.zeros(problem.shape), jnp.asarray(rhs))
    assert int(res.status) == 0
    want = _dense_solve(problem, rhs)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=0,
                               atol=1e-8 * scale)


@pytest.mark.parametrize("nz", [1, 10])
def test_direct_matches_dense(nz):
    problem = NonuniformPoissonProblem.from_grid(_grid(nz=nz))
    rhs = _random_rhs(problem, seed=7 + nz)
    solve = make_nonuniform_direct(problem)
    res = solve(jnp.zeros(problem.shape), jnp.asarray(rhs))
    assert int(res.status) == 0
    want = _dense_solve(problem, rhs)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=0,
                               atol=1e-10 * scale)


@pytest.mark.parametrize("nz", [1, 10])
def test_direct_matches_converged_cg_from_x0(nz):
    """Krylov fixed-point semantics: the converged-CG limit carries the
    x0 mirror-shell data (CLAUDE.md: Dirichlet-0 correction space), and
    the direct solve's b̃ = face_coeff·x0 − rhs reproduces it exactly."""
    problem = NonuniformPoissonProblem.from_grid(_grid(nz=nz))
    rng = np.random.default_rng(11 + nz)
    rhs = _random_rhs(problem, seed=3 + nz)
    x0 = jnp.asarray(rng.standard_normal(problem.shape))
    cg = make_cg(problem, PoissonParams(tolerance=1e-13,
                                        absolute_tolerance=1e-13,
                                        max_iterations=4000))
    want = cg(x0, jnp.asarray(rhs))
    assert int(want.status) == 0
    got = make_nonuniform_direct(problem)(x0, jnp.asarray(rhs))
    scale = np.abs(np.asarray(want.x)).max()
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=0, atol=1e-7 * scale)


def test_eigenbasis_uniform_reduces_to_dst():
    """On a uniform axis the generalized eigenbasis spans the DST-I
    modes: same eigenvalues, and F·G = I (bi-orthogonality)."""
    n, d = 12, 0.31
    lam, F, G = nonuniform_eigenbasis(np.full(n - 1, d))
    m = n - 2
    a = np.arange(1, m + 1)
    lam_dst = np.sort((2.0 / d**2) * (1.0 - np.cos(np.pi * a / (m + 1))))
    np.testing.assert_allclose(np.sort(lam), lam_dst, rtol=1e-12)
    np.testing.assert_allclose(F @ G, np.eye(m), atol=1e-12)


def test_quadratic_exactness():
    """The consistent operator is exact for quadratics on ANY grid —
    the property the parity (uniform-index) discretization lacks."""
    problem = NonuniformPoissonProblem.from_grid(_grid(nx=20, ny=16,
                                                       beta=2.0))
    g = _grid(nx=20, ny=16, beta=2.0)
    x, y = np.asarray(g.x), np.asarray(g.y)
    p = (x[None, None, :] ** 2 + 0.5 * y[None, :, None] ** 2
         + 0.2 * x[None, None, :])
    lap = np.asarray(problem.laplacian(jnp.asarray(p)))
    np.testing.assert_allclose(lap[:, 1:-1, 1:-1], 3.0, rtol=1e-10)
