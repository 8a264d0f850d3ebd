"""Reverse-mode-differentiable Poisson solves (adjoint method).

A capability the C reference cannot offer: because the whole framework is
JAX, a simulation step — and therefore a whole rollout — can be
differentiated for design optimization, control, and data assimilation.
The one non-differentiable piece is the iterative pressure solve (its
``lax.while_loop`` has no reverse rule); this module supplies the exact
adjoint via ``jax.custom_vjp`` so the solve costs ONE extra solve of the
same operator on the backward pass (the discrete operators here are
symmetric, so the transpose solve *is* the forward solve).

Exactness, by solver family
---------------------------

**Correction-space family** (CG, BiCGSTAB, MULTIGRID, MG-preconditioned
CG — the convention of `linear_solver_cg.c:103-123`): the solver applies
the mirrored-Neumann BC to x once up front, then iterates corrections
with zero boundary shells.  At convergence the output interior is exactly

    x_int = lap_D^{-1} (rhs_int - B x0_int)

where ``lap_D`` is the Dirichlet-0 interior Laplacian (symmetric) and
``B`` is the diagonal matrix with ``1/dx_a^2`` at interior cells adjacent
to each boundary face (the Neumann mirror folded into the operator).  The
VJP is therefore *exact up to solver tolerance*:

    lam    = lap_D^{-1} fold(x_bar)        (one solve, same method)
    rhs_bar = E lam                        (embed, zero shell)
    x0_bar  = -B lam

with ``fold`` the transpose of the final Neumann-shell application.

**Stationary family** (Jacobi, SOR, Red-Black SOR): each sweep is
followed by the Neumann mirror, so the fixed point solves the (singular)
mirrored-Neumann system ``lap_N x = rhs``.  ``lap_N`` is symmetric, so
the adjoint is again one solve of the same method, with two caveats tied
to the operator's constant null space: (1) the gradient is defined only
along compatible (mean-zero) rhs directions — the adjoint right-hand
side is projected accordingly; (2) the iteration's transient leaves a
rank-one constant-mode term in the output that the adjoint does not
track, so gradients are exact only for *gauge-invariant* losses (those
insensitive to the arbitrary +const of a Neumann pressure — which any
physically meaningful loss is).  The correction-space family above has
neither caveat; prefer it when differentiating.

**FFT_DIRECT** is a direct DST-I solve built from einsums and is natively
reverse-differentiable; it is returned unwrapped.

The fused Pallas paths stay forward-only: differentiate with
``use_pallas=False`` (the jnp path is the numerics reference anyway).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Method, PoissonParams, PoissonProblem, PoissonResult

#: Methods whose one-shot solve map is x = lap_D^{-1}(rhs - B x0).
CORRECTION_SPACE_METHODS = frozenset(
    {Method.CG, Method.BICGSTAB, Method.MULTIGRID})
#: Methods converging to the mirrored-Neumann fixed point lap_N x = rhs.
STATIONARY_METHODS = frozenset(
    {Method.JACOBI, Method.GAUSS_SEIDEL, Method.SOR, Method.REDBLACK_SOR})


def _mirror_diag(problem: PoissonProblem) -> np.ndarray:
    """Diagonal of B: per interior cell, sum of the Laplacian off-diagonal
    weights over adjacent faces (1/dh² uniform; the consistent 3-point
    face weights on a :class:`nonuniform.NonuniformPoissonProblem`).

    Nonzero only on the ring of interior cells touching the boundary shell
    (shell-edge/corner values are never read by interior stencils, so the
    "last face wins" order of the Neumann application is irrelevant here).
    """
    from .nonuniform import (NonuniformPoissonProblem,
                             nonuniform_face_coeffs)
    if isinstance(problem, NonuniformPoissonProblem):
        cxm, cxp, cym, cyp = nonuniform_face_coeffs(problem)
    else:
        cxm = cxp = problem.inv_dx2
        cym = cyp = problem.inv_dy2
    b = np.zeros(problem.shape)
    b[:, :, 1] += cxm
    b[:, :, -2] += cxp
    b[:, 1, :] += cym
    b[:, -2, :] += cyp
    if problem.nz > 1:
        b[1, :, :] += problem.inv_dz2
        b[-2, :, :] += problem.inv_dz2
        b[0] = b[-1] = 0.0
    b[:, 0, :] = b[:, -1, :] = 0.0
    b[:, :, 0] = b[:, :, -1] = 0.0
    return b


def _fold_neumann(problem: PoissonProblem, xbar):
    """Transpose of the final Neumann-shell application.

    ``neumann_bc`` is linear, so its vjp at any primal point is the exact
    transpose: boundary cotangents fold back into their mirror sources.
    """
    _, vjp = jax.vjp(problem.neumann_bc, jnp.zeros_like(xbar))
    (ybar,) = vjp(xbar)
    return ybar


def make_adjoint_poisson(problem: PoissonProblem,
                         params: PoissonParams = None,
                         method: Method = Method.CG):
    """Build a reverse-differentiable ``solve(x0, rhs) -> PoissonResult``.

    The forward pass is the unmodified solver for ``method`` (same
    iteration counts, same statuses); the backward pass runs one extra
    solve of the same solver.  Gradients flow to both ``rhs`` and — for
    the correction-space family, exactly — ``x0``.
    """
    from .frontend import _MAKERS  # late import: frontend imports us
    from .nonuniform import NonuniformPoissonProblem

    method = Method(method)
    params = params or PoissonParams()
    nonuniform = isinstance(problem, NonuniformPoissonProblem)
    if method == Method.FFT_DIRECT:
        if nonuniform:
            # einsum + lax.scan TDMA: natively reverse-differentiable
            from .nonuniform import make_nonuniform_direct
            return make_nonuniform_direct(problem, params)
        return _MAKERS[method](problem, params)  # natively differentiable
    if nonuniform and method not in (Method.CG, Method.BICGSTAB):
        from ...core.status import CFDError, Status
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "adjoint solves on a nonuniform (consistent-scheme) "
                       "problem support FFT_DIRECT/CG/BICGSTAB only")
    # Unwrap the maker's jit: a pjit called from inside a lax.scan body
    # that closes over an outer tracer (traced physics params under
    # ``jax.jit(jax.grad(rollout))``) leaks that tracer into the pjit
    # lowering cache.  The solve is always used inside an enclosing jit,
    # so the wrapper buys nothing here.
    base = _MAKERS[method](problem, params)
    base = getattr(base, "__wrapped__", base)
    correction = method in CORRECTION_SPACE_METHODS
    bdiag = None
    if correction:
        # numpy on purpose (trace-safety): converted per trace inside bwd.
        bdiag = _mirror_diag(problem)
    # Nonuniform (consistent-scheme) operator: L = D⁻¹S with S symmetric,
    # so the plain-inner-product transpose of the solve is the volume
    # conjugation (L_D⁻¹)ᵀ = V · L_D⁻¹ · V⁻¹ — the same solver runs the
    # backward pass with its rhs divided by the cell volumes and its
    # output multiplied back (V cancels identically on uniform grids).
    vol_np = problem._vol_np if nonuniform else None
    if problem.nz > 1:
        n_interior = (problem.nz - 2) * (problem.ny - 2) * (problem.nx - 2)
    else:
        n_interior = (problem.ny - 2) * (problem.nx - 2)

    @jax.custom_vjp
    def solve(x0, rhs):
        return base(x0, rhs)

    def fwd(x0, rhs):
        return base(x0, rhs), None

    def bwd(res, ct: PoissonResult):
        del res  # the solve is linear: no primal values needed
        xbar = ct.x
        shape, dtype = xbar.shape, xbar.dtype
        ybar = problem.zero_boundary(_fold_neumann(problem, xbar))
        if not correction:
            # Singular mirrored-Neumann operator: project onto the
            # compatible subspace (interior mean zero).
            mean = jnp.sum(ybar) / n_interior
            ybar = problem.zero_boundary(ybar - mean)
        if vol_np is not None:
            v = jnp.asarray(vol_np, dtype)      # (ny, nx), broadcasts z
            adj = base(jnp.zeros(shape, dtype),
                       problem.zero_boundary((ybar / v).astype(dtype)))
            lam = problem.zero_boundary(adj.x * v)
        else:
            adj = base(jnp.zeros(shape, dtype), ybar.astype(dtype))
            lam = problem.zero_boundary(adj.x)
        rhs_bar = lam
        if correction:
            x0_bar = -jnp.asarray(bdiag, dtype) * lam
        else:
            x0_bar = jnp.zeros(shape, dtype)
        return x0_bar, rhs_bar

    solve.defvjp(fwd, bwd)
    # NOT jit-wrapped: a jitted custom_vjp built inside an enclosing trace
    # (e.g. when the step is constructed under ``jax.jit(jax.grad(...))``
    # with traced physics params) leaks the outer tracer into the pjit
    # cache ("No constant handler for DynamicJaxprTracer").  The inner
    # ``base`` solvers are jitted; callers embed this in their own jit.
    return solve
