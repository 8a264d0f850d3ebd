"""VMEM-resident whole-solve geometric multigrid for small 2D grids.

The reference declares POISSON_METHOD_MULTIGRID but never implements it
(`linear_solver.c:236-238`); `solvers/poisson/multigrid.py` supplies the
jnp V-cycle and `ops/pallas/mg_kernels.py` the fused 3D sweeps.  2D grids
had neither a fused sweep nor a VMEM path — yet they are exactly where
the reference publishes its perf configs (`README.md:225-231`), and a
129²–513² hierarchy totals well under 1 MiB per array: pure
launch-latency if every sweep/restrict/prolong is its own device op.

This module runs the ENTIRE multigrid solve — the outer convergence
`while_loop`, every V-cycle level, smoothing sweeps, restriction and
prolongation — inside ONE Pallas kernel, following the
`vmem_small.py` whole-solve pattern (volume as a padded (pny, px) plane,
iota-rebuilt masks, interior-masked reductions).

Restriction and prolongation are the novel part: Mosaic cannot do the
strided lane slices of the jnp `_fw_axis`/`_interp_axis`, so both become
MXU matmuls with weight matrices rebuilt from iota in-body (kernels
cannot capture array constants):

* restriction  r_c = Ry · r · Rx   with Ry[I,j] = {0.5 at j=2I,
  0.25 at j=2I±1, coarse interior rows only} — exactly the separable
  full-weighting stencil of `multigrid._fw_axis`.
* prolongation e_f = Py · e_c · Px with Py[j,I] = {1 at j=2I,
  0.5 at j=2I±1} — exactly `multigrid._interp_axis`, followed by the
  same zero shell.

The algorithm mirrors `multigrid.make_multigrid`'s jnp body term for
term (same A = −∇² Dirichlet-0 correction space, same red-black
Gauss-Seidel sweeps via the interior checkerboard, same L2 convergence
recursion, same 40-sweep coarsest solve), so iteration counts match the
jnp path up to matmul-vs-slice rounding.  Consistency is enforced by
tests/math/test_vmem_mg.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .vmem_small import (_VMEM_SOLVE_BUDGET, _make_call, _padded_dims,
                         _volume_helpers, _wrap)

#: Sweeps of red-black GS on the coarsest level ("solve nearly exactly",
#: `multigrid._v_cycle`).
COARSE_SWEEPS = 40


def _level_dims(levels) -> List[Tuple[int, int, int, int]]:
    """Per-level (ny, nx, pny, px) for 2D level shapes (1, ny, nx)."""
    out = []
    for (nz, ny, nx) in (lv.shape for lv in levels):
        pny, px, _ = _padded_dims(nz, ny, nx)
        out.append((ny, nx, pny, px))
    return out


def mg_vmem_supported(levels, itemsize: int = 4) -> bool:
    """2D only; the whole hierarchy (≈8 fine arrays + weight matrices)
    must fit the VMEM solve budget."""
    if levels is None or any(lv.shape[0] != 1 for lv in levels):
        return False
    total = 0
    dims = _level_dims(levels)
    for i, (ny, nx, pny, px) in enumerate(dims):
        total += (8 if i == 0 else 4) * pny * px * itemsize
        if i + 1 < len(dims):
            _, _, pnyc, pxc = dims[i + 1]
            # Ry/Py (pny·pnyc ×2) and Rx/Px (px·pxc ×2) weight matrices.
            total += 2 * (pny * pnyc + px * pxc) * itemsize
    return total <= _VMEM_SOLVE_BUDGET


def _restrict_y(nc: int, pc: int, pf: int, dtype):
    """(pc, pf) full-weighting matrix onto coarse interior rows."""
    I = lax.broadcasted_iota(jnp.int32, (pc, pf), 0)
    j = lax.broadcasted_iota(jnp.int32, (pc, pf), 1)
    d = j - 2 * I
    w = jnp.where(d == 0, 0.5, jnp.where(jnp.abs(d) == 1, 0.25, 0.0))
    return jnp.where((I >= 1) & (I <= nc - 2), w, 0.0).astype(dtype)


def _restrict_x(nc: int, pf: int, pc: int, dtype):
    """(pf, pc): the x-axis twin, pre-transposed so r_c = Ry · r · Rx."""
    j = lax.broadcasted_iota(jnp.int32, (pf, pc), 0)
    I = lax.broadcasted_iota(jnp.int32, (pf, pc), 1)
    d = j - 2 * I
    w = jnp.where(d == 0, 0.5, jnp.where(jnp.abs(d) == 1, 0.25, 0.0))
    return jnp.where((I >= 1) & (I <= nc - 2), w, 0.0).astype(dtype)


def _prolong_y(pf: int, pc: int, dtype):
    """(pf, pc) bilinear interpolation rows (shell zeroed by the caller)."""
    j = lax.broadcasted_iota(jnp.int32, (pf, pc), 0)
    I = lax.broadcasted_iota(jnp.int32, (pf, pc), 1)
    d = j - 2 * I
    return jnp.where(d == 0, 1.0,
                     jnp.where(jnp.abs(d) == 1, 0.5, 0.0)).astype(dtype)


def _prolong_x(pc: int, pf: int, dtype):
    """(pc, pf): the x-axis twin, pre-transposed so e_f = Py · e_c · Px."""
    I = lax.broadcasted_iota(jnp.int32, (pc, pf), 0)
    j = lax.broadcasted_iota(jnp.int32, (pc, pf), 1)
    d = j - 2 * I
    return jnp.where(d == 0, 1.0,
                     jnp.where(jnp.abs(d) == 1, 0.5, 0.0)).astype(dtype)


def make_mg_vmem_solve(levels, pre: int, post: int,
                       tolerance: float, abs_tol: float,
                       max_iterations: int, check_interval: int,
                       dtype=jnp.float32, interpret: bool = False):
    """Whole multigrid solve in one kernel (2D hierarchies).

    ``levels`` is `multigrid._build_levels` output: per level
    (shape, inv_dx2, inv_dy2, inv_dz2, inv_factor) with shape (1, ny, nx).
    Returns fn(x, rhs) -> (x, r0, res, iterations, converged) with x, rhs
    shaped (1, ny, nx), or None when unsupported.
    """
    if not mg_vmem_supported(levels, jnp.dtype(dtype).itemsize):
        return None
    ci = max(1, int(check_interval))
    max_iter = int(max_iterations)
    n_levels = len(levels)
    lv_const = [(lv.shape, float(lv.inv_dx2), float(lv.inv_dy2),
                 float(lv.inv_factor)) for lv in levels]
    dims = _level_dims(levels)

    def kernel(x_ref, rhs_ref, out_ref, stats_ref):
        H = [_volume_helpers(1, sh[1], sh[2], ix2, iy2, 0.0, dtype)
             for (sh, ix2, iy2, _) in lv_const]
        # Inter-level weight matrices, loop-invariant (built once, hoisted
        # out of the while body by the compiler).
        W = []
        for i in range(n_levels - 1):
            _, _, pnyf, pxf = dims[i]
            nyc, nxc, pnyc, pxc = dims[i + 1]
            W.append((_restrict_y(nyc, pnyc, pnyf, dtype),
                      _restrict_x(nxc, pxf, pxc, dtype),
                      _prolong_y(pnyf, pnyc, dtype),
                      _prolong_x(pxc, pxf, dtype)))

        def mm(a, b):
            return jax.lax.dot(a, b, preferred_element_type=dtype)

        def sweep(x, b, lvl, order=("red", "black")):
            h = H[lvl]
            inv_factor = lv_const[lvl][3]
            for color in order:
                mask = h["red"] if color == "red" else ~h["red"]
                gs = (b + h["neighbors"](x)) * inv_factor
                x = jnp.where(mask & h["interior"], gs, x)
            return x

        def A(p, lvl):
            h = H[lvl]
            return h["zero_boundary"](-h["laplacian"](p))

        def v_cycle(lvl, b):
            h = H[lvl]
            if lvl == n_levels - 1:
                return lax.fori_loop(
                    0, COARSE_SWEEPS,
                    lambda _, x: sweep(x, b, lvl), jnp.zeros_like(b))
            ry, rx, py, px_m = W[lvl]
            x = jnp.zeros_like(b)
            for _ in range(pre):
                x = sweep(x, b, lvl)
            r = h["zero_boundary"](b - A(x, lvl))
            r_c = mm(mm(ry, r), rx)
            e_c = v_cycle(lvl + 1, r_c)
            hf_zero = h["zero_boundary"]
            x = x + hf_zero(mm(py, mm(e_c, px_m)))
            for _ in range(post):
                x = sweep(x, b, lvl)
            return x

        h0 = H[0]
        x = h0["mirror"](x_ref[:, :])
        b = h0["zero_boundary"](-(rhs_ref[:, :] - h0["laplacian"](x)))
        initial_res = jnp.sqrt(h0["dot"](b, b))
        tol = jnp.maximum(jnp.asarray(tolerance, dtype) * initial_res,
                          jnp.asarray(abs_tol, dtype))
        abs_t = jnp.asarray(abs_tol, dtype)
        already = initial_res < abs_t

        def cond(c):
            return c[3] & (c[1] < max_iter)

        def body(c):
            e, it, _, _ = c
            r = h0["zero_boundary"](b - A(e, 0))
            e = e + v_cycle(0, r)
            r2 = h0["zero_boundary"](b - A(e, 0))
            res_new = jnp.sqrt(h0["dot"](r2, r2))
            check = (it % ci) == 0
            converged = check & ((res_new < tol) | (res_new < abs_t))
            return (e, it + 1, res_new, ~converged)

        e_f, it_f, res_f, running_f = lax.while_loop(
            cond, body,
            (jnp.zeros_like(b), jnp.int32(0), initial_res, ~already))

        out_ref[:, :] = h0["mirror"](x + e_f)
        stats_ref[0, 0] = initial_res
        stats_ref[0, 1] = jnp.where(already, initial_res, res_f)
        stats_ref[0, 2] = jnp.where(already, jnp.zeros((), dtype),
                                    it_f.astype(dtype))
        stats_ref[0, 3] = (~running_f | already).astype(dtype)

    ny, nx, pny, px = dims[0]
    base = _wrap(_make_call(kernel, pny, px, dtype, interpret),
                 1, ny, nx, pny, px, dtype)

    def solve(x, rhs):
        vol, stats = base(x, rhs)
        return (vol, stats[0, 0], stats[0, 1],
                stats[0, 2].astype(jnp.int32), stats[0, 3] > 0)

    return solve
