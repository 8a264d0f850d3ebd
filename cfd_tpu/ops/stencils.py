"""O(h²) central-difference stencil operators, vectorized for TPU.

Re-design of the reference's header-only stencil library
(`lib/include/cfd/math/stencils.h:39-248`).  Instead of per-point inline
functions, each operator acts on a whole ``(nz, ny, nx)`` array using shifted
views (``jnp.roll``), which XLA fuses into a single VPU sweep — this is the
TPU equivalent of the reference's "one fused scalar loop" pattern.

Conventions
-----------
* Array axes are (z, y, x): x is axis -1 (TPU lanes), y is axis -2, z axis -3.
* Boundary entries of the returned arrays hold *wrap-around* values (from the
  circular shift).  All solvers only consume interior points and handle
  boundaries explicitly, mirroring the reference's interior-only loops.
* The branch-free 2D/3D idiom survives verbatim: pass ``inv_dz2 = 0`` /
  ``inv_2dz = 0`` for 2D and the z-terms vanish (`stencils.h:149-151`).
* Spacing arguments accept scalars (uniform grids) or arrays broadcastable
  against the field (stretched grids use per-point ``1/(2 dx[i])`` rows, the
  reference's ``grid->dx[i]`` convention in `solver_explicit_euler.c:409`).
"""

from __future__ import annotations

import jax.numpy as jnp

# ---- shifted views ---------------------------------------------------------
# sx_p(f)[..., i] == f[..., i+1] (periodic wrap at the edge).


def sx_p(f):
    return jnp.roll(f, -1, axis=-1)


def sx_m(f):
    return jnp.roll(f, 1, axis=-1)


def sy_p(f):
    return jnp.roll(f, -1, axis=-2)


def sy_m(f):
    return jnp.roll(f, 1, axis=-2)


def sz_p(f):
    return jnp.roll(f, -1, axis=-3)


def sz_m(f):
    return jnp.roll(f, 1, axis=-3)


# ---- periodic-interior shifts -----------------------------------------------
# The RK integrators use periodic stencils over *interior* points that wrap
# skipping the ghost layer: at i==1 the left neighbor is nx-2, at i==nx-2 the
# right neighbor is 1 (`ns_momentum_rhs_scalar.h:78-90`).  These helpers give
# shifted views with that wrap correction applied; only interior entries are
# meaningful.


def sx_m_periodic_interior(f):
    g = sx_m(f)
    return g.at[..., 1].set(f[..., -2])


def sx_p_periodic_interior(f):
    g = sx_p(f)
    return g.at[..., -2].set(f[..., 1])


def sy_m_periodic_interior(f):
    g = sy_m(f)
    return g.at[..., 1, :].set(f[..., -2, :])


def sy_p_periodic_interior(f):
    g = sy_p(f)
    return g.at[..., -2, :].set(f[..., 1, :])


def sz_m_periodic_interior(f):
    if f.shape[-3] <= 1:
        return f  # stride_z == 0: z-neighbors collapse to the point itself
    g = sz_m(f)
    return g.at[1, :, :].set(f[-2, :, :])


def sz_p_periodic_interior(f):
    if f.shape[-3] <= 1:
        return f
    g = sz_p(f)
    return g.at[-2, :, :].set(f[1, :, :])


# ---- first derivatives (central, O(h²)) --------------------------------------


def ddx(f, inv_2dx):
    """df/dx ≈ (f[i+1] - f[i-1]) * inv_2dx  (`stencils.h:39-41`)."""
    return (sx_p(f) - sx_m(f)) * inv_2dx


def ddy(f, inv_2dy):
    return (sy_p(f) - sy_m(f)) * inv_2dy


def ddz(f, inv_2dz):
    """Pass inv_2dz=0 in 2D; nz==1 rolls are identity so the term vanishes."""
    if f.shape[-3] <= 1:
        return jnp.zeros_like(f) if _is_zero(inv_2dz) else (f - f) * inv_2dz
    return (sz_p(f) - sz_m(f)) * inv_2dz


# ---- second derivatives ------------------------------------------------------


def d2dx2(f, inv_dx2):
    """d²f/dx² ≈ (f[i+1] - 2f[i] + f[i-1]) * inv_dx2 (`stencils.h:84-86`)."""
    return (sx_p(f) - 2.0 * f + sx_m(f)) * inv_dx2


def d2dy2(f, inv_dy2):
    return (sy_p(f) - 2.0 * f + sy_m(f)) * inv_dy2


def d2dz2(f, inv_dz2):
    if f.shape[-3] <= 1:
        return jnp.zeros_like(f)
    return (sz_p(f) - 2.0 * f + sz_m(f)) * inv_dz2


# ---- composite operators -------------------------------------------------------


def laplacian(f, inv_dx2, inv_dy2, inv_dz2=0.0):
    """5/7-point Laplacian (`stencils.h:135-176`).

    One fused expression: XLA emits a single elementwise kernel over the
    shifted views, the TPU analogue of the reference's fused scalar loop.
    """
    out = (sx_p(f) - 2.0 * f + sx_m(f)) * inv_dx2 \
        + (sy_p(f) - 2.0 * f + sy_m(f)) * inv_dy2
    if f.shape[-3] > 1:
        out = out + (sz_p(f) - 2.0 * f + sz_m(f)) * inv_dz2
    return out


def divergence(u, v, w=None, inv_2dx=1.0, inv_2dy=1.0, inv_2dz=0.0):
    """∇·(u,v,w) (`stencils.h:198-225`)."""
    out = (sx_p(u) - sx_m(u)) * inv_2dx + (sy_p(v) - sy_m(v)) * inv_2dy
    if w is not None and u.shape[-3] > 1:
        out = out + (sz_p(w) - sz_m(w)) * inv_2dz
    return out


def gradient(f, inv_2dx, inv_2dy, inv_2dz=0.0):
    """(∂f/∂x, ∂f/∂y, ∂f/∂z) (`stencils.h:238-248`)."""
    return ddx(f, inv_2dx), ddy(f, inv_2dy), ddz(f, inv_2dz)


# ---- helpers -------------------------------------------------------------------


def interior_mask(shape, dtype=jnp.float32):
    """1 on interior points, 0 on the boundary shell (z-shell only when nz>1)."""
    nz, ny, nx = shape
    m = jnp.zeros(shape, dtype=dtype)
    if nz > 1:
        m = m.at[1:-1, 1:-1, 1:-1].set(1)
    else:
        m = m.at[:, 1:-1, 1:-1].set(1)
    return m


def checkerboard_mask(shape, parity):
    """Interior checkerboard ((i+j+k) % 2 == parity), built from iota.

    Traced on purpose: a full-shape boolean constant (the numpy
    alternative) is ~135 MB at 513³ and lands verbatim in the compile
    request — the remote compile service rejects large payloads.  Iota
    masks are also the GSPMD-safe formulation (masked `where` instead of
    shell `.at[]` writes)."""
    nz, ny, nx = shape
    j = jnp.expand_dims(jnp.arange(ny), (0, 2))
    i = jnp.expand_dims(jnp.arange(nx), (0, 1))
    k = (jnp.expand_dims(jnp.arange(nz), (1, 2)) if nz > 1
         else jnp.zeros((1, 1, 1), jnp.int32))
    color = ((i + j + k) % 2) == parity
    interior = (j > 0) & (j < ny - 1) & (i > 0) & (i < nx - 1)
    if nz > 1:
        interior = interior & (k > 0) & (k < nz - 1)
    return color & interior


def set_interior(dst, src):
    """dst with its interior replaced by src's interior (boundaries kept)."""
    nz = dst.shape[-3]
    if nz > 1:
        return dst.at[1:-1, 1:-1, 1:-1].set(src[1:-1, 1:-1, 1:-1])
    return dst.at[:, 1:-1, 1:-1].set(src[:, 1:-1, 1:-1])


def _is_zero(v) -> bool:
    try:
        return float(v) == 0.0
    except TypeError:
        return False
