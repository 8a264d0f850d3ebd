"""Functional boundary-condition application on (nz, ny, nx) arrays.

TPU-native re-design of the reference BC backends
(`lib/src/boundary/boundary_conditions_core_impl.h`, `cpu/*.c`): instead of
five backend implementations behind a runtime dispatcher, each BC is one pure
function built from ``.at[face].set`` updates, which XLA lowers to cheap
dynamic-update-slices fused into the surrounding step.

Face application order matches the reference template (x-faces, then y-faces,
then z-faces — `boundary_conditions_core_impl.h:44-120`), so corner ownership
(last-writer-wins) is identical.

All functions are shape-polymorphic over 2D (nz == 1) and 3D: z-faces are
only touched when nz > 1, mirroring the reference's ``if (nz > 1)`` guards.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..core.status import CFDError, Status
from .types import (BCType, DirichletValues, Edge, InletConfig, InletProfile,
                    InletSpecType, OutletConfig, OutletType, SymmetryConfig,
                    edge_is_single)

# ---------------------------------------------------------------------------
# Scalar-field BCs: PERIODIC / NEUMANN
# ---------------------------------------------------------------------------
# All face functions accept (nz, ny, nx) arrays; plain (ny, nx) arrays (the
# reference's 2D raw-array API, bc_apply_scalar et al.) are promoted
# transparently.


def _as3d(f):
    return (f[None], True) if f.ndim == 2 else (f, False)


def _maybe2d(f, squeeze):
    return f[0] if squeeze else f


def apply_periodic_scalar(f):
    f, squeeze = _as3d(f)
    return _maybe2d(_apply_periodic_scalar3(f), squeeze)


def _apply_periodic_scalar3(f):
    """Wrap-around: boundary = opposite interior (`core_impl.h:92-120`)."""
    f = f.at[:, :, 0].set(f[:, :, -2])
    f = f.at[:, :, -1].set(f[:, :, 1])
    f = f.at[:, 0, :].set(f[:, -2, :])
    f = f.at[:, -1, :].set(f[:, 1, :])
    if f.shape[0] > 1:
        f = f.at[0, :, :].set(f[-2, :, :])
        f = f.at[-1, :, :].set(f[1, :, :])
    return f


def apply_neumann_scalar(f):
    """Zero gradient: boundary = adjacent interior (`core_impl.h:41-86`)."""
    f, squeeze = _as3d(f)
    f = f.at[:, :, 0].set(f[:, :, 1])
    f = f.at[:, :, -1].set(f[:, :, -2])
    f = f.at[:, 0, :].set(f[:, 1, :])
    f = f.at[:, -1, :].set(f[:, -2, :])
    if f.shape[0] > 1:
        f = f.at[0, :, :].set(f[1, :, :])
        f = f.at[-1, :, :].set(f[-2, :, :])
    return _maybe2d(f, squeeze)


def apply_dirichlet_scalar(f, values: DirichletValues):
    """Fixed values per face; y-faces overwrite x-face corners, z-faces win in
    3D (reference face order)."""
    f, squeeze = _as3d(f)
    f = f.at[:, :, 0].set(values.left)
    f = f.at[:, :, -1].set(values.right)
    f = f.at[:, 0, :].set(values.bottom)
    f = f.at[:, -1, :].set(values.top)
    if f.shape[0] > 1:
        f = f.at[0, :, :].set(values.back)
        f = f.at[-1, :, :].set(values.front)
    return _maybe2d(f, squeeze)


def apply_scalar(f, bc_type: BCType, values: Optional[DirichletValues] = None):
    """Dispatcher mirroring bc_apply_scalar[_3d]."""
    bc_type = BCType(bc_type)
    if bc_type == BCType.PERIODIC:
        return apply_periodic_scalar(f)
    if bc_type == BCType.NEUMANN:
        return apply_neumann_scalar(f)
    if bc_type == BCType.DIRICHLET:
        return apply_dirichlet_scalar(f, values or DirichletValues())
    raise CFDError(Status.ERROR_INVALID,
                   f"bc_apply_scalar: unsupported type {bc_type.name}")


# ---------------------------------------------------------------------------
# Velocity BCs
# ---------------------------------------------------------------------------


def apply_noslip(u, v, w=None):
    """u = v = (w =) 0 on every boundary face (`boundary_conditions.h:606-629`)."""
    zero = DirichletValues()
    u = apply_dirichlet_scalar(u, zero)
    v = apply_dirichlet_scalar(v, zero)
    if w is not None and u.shape[0] > 1:
        w = apply_dirichlet_scalar(w, zero)
    return (u, v) if w is None else (u, v, w)


def apply_dirichlet_velocity(u, v, u_values: DirichletValues,
                             v_values: DirichletValues, w=None,
                             w_values: Optional[DirichletValues] = None):
    u = apply_dirichlet_scalar(u, u_values)
    v = apply_dirichlet_scalar(v, v_values)
    if w is not None and u.shape[0] > 1:
        w = apply_dirichlet_scalar(w, w_values or DirichletValues())
    return (u, v) if w is None else (u, v, w)


def apply_velocity(u, v, bc_type: BCType, w=None):
    """Componentwise periodic/neumann, or no-slip (mirrors bc_apply_velocity)."""
    bc_type = BCType(bc_type)
    if bc_type == BCType.NOSLIP:
        return apply_noslip(u, v, w)
    if bc_type in (BCType.PERIODIC, BCType.NEUMANN):
        u = apply_scalar(u, bc_type)
        v = apply_scalar(v, bc_type)
        if w is not None and u.shape[0] > 1:
            w = apply_scalar(w, bc_type)
        return (u, v) if w is None else (u, v, w)
    raise CFDError(Status.ERROR_INVALID,
                   f"bc_apply_velocity: unsupported type {bc_type.name}")


# ---------------------------------------------------------------------------
# Inlet BCs (profiles + time modulation)
# ---------------------------------------------------------------------------


def _inlet_base_velocity(cfg: InletConfig) -> Tuple[float, float, float]:
    """Base (u, v, w) from the spec (`boundary_conditions_inlet_common.h:
    135-175` + bc_inlet_compute_w)."""
    if cfg.spec_type == InletSpecType.VELOCITY:
        return cfg.u, cfg.v, 0.0
    if cfg.spec_type == InletSpecType.MAGNITUDE_DIR:
        return (cfg.magnitude * math.cos(cfg.direction),
                cfg.magnitude * math.sin(cfg.direction), 0.0)
    if cfg.spec_type == InletSpecType.MASS_FLOW:
        rho_l = cfg.density * cfg.inlet_length
        if rho_l <= 0.0:
            return 0.0, 0.0, 0.0
        avg = cfg.mass_flow_rate / rho_l
        signs = {Edge.LEFT: (1, 0, 0), Edge.RIGHT: (-1, 0, 0),
                 Edge.BOTTOM: (0, 1, 0), Edge.TOP: (0, -1, 0),
                 Edge.FRONT: (0, 0, -1), Edge.BACK: (0, 0, 1)}
        su, sv, sw = signs[cfg.edge]
        return avg * su, avg * sv, avg * sw
    return 0.0, 0.0, 0.0


def _inlet_profile_velocity(cfg: InletConfig, position, time=None, dt=None):
    """(u, v) arrays along the edge after the spatial profile.

    ``position`` is the normalized coordinate array in [0, 1] along the edge
    (`boundary_conditions_inlet_scalar.c:58-66`).
    """
    ub, vb, _ = _inlet_base_velocity(cfg)
    if cfg.custom_profile_time is not None and time is not None:
        return cfg.custom_profile_time(position, time, dt)
    if cfg.profile == InletProfile.PARABOLIC:
        factor = 4.0 * position * (1.0 - position)
        return ub * factor, vb * factor
    if cfg.profile == InletProfile.CUSTOM and cfg.custom_profile is not None:
        return cfg.custom_profile(position)
    ones = jnp.ones_like(position)
    return ub * ones, vb * ones


def apply_inlet(u, v, cfg: InletConfig, w=None, time=None, dt=None):
    """Set inlet velocity on the configured edge.

    Covers both bc_apply_inlet[_3d] and bc_apply_inlet_time[_3d]; with
    ``time=None`` the modulation factor is 1 (the reference's delegation in
    `boundary_conditions_time.h`).  X/Y-edge inlets zero w on the edge in 3D;
    z-face inlets are uniform across the plane evaluated at position 0.5
    (`boundary_conditions_inlet_scalar.c:32-73`).
    """
    if not edge_is_single(cfg.edge):
        raise CFDError(Status.ERROR_INVALID, "inlet edge must be a single edge")
    nz, ny, nx = u.shape
    mod = 1.0
    if time is not None and cfg.custom_profile_time is None:
        mod = cfg.time_config.modulator(time, dt if dt is not None else 0.0)

    if cfg.edge in (Edge.FRONT, Edge.BACK):
        if nz <= 1 or w is None:
            raise CFDError(Status.ERROR_INVALID,
                           "z-face inlet requires a 3D field with w")
        pos = jnp.asarray(0.5, dtype=u.dtype)
        uv, vv = _inlet_profile_velocity(cfg, pos, time, dt)
        _, _, wb = _inlet_base_velocity(cfg)
        k = nz - 1 if cfg.edge == Edge.FRONT else 0
        u = u.at[k, :, :].set(uv * mod)
        v = v.at[k, :, :].set(vv * mod)
        w = w.at[k, :, :].set(wb * mod)
        return (u, v) if w is None else (u, v, w)

    along_y = cfg.edge in (Edge.LEFT, Edge.RIGHT)
    count = ny if along_y else nx
    if count > 1:
        pos = jnp.arange(count, dtype=u.dtype) / (count - 1)
    else:
        pos = jnp.full((count,), 0.5, dtype=u.dtype)
    uv, vv = _inlet_profile_velocity(cfg, pos, time, dt)
    uv = uv * mod
    vv = vv * mod

    if cfg.edge == Edge.LEFT:
        u = u.at[:, :, 0].set(uv[None, :])
        v = v.at[:, :, 0].set(vv[None, :])
        if w is not None and nz > 1:
            w = w.at[:, :, 0].set(0.0)
    elif cfg.edge == Edge.RIGHT:
        u = u.at[:, :, -1].set(uv[None, :])
        v = v.at[:, :, -1].set(vv[None, :])
        if w is not None and nz > 1:
            w = w.at[:, :, -1].set(0.0)
    elif cfg.edge == Edge.BOTTOM:
        u = u.at[:, 0, :].set(uv[None, :])
        v = v.at[:, 0, :].set(vv[None, :])
        if w is not None and nz > 1:
            w = w.at[:, 0, :].set(0.0)
    elif cfg.edge == Edge.TOP:
        u = u.at[:, -1, :].set(uv[None, :])
        v = v.at[:, -1, :].set(vv[None, :])
        if w is not None and nz > 1:
            w = w.at[:, -1, :].set(0.0)
    return (u, v) if w is None else (u, v, w)


# ---------------------------------------------------------------------------
# Outlet BCs
# ---------------------------------------------------------------------------

_OUTLET_FACES = {
    Edge.LEFT: ((slice(None), slice(None), 0), (slice(None), slice(None), 1)),
    Edge.RIGHT: ((slice(None), slice(None), -1), (slice(None), slice(None), -2)),
    Edge.BOTTOM: ((slice(None), 0, slice(None)), (slice(None), 1, slice(None))),
    Edge.TOP: ((slice(None), -1, slice(None)), (slice(None), -2, slice(None))),
    Edge.BACK: ((0, slice(None), slice(None)), (1, slice(None), slice(None))),
    Edge.FRONT: ((-1, slice(None), slice(None)), (-2, slice(None), slice(None))),
}


def apply_outlet_scalar(f, cfg: OutletConfig, dt=None, dn=None):
    """Outlet on one edge.

    Default (matching the reference, `boundary_conditions_outlet_scalar.c:
    33-37`): zero-gradient for BOTH outlet types.  With
    ``cfg.true_convective`` and dt/dn provided, applies the discrete
    convective update  f_b ← f_b − U·dt/dn · (f_b − f_i).
    """
    if not edge_is_single(cfg.edge):
        raise CFDError(Status.ERROR_INVALID, "outlet edge must be a single edge")
    if cfg.edge in (Edge.FRONT, Edge.BACK) and f.shape[0] <= 1:
        raise CFDError(Status.ERROR_INVALID, "z-face outlet requires 3D field")
    dst, src = _OUTLET_FACES[cfg.edge]
    if (cfg.type == OutletType.CONVECTIVE and cfg.true_convective
            and dt is not None and dn is not None):
        c = cfg.advection_velocity * dt / dn
        new = f[dst] - c * (f[dst] - f[src])
        return f.at[dst].set(new)
    return f.at[dst].set(f[src])


def apply_outlet_velocity(u, v, cfg: OutletConfig, w=None, dt=None, dn=None):
    u = apply_outlet_scalar(u, cfg, dt, dn)
    v = apply_outlet_scalar(v, cfg, dt, dn)
    if w is not None and u.shape[0] > 1:
        w = apply_outlet_scalar(w, cfg, dt, dn)
    return (u, v) if w is None else (u, v, w)


# ---------------------------------------------------------------------------
# Symmetry BCs
# ---------------------------------------------------------------------------


def apply_symmetry(u, v, cfg: SymmetryConfig, w=None):
    """Zero normal velocity + zero tangential gradient per selected edge
    (`boundary_conditions_scalar.c:18-120`)."""
    nz = u.shape[0]
    edges = cfg.edges
    if edges & Edge.LEFT:
        u = u.at[:, :, 0].set(0.0)
        v = v.at[:, :, 0].set(v[:, :, 1])
        if w is not None and nz > 1:
            w = w.at[:, :, 0].set(w[:, :, 1])
    if edges & Edge.RIGHT:
        u = u.at[:, :, -1].set(0.0)
        v = v.at[:, :, -1].set(v[:, :, -2])
        if w is not None and nz > 1:
            w = w.at[:, :, -1].set(w[:, :, -2])
    if edges & Edge.BOTTOM:
        v = v.at[:, 0, :].set(0.0)
        u = u.at[:, 0, :].set(u[:, 1, :])
        if w is not None and nz > 1:
            w = w.at[:, 0, :].set(w[:, 1, :])
    if edges & Edge.TOP:
        v = v.at[:, -1, :].set(0.0)
        u = u.at[:, -1, :].set(u[:, -2, :])
        if w is not None and nz > 1:
            w = w.at[:, -1, :].set(w[:, -2, :])
    if nz > 1:
        if edges & Edge.BACK:
            if w is not None:
                w = w.at[0, :, :].set(0.0)
            u = u.at[0, :, :].set(u[1, :, :])
            v = v.at[0, :, :].set(v[1, :, :])
        if edges & Edge.FRONT:
            if w is not None:
                w = w.at[-1, :, :].set(0.0)
            u = u.at[-1, :, :].set(u[-2, :, :])
            v = v.at[-1, :, :].set(v[-2, :, :])
    return (u, v) if w is None else (u, v, w)


# ---------------------------------------------------------------------------
# Whole-field periodic BCs (the NS solvers' default)
# ---------------------------------------------------------------------------


def apply_periodic_field(field):
    """Periodic wrap of all six flow variables — mirrors
    apply_boundary_conditions (`solver_explicit_euler.c:231-314`)."""
    import dataclasses as _dc
    return _dc.replace(
        field,
        u=apply_periodic_scalar(field.u),
        v=apply_periodic_scalar(field.v),
        w=apply_periodic_scalar(field.w),
        p=apply_periodic_scalar(field.p),
        rho=apply_periodic_scalar(field.rho),
        T=apply_periodic_scalar(field.T))


def _shell_mask(shape):
    """Boolean boundary-shell mask: x/y edges at every k, plus the full
    z-faces when nz > 1.  Built from broadcasted iota so it partitions
    trivially under jax.sharding (thin .at[slice] update chains have been
    observed to mis-partition when fused under GSPMD — see
    tests/parallel/test_sharding.py)."""
    nz, ny, nx = shape
    i = jnp.arange(nx)[None, None, :]
    j = jnp.arange(ny)[None, :, None]
    mask = (i == 0) | (i == nx - 1) | (j == 0) | (j == ny - 1)
    mask = jnp.broadcast_to(mask, shape)
    if nz > 1:
        k = jnp.arange(nz)[:, None, None]
        mask = mask | jnp.broadcast_to((k == 0) | (k == nz - 1), shape)
    return mask


def copy_boundary_velocities(dst_u, dst_v, dst_w, src_u, src_v, src_w):
    """Copy boundary shells of (u, v[, w]) from src into dst.

    Mirrors copy_boundary_velocities_3d (`boundary_copy_utils.h:93-148`):
    x/y edges always for u and v, w only when 3D; z-faces only when 3D.
    The projection/euler solvers use this save/restore idiom to preserve
    caller-set boundary values around their internal periodic defaults.

    Implemented as a masked select (src and dst never alias values within
    the op, so a single where is equivalent to the reference's face loops).
    """
    nz = dst_u.shape[0]
    mask = _shell_mask(dst_u.shape)
    dst_u = jnp.where(mask, src_u, dst_u)
    dst_v = jnp.where(mask, src_v, dst_v)
    if nz > 1:
        dst_w = jnp.where(mask, src_w, dst_w)
    return dst_u, dst_v, dst_w
