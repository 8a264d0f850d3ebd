"""Per-point spacing pins for the fused momentum kernels on stretched grids.

The reference evaluates momentum stencils with the LOCAL forward spacing
``grid->dx[i]`` at every point (`solver_explicit_euler.c:409`,
`ns_momentum_rhs_scalar.h:49-120`) — on a tanh-stretched grid the
coefficients 1/(2dx_i), 1/dx_i² become per-point.  The jnp path carries
them as broadcastable rows/columns (`solvers/ns/common.spacing_arrays`);
the fused kernels receive the same values as pinned VMEM inputs (the
rolling engine's ``n_pinned`` (2, ny, nx) prologue-fetched buffers —
kernels cannot capture array constants).

Three pins, built host-side in numpy (trace-safety: no jnp at factory
build time):

* ``coef_x``: plane 0 = 1/(2·dx_i) broadcast along rows, plane 1 = 1/dx_i²
* ``coef_y``: plane 0 = 1/(2·dy_j) broadcast along lanes, plane 1 = 1/dy_j²
* ``src``:    plane 0 = sin(π·y_j), plane 1 = sin(2π·x_i) — the default
  source basis needs true coordinates, which are no longer affine in the
  index (the uniform kernels rebuild them from iota instead).

Spacing-validity guards (`|dx| > 1e-10`) are enforced host-side by the
factory gates (`stretch_spacing_ok`), so in-kernel the whole plane is
valid — identical to the jnp path whose per-point ``ok`` mask is all-true
under the same condition.
"""

from __future__ import annotations

import numpy as np


def _padded(spacing):
    """Entry i = forward spacing i→i+1, final entry repeated — mirrors
    `solvers/ns/common.spacing_arrays`."""
    spacing = np.asarray(spacing, np.float64)
    return np.concatenate([spacing, spacing[-1:]])


def stretch_spacing_ok(dx_arr, dy_arr) -> bool:
    """Host-side twin of the per-point |spacing| >= 1e-10 guards."""
    return (float(np.min(np.abs(dx_arr))) > 1e-10
            and float(np.min(np.abs(dy_arr))) > 1e-10)


def _row(a, ny, nx, np_dtype):
    return np.broadcast_to(np.asarray(a, np_dtype)[None, :], (ny, nx))


def _col(a, ny, nx, np_dtype):
    return np.broadcast_to(np.asarray(a, np_dtype)[:, None], (ny, nx))


def _src_planes(ny, nx, x_coords, y_coords, np_dtype):
    return np.stack([_col(np.sin(np.pi * np.asarray(y_coords, np.float64)),
                          ny, nx, np_dtype),
                     _row(np.sin(2.0 * np.pi
                                 * np.asarray(x_coords, np.float64)),
                          ny, nx, np_dtype)])


def stretch_pins(ny, nx, dx_arr, dy_arr, x_coords, y_coords,
                 np_dtype=np.float32):
    """Build (coef_x, coef_y, src) numpy pins, each (2, ny, nx)."""
    dx = _padded(dx_arr)
    dy = _padded(dy_arr)
    coef_x = np.stack([_row(1.0 / (2.0 * dx), ny, nx, np_dtype),
                       _row(1.0 / (dx * dx), ny, nx, np_dtype)])
    coef_y = np.stack([_col(1.0 / (2.0 * dy), ny, nx, np_dtype),
                       _col(1.0 / (dy * dy), ny, nx, np_dtype)])
    src = _src_planes(ny, nx, x_coords, y_coords, np_dtype)
    return (np.ascontiguousarray(coef_x, np_dtype),
            np.ascontiguousarray(coef_y, np_dtype),
            np.ascontiguousarray(src, np_dtype))


def _triples(spacing):
    """Exact 3-point nonuniform first/second-derivative weights — the
    numpy twin of `solvers/ns/common.consistent_triples` (ops/ stays
    below solvers/ in the layering); equality is pinned by
    tests/math/test_consistent_stencils.py."""
    h = np.asarray(spacing, np.float64)
    hm = np.concatenate([h[:1], h])
    hp = np.concatenate([h, h[-1:]])
    s = hm + hp
    return (-hp / (hm * s), (hp - hm) / (hm * hp), hm / (hp * s),
            2.0 / (hm * s), -2.0 / (hm * hp), 2.0 / (hp * s))


def stretch_pins_consistent(ny, nx, dx_arr, dy_arr, x_coords, y_coords,
                            np_dtype=np.float32):
    """Pins for ``nonuniform_scheme="consistent"`` — the exact 3-point
    nonuniform weights (`solvers/ns/common.consistent_triples`), seven
    (2, ny, nx) pins:

    0: (wxm, wxp)  1: (wxc, lxc)  2: (lxm, lxp)   — x weights (rows)
    3: (wym, wyp)  4: (wyc, lyc)  5: (lym, lyp)   — y weights (cols)
    6: (sin(πy), sin(2πx))                         — source basis
    """
    wxm, wxc, wxp, lxm, lxc, lxp = _triples(dx_arr)
    wym, wyc, wyp, lym, lyc, lyp = _triples(dy_arr)

    def rows(a, b):
        return np.ascontiguousarray(
            np.stack([_row(a, ny, nx, np_dtype), _row(b, ny, nx, np_dtype)]),
            np_dtype)

    def cols(a, b):
        return np.ascontiguousarray(
            np.stack([_col(a, ny, nx, np_dtype), _col(b, ny, nx, np_dtype)]),
            np_dtype)

    return (rows(wxm, wxp), rows(wxc, lxc), rows(lxm, lxp),
            cols(wym, wyp), cols(wyc, lyc), cols(lym, lyp),
            np.ascontiguousarray(
                _src_planes(ny, nx, x_coords, y_coords, np_dtype), np_dtype))


def stretch_pins_grad(ny, nx, dx_arr, dy_arr, np_dtype=np.float32):
    """Pins for the consistent-scheme projection CORRECTOR — the exact
    3-point nonuniform first-derivative weights only, three (2, ny, nx)
    pins:

    0: (wxm, wxp)   — x neighbor weights (rows)
    1: (wxc, wyc)   — x / y center weights
    2: (wym, wyp)   — y neighbor weights (cols)
    """
    wxm, wxc, wxp, _, _, _ = _triples(dx_arr)
    wym, wyc, wyp, _, _, _ = _triples(dy_arr)
    return (np.ascontiguousarray(
                np.stack([_row(wxm, ny, nx, np_dtype),
                          _row(wxp, ny, nx, np_dtype)]), np_dtype),
            np.ascontiguousarray(
                np.stack([_row(wxc, ny, nx, np_dtype),
                          _col(wyc, ny, nx, np_dtype)]), np_dtype),
            np.ascontiguousarray(
                np.stack([_col(wym, ny, nx, np_dtype),
                          _col(wyp, ny, nx, np_dtype)]), np_dtype))


def stretch_inputs_2d(ny, nx, dx_arr, dy_arr, x_coords, y_coords,
                      scheme="parity", np_dtype=np.float32):
    """Stretch inputs for the 2D block-marching kernels: (xrows, yplanes).

    The marching engine streams y-blocks, so the two stretch directions
    ride different input kinds:

    * ``xrows``: ONE (8, nx) array for a pinned VMEM input — x-dependent
      weights as rows (constant along y; in-kernel each row broadcasts
      (1, nx) → (B, nx) along sublanes).
      parity:     rows 0-2 = [1/(2·dx_i), 1/dx_i², sin(2π·x_i)]
      consistent: rows 0-6 = [wxm, wxc, wxp, lxm, lxc, lxp, sin(2π·x_i)]
    * ``yplanes``: tuple of (ny, nx) arrays for streamed PLANE inputs —
      y-dependent weights pre-broadcast along lanes (weights apply at the
      stencil's CENTER row, so plane blocks never need halos).
      parity:     (1/(2·dy_j), 1/dy_j², sin(π·y_j))
      consistent: (wym, wyc, wyp, lym, lyc, lyp, sin(π·y_j))
    """
    sx2 = np.sin(2.0 * np.pi * np.asarray(x_coords, np.float64))
    sy = np.sin(np.pi * np.asarray(y_coords, np.float64))
    if scheme == "consistent":
        wxm, wxc, wxp, lxm, lxc, lxp = _triples(dx_arr)
        wym, wyc, wyp, lym, lyc, lyp = _triples(dy_arr)
        xr = [wxm, wxc, wxp, lxm, lxc, lxp, sx2]
        yp = [wym, wyc, wyp, lym, lyc, lyp, sy]
    else:
        dx = _padded(dx_arr)
        dy = _padded(dy_arr)
        xr = [1.0 / (2.0 * dx), 1.0 / (dx * dx), sx2]
        yp = [1.0 / (2.0 * dy), 1.0 / (dy * dy), sy]
    xrows = np.zeros((8, nx), np_dtype)
    for i, r in enumerate(xr):
        xrows[i] = np.asarray(r, np_dtype)
    yplanes = tuple(np.ascontiguousarray(_col(a, ny, nx, np_dtype))
                    for a in yp)
    return xrows, yplanes
