"""VTK legacy-ASCII STRUCTURED_POINTS writers.

Re-design of `lib/src/io/vtk_output.c`: same file format (DataFile Version
3.0, ASCII, STRUCTURED_POINTS, POINT_DATA with `%f`-formatted values), so
files open identically in ParaView/VisIt next to reference output.

The value-formatting hot loop (millions of `%f` conversions per snapshot)
runs in the native C library (`cfd_tpu.native`) when the toolchain is
available, with a numpy/savetxt fallback — the TPU-native answer to the
reference's C writers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.logging import error as log_error
from ..native import NativeTextFile, native_available


class _PyTextFile:
    """Fallback sink mirroring NativeTextFile."""

    def __init__(self, path: str):
        self._fp = open(path, "w")

    def write(self, text: str) -> None:
        self._fp.write(text)

    def write_scalars(self, arr) -> None:
        np.savetxt(self._fp, np.asarray(arr).reshape(-1), fmt="%f")

    def write_vectors(self, u, v, w=None) -> None:
        ua = np.asarray(u).reshape(-1)
        va = np.asarray(v).reshape(-1)
        wa = (np.asarray(w).reshape(-1) if w is not None
              else np.zeros_like(ua))
        np.savetxt(self._fp, np.column_stack([ua, va, wa]), fmt="%f %f %f")

    def close(self) -> None:
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _open_sink(path: str):
    if native_available():
        try:
            return NativeTextFile(path)
        except OSError:
            pass
    return _PyTextFile(path)


def _header(fp, title: str, nx: int, ny: int, nz: int,
            xmin, xmax, ymin, ymax, zmin, zmax):
    dz = (zmax - zmin) / (nz - 1) if nz > 1 else 1.0
    fp.write("# vtk DataFile Version 3.0\n")
    fp.write(f"{title}\n")
    fp.write("ASCII\n")
    fp.write("DATASET STRUCTURED_POINTS\n")
    fp.write(f"DIMENSIONS {nx} {ny} {nz}\n")
    fp.write(f"ORIGIN {xmin:f} {ymin:f} {zmin:f}\n")
    fp.write(f"SPACING {(xmax - xmin) / (nx - 1):f} "
             f"{(ymax - ymin) / (ny - 1):f} {dz:f}\n")


def _valid(nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax) -> bool:
    return (nx >= 2 and ny >= 2 and nz >= 1 and xmax > xmin and ymax > ymin
            and (nz == 1 or zmax > zmin))


def write_vtk_scalar(filename: str, field_name: str, data,
                     nx: int, ny: int, nz: int,
                     xmin, xmax, ymin, ymax, zmin=0.0, zmax=0.0) -> None:
    """Scalar field writer (write_vtk_output, `vtk_output.c:112-155`)."""
    if not filename or data is None or not _valid(nx, ny, nz, xmin, xmax,
                                                  ymin, ymax, zmin, zmax):
        return
    a = np.asarray(data).reshape(nz, ny, nx)
    try:
        with _open_sink(filename) as fp:
            _header(fp, "CFD Framework Output", nx, ny, nz,
                    xmin, xmax, ymin, ymax, zmin, zmax)
            fp.write(f"\nPOINT_DATA {nx * ny * nz}\n")
            fp.write(f"SCALARS {field_name} float 1\n")
            fp.write("LOOKUP_TABLE default\n")
            fp.write_scalars(a)
    except OSError:
        log_error("io", "Failed to open VTK output file")


def write_vtk_vector(filename: str, field_name: str, u, v, w,
                     nx: int, ny: int, nz: int,
                     xmin, xmax, ymin, ymax, zmin=0.0, zmax=0.0) -> None:
    """Vector field writer (write_vtk_vector_output, `vtk_output.c:157-200`)."""
    if not filename or u is None or v is None or not _valid(
            nx, ny, nz, xmin, xmax, ymin, ymax, zmin, zmax):
        return
    try:
        with _open_sink(filename) as fp:
            _header(fp, "CFD Framework Vector Output", nx, ny, nz,
                    xmin, xmax, ymin, ymax, zmin, zmax)
            fp.write(f"\nPOINT_DATA {nx * ny * nz}\n")
            fp.write(f"VECTORS {field_name} float\n")
            fp.write_vectors(np.asarray(u), np.asarray(v),
                             np.asarray(w) if w is not None else None)
    except OSError:
        log_error("io", "Failed to open VTK vector output file")


def write_vtk_flow_field(filename: str, field,
                         nx: int, ny: int, nz: int,
                         xmin, xmax, ymin, ymax, zmin=0.0, zmax=0.0) -> None:
    """Full-field writer: velocity vectors + p/rho/T scalars
    (write_vtk_flow_field, `vtk_output.c:202-318`)."""
    if not filename or field is None or not _valid(nx, ny, nz, xmin, xmax,
                                                   ymin, ymax, zmin, zmax):
        return
    try:
        with _open_sink(filename) as fp:
            _header(fp, "CFD Framework Flow Field Output", nx, ny, nz,
                    xmin, xmax, ymin, ymax, zmin, zmax)
            fp.write(f"\nPOINT_DATA {nx * ny * nz}\n")
            fp.write("VECTORS velocity float\n")
            fp.write_vectors(np.asarray(field.u), np.asarray(field.v),
                             np.asarray(field.w))
            for name, data in (("pressure", field.p), ("density", field.rho),
                               ("temperature", field.T)):
                # blank separator line before each scalar block
                # (`vtk_output.c` flow-field writer)
                fp.write(f"\nSCALARS {name} float 1\n")
                fp.write("LOOKUP_TABLE default\n")
                fp.write_scalars(np.asarray(data))
    except OSError:
        log_error("io", "Failed to open VTK flow-field output file")


def read_vtk_dimensions(filename: str):
    """Tiny helper used by tests to validate written files."""
    with open(filename) as fp:
        for line in fp:
            if line.startswith("DIMENSIONS"):
                _, a, b, c = line.split()
                return int(a), int(b), int(c)
    return None
