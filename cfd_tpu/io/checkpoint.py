"""Versioned CRC-protected binary checkpoint codec (.cfdchk v1).

Byte-compatible re-implementation of `lib/src/io/checkpoint.c`: a checkpoint
written by the reference C library restores here and vice versa.

Format (all little-endian, `checkpoint.c:250-365`):

  header:  magic "CFDCHK\\0\\0" | u32 format version (1) | u32 endian marker
           0x01020304 | u16 lib major/minor/patch | u16 flags (bit0 = CRC) |
           u64 reserved
  grid:    u64 nx, ny, nz | f64 xmin..zmax | f64 x[nx], y[ny], dx[nx-1],
           dy[ny-1] | (nz>1: z[nz], dz[nz-1], inv_dz2)
  field:   u64 nx, ny, nz (self-check) | f64 u, v, w, p, rho, T arrays
  params:  f64 dt, cfl, gamma, mu, k | i32 max_iter | f64 tolerance,
           source amps/decay/coupling, alpha, beta, T_ref, gravity[3] |
           i32 thermal-face types ×6 | f64 dirichlet L,R,T,B,F,B
  meta:    f64 current_time | length-prefixed strings: solver name,
           run prefix, output base dir
  trailer: u32 CRC32 (IEEE reflected) over everything above

Scratch buffers are deliberately NOT serialized: "the field at a step
boundary is the complete dynamical state" (`checkpoint.h:25-30`).  Callback
fields restore as None by contract.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import Optional, Tuple

import numpy as np

from ..boundary.types import BCType, DirichletValues, ThermalBCConfig
from ..core.field import FlowField
from ..core.grid import Grid
from ..core.status import CFDError, Status
from ..solvers.ns.params import NSParams

MAGIC = b"CFDCHK\x00\x00"
FORMAT_VERSION = 1
ENDIAN_MARKER = 0x01020304
FLAG_CHECKSUM = 0x0001
LIB_VERSION = (0, 1, 0)

# Hostile-file caps (`checkpoint.c:32-34`).
MAX_DIM = 1 << 24
MAX_STRING = 1 << 20


class _Writer:
    def __init__(self):
        self.chunks = []
        self.crc = 0

    def raw(self, b: bytes):
        self.chunks.append(b)
        self.crc = zlib.crc32(b, self.crc)

    def u16(self, v):
        self.raw(struct.pack("<H", v))

    def u32(self, v):
        self.raw(struct.pack("<I", v))

    def u64(self, v):
        self.raw(struct.pack("<Q", v))

    def i32(self, v):
        self.raw(struct.pack("<i", int(v)))

    def f64(self, v):
        self.raw(struct.pack("<d", float(v)))

    def f64_array(self, a):
        self.raw(np.asarray(a, dtype="<f8").tobytes())

    def string(self, s: Optional[str]):
        b = (s or "").encode()
        self.u32(len(b))
        if b:
            self.raw(b)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.crc = 0

    def raw(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise CFDError(Status.ERROR_IO, "checkpoint truncated")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        self.crc = zlib.crc32(b, self.crc)
        return b

    def u16(self):
        return struct.unpack("<H", self.raw(2))[0]

    def u32(self):
        return struct.unpack("<I", self.raw(4))[0]

    def u64(self):
        return struct.unpack("<Q", self.raw(8))[0]

    def i32(self):
        return struct.unpack("<i", self.raw(4))[0]

    def f64(self):
        return struct.unpack("<d", self.raw(8))[0]

    def f64_array(self, n: int) -> np.ndarray:
        return np.frombuffer(self.raw(8 * n), dtype="<f8").copy()

    def string(self) -> str:
        n = self.u32()
        if n > MAX_STRING:
            raise CFDError(Status.ERROR_INVALID,
                           "checkpoint string too long")
        return self.raw(n).decode() if n else ""

    def raw_u32_no_crc(self) -> int:
        if self.pos + 4 > len(self.data):
            raise CFDError(Status.ERROR_IO, "checkpoint truncated")
        v = struct.unpack("<I", self.data[self.pos:self.pos + 4])[0]
        self.pos += 4
        return v


def write_checkpoint(path: str, grid: Grid, field: FlowField,
                     params: NSParams, current_time: float,
                     solver_name: str, run_prefix: Optional[str] = None,
                     output_base_dir: Optional[str] = None) -> None:
    """cfd_checkpoint_write equivalent (`checkpoint.c:332-375`)."""
    if field.nx != grid.nx or field.ny != grid.ny or field.nz != grid.nz:
        raise CFDError(Status.ERROR_INVALID,
                       "checkpoint: field/grid dimension mismatch")
    w = _Writer()
    # header
    w.raw(MAGIC)
    w.u32(FORMAT_VERSION)
    w.u32(ENDIAN_MARKER)
    w.u16(LIB_VERSION[0])
    w.u16(LIB_VERSION[1])
    w.u16(LIB_VERSION[2])
    w.u16(FLAG_CHECKSUM)
    w.u64(0)
    # grid
    w.u64(grid.nx)
    w.u64(grid.ny)
    w.u64(grid.nz)
    for v in (grid.xmin, grid.xmax, grid.ymin, grid.ymax, grid.zmin,
              grid.zmax):
        w.f64(v)
    w.f64_array(grid.x)
    w.f64_array(grid.y)
    w.f64_array(grid.dx)
    w.f64_array(grid.dy)
    if grid.nz > 1:
        w.f64_array(grid.z)
        w.f64_array(grid.dz)
        w.f64(grid.inv_dz2)
    # field
    w.u64(field.nx)
    w.u64(field.ny)
    w.u64(field.nz)
    for a in (field.u, field.v, field.w, field.p, field.rho, field.T):
        w.f64_array(np.asarray(a))
    # params
    w.f64(params.dt)
    w.f64(params.cfl)
    w.f64(params.gamma)
    w.f64(params.mu)
    w.f64(params.k)
    w.i32(params.max_iter)
    w.f64(params.tolerance)
    w.f64(params.source_amplitude_u)
    w.f64(params.source_amplitude_v)
    w.f64(params.source_decay_rate)
    w.f64(params.pressure_coupling)
    w.f64(params.alpha)
    w.f64(params.beta)
    w.f64(params.T_ref)
    for g in params.gravity:
        w.f64(g)
    tbc = params.thermal_bc
    for t in (tbc.left, tbc.right, tbc.bottom, tbc.top, tbc.front, tbc.back):
        w.i32(int(t))
    dv = tbc.dirichlet_values
    for v in (dv.left, dv.right, dv.top, dv.bottom, dv.front, dv.back):
        w.f64(v)
    # metadata
    w.f64(current_time)
    w.string(solver_name)
    w.string(run_prefix)
    w.string(output_base_dir)

    body = b"".join(w.chunks)
    try:
        with open(path, "wb") as fp:
            fp.write(body)
            fp.write(struct.pack("<I", w.crc))
    except OSError as e:
        raise CFDError(Status.ERROR_IO,
                       f"checkpoint write failed: {e}") from e


def read_checkpoint(path: str) -> Tuple[Grid, FlowField, NSParams, float,
                                        str, str, str]:
    """cfd_checkpoint_read equivalent (`checkpoint.c:381-553`).

    Returns (grid, field, params, current_time, solver_name, run_prefix,
    output_base_dir).  Rejects bad magic / version / endian / CRC / caps.
    """
    try:
        with open(path, "rb") as fp:
            data = fp.read()
    except OSError as e:
        raise CFDError(Status.ERROR_IO,
                       f"checkpoint read failed: {e}") from e

    r = _Reader(data)
    if r.raw(8) != MAGIC:
        raise CFDError(Status.ERROR_INVALID, "checkpoint: bad magic")
    version = r.u32()
    endian = r.u32()
    r.u16()
    r.u16()
    r.u16()
    flags = r.u16()
    r.u64()
    if version != FORMAT_VERSION or endian != ENDIAN_MARKER:
        raise CFDError(Status.ERROR_UNSUPPORTED,
                       "checkpoint: unsupported version or endianness")

    nx, ny, nz = r.u64(), r.u64(), r.u64()
    if nx < 2 or ny < 2 or nz < 1 or nx > MAX_DIM or ny > MAX_DIM \
            or nz > MAX_DIM:
        raise CFDError(Status.ERROR_INVALID, "checkpoint: bad grid dims")
    xmin, xmax = r.f64(), r.f64()
    ymin, ymax = r.f64(), r.f64()
    zmin, zmax = r.f64(), r.f64()
    x = r.f64_array(nx)
    y = r.f64_array(ny)
    dx = r.f64_array(nx - 1)
    dy = r.f64_array(ny - 1)
    z = dz = None
    inv_dz2 = 0.0
    if nz > 1:
        z = r.f64_array(nz)
        dz = r.f64_array(nz - 1)
        inv_dz2 = r.f64()
    grid = Grid(int(nx), int(ny), int(nz), xmin, xmax, ymin, ymax,
                zmin, zmax, x, y, dx, dy, z, dz, inv_dz2)

    fnx, fny, fnz = r.u64(), r.u64(), r.u64()
    if (fnx, fny, fnz) != (nx, ny, nz):
        raise CFDError(Status.ERROR_INVALID,
                       "checkpoint: field/grid dim mismatch")
    n = int(nx * ny * nz)
    shape = (int(nz), int(ny), int(nx))
    arrays = [r.f64_array(n).reshape(shape) for _ in range(6)]
    import jax.numpy as jnp
    from ..config import resolve_dtype
    dt_ = resolve_dtype(None)
    field = FlowField(*[jnp.asarray(a, dtype=dt_) for a in arrays])

    p_dt = r.f64()
    p_cfl = r.f64()
    p_gamma = r.f64()
    p_mu = r.f64()
    p_k = r.f64()
    p_max_iter = r.i32()
    p_tol = r.f64()
    p_sau = r.f64()
    p_sav = r.f64()
    p_sdr = r.f64()
    p_pc = r.f64()
    p_alpha = r.f64()
    p_beta = r.f64()
    p_tref = r.f64()
    gravity = (r.f64(), r.f64(), r.f64())
    face_types = [BCType(r.i32()) for _ in range(6)]
    dvl, dvr, dvt, dvb, dvf, dvbk = (r.f64() for _ in range(6))
    thermal_bc = ThermalBCConfig(
        left=face_types[0], right=face_types[1], bottom=face_types[2],
        top=face_types[3], front=face_types[4], back=face_types[5],
        dirichlet_values=DirichletValues(left=dvl, right=dvr, top=dvt,
                                         bottom=dvb, front=dvf, back=dvbk))
    params = NSParams(dt=p_dt, cfl=p_cfl, gamma=p_gamma, mu=p_mu, k=p_k,
                      max_iter=p_max_iter, tolerance=p_tol,
                      source_amplitude_u=p_sau, source_amplitude_v=p_sav,
                      source_decay_rate=p_sdr, pressure_coupling=p_pc,
                      alpha=p_alpha, beta=p_beta, T_ref=p_tref,
                      gravity=gravity, thermal_bc=thermal_bc)

    current_time = r.f64()
    solver_name = r.string()
    run_prefix = r.string()
    output_base_dir = r.string()

    if flags & FLAG_CHECKSUM:
        computed = r.crc & 0xFFFFFFFF
        stored = r.raw_u32_no_crc()
        if computed != stored:
            raise CFDError(Status.ERROR_IO, "checkpoint: CRC mismatch")

    return (grid, field, params, current_time, solver_name, run_prefix,
            output_base_dir)
