"""CSV output writers: timeseries, centerline profiles, statistics.

Re-design of `lib/src/io/csv_output.c` with identical headers, column order,
and `%.6e` formatting, so downstream tooling built against the reference's
CSVs keeps working.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

HORIZONTAL = 0
VERTICAL = 1


def write_csv_timeseries(filename: str, step: int, time: float, dt: float,
                         stats: dict, iterations: int, residual: float,
                         elapsed_ms: float, create_new: bool) -> None:
    """Append one timeseries row (write_csv_timeseries,
    `csv_output.c:121-164`).  ``stats`` is the dict from
    `cfd_tpu.core.derived.compute_statistics`."""
    write_header = create_new or not os.path.exists(filename)
    has_vm = "vel_mag" in stats
    with open(filename, "w" if write_header else "a") as fp:
        if write_header:
            fp.write("step,time,dt,max_u,max_v,max_w,max_p,"
                     "avg_u,avg_v,avg_w,avg_p")
            if has_vm:
                fp.write(",max_vel_mag,avg_vel_mag")
            fp.write(",iterations,residual,elapsed_ms\n")
        row = (f"{step},{time:.6e},{dt:.6e},"
               f"{float(stats['u'].max_val):.6e},"
               f"{float(stats['v'].max_val):.6e},"
               f"{float(stats['w'].max_val):.6e},"
               f"{float(stats['p'].max_val):.6e},"
               f"{float(stats['u'].avg_val):.6e},"
               f"{float(stats['v'].avg_val):.6e},"
               f"{float(stats['w'].avg_val):.6e},"
               f"{float(stats['p'].avg_val):.6e}")
        if has_vm:
            row += (f",{float(stats['vel_mag'].max_val):.6e},"
                    f"{float(stats['vel_mag'].avg_val):.6e}")
        row += f",{iterations},{residual:.6e},{elapsed_ms:.2f}\n"
        fp.write(row)


def write_csv_centerline(filename: str, field, x_coords, y_coords,
                         direction: int = HORIZONTAL,
                         vel_mag: Optional[np.ndarray] = None) -> None:
    """Centerline profile (write_csv_centerline, `csv_output.c:170-229`).
    Uses the k=0 plane, matching the reference's 2D indexing."""
    u = np.asarray(field.u)[0]
    v = np.asarray(field.v)[0]
    w = np.asarray(field.w)[0]
    p = np.asarray(field.p)[0]
    rho = np.asarray(field.rho)[0]
    T = np.asarray(field.T)[0]
    vm = np.asarray(vel_mag)[0] if vel_mag is not None else None
    ny, nx = u.shape

    with open(filename, "w") as fp:
        if direction == HORIZONTAL:
            j = ny // 2
            fp.write("x,u,v,w,p,rho,T" + (",vel_mag" if vm is not None else "")
                     + "\n")
            for i in range(nx):
                fp.write(f"{x_coords[i]:.6e},{u[j, i]:.6e},{v[j, i]:.6e},"
                         f"{w[j, i]:.6e},{p[j, i]:.6e},{rho[j, i]:.6e},"
                         f"{T[j, i]:.6e}")
                if vm is not None:
                    fp.write(f",{vm[j, i]:.6e}")
                fp.write("\n")
        else:
            i = nx // 2
            fp.write("y,u,v,w,p,rho,T" + (",vel_mag" if vm is not None else "")
                     + "\n")
            for j in range(ny):
                fp.write(f"{y_coords[j]:.6e},{u[j, i]:.6e},{v[j, i]:.6e},"
                         f"{w[j, i]:.6e},{p[j, i]:.6e},{rho[j, i]:.6e},"
                         f"{T[j, i]:.6e}")
                if vm is not None:
                    fp.write(f",{vm[j, i]:.6e}")
                fp.write("\n")


def write_csv_statistics(filename: str, step: int, time: float, stats: dict,
                         create_new: bool) -> None:
    """Append min/max/avg per field (write_csv_statistics,
    `csv_output.c:235-285`)."""
    write_header = create_new or not os.path.exists(filename)
    has_vm = "vel_mag" in stats
    with open(filename, "w" if write_header else "a") as fp:
        if write_header:
            fp.write("step,time,min_u,max_u,avg_u,min_v,max_v,avg_v,"
                     "min_w,max_w,avg_w,min_p,max_p,avg_p,"
                     "min_rho,max_rho,avg_rho,min_T,max_T,avg_T")
            if has_vm:
                fp.write(",min_vel_mag,max_vel_mag,avg_vel_mag")
            fp.write("\n")
        cols = [f"{step}", f"{time:.6e}"]
        for name in ("u", "v", "w", "p", "rho", "T"):
            s = stats[name]
            cols += [f"{float(s.min_val):.6e}", f"{float(s.max_val):.6e}",
                     f"{float(s.avg_val):.6e}"]
        if has_vm:
            s = stats["vel_mag"]
            cols += [f"{float(s.min_val):.6e}", f"{float(s.max_val):.6e}",
                     f"{float(s.avg_val):.6e}"]
        fp.write(",".join(cols) + "\n")
