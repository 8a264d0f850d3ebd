"""Output registry: registered configs → automatic per-step VTK/CSV writes.

Re-design of `lib/src/api/output_registry.c` + `cfd/io/output_registry.h`:
up to 16 output configs, each (type, interval, prefix); a cached run
directory ``{base}/output/{prefix}_{nx}x{ny}_{timestamp}/``; derived fields
computed once per write when any registered type needs them.

I/O happens on the host after the step returns — the reference's design
(outputs outside the solver) maps perfectly; nothing here enters jit.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import List, Optional

from ..core import derived
from ..core.filesystem import create_run_directory
from ..io import csv_out, vtk

MAX_OUTPUTS = 16  # `output_registry.c:16-23`


class OutputType(enum.IntEnum):
    """Mirrors output_field_type (`simulation_api.h:118-128`)."""

    VELOCITY_MAGNITUDE = 0
    VELOCITY = 1
    FULL_FIELD = 2
    CSV_TIMESERIES = 3
    CSV_CENTERLINE = 4
    CSV_STATISTICS = 5


_NEEDS_VEL_MAG = {OutputType.VELOCITY_MAGNITUDE, OutputType.CSV_TIMESERIES,
                  OutputType.CSV_CENTERLINE, OutputType.CSV_STATISTICS}
_NEEDS_STATS = {OutputType.CSV_TIMESERIES, OutputType.CSV_STATISTICS}

_DEFAULT_PREFIX = {
    OutputType.VELOCITY_MAGNITUDE: "velocity_magnitude",
    OutputType.VELOCITY: "velocity",
    OutputType.FULL_FIELD: "flow_field",
    OutputType.CSV_TIMESERIES: "timeseries",
    OutputType.CSV_CENTERLINE: "centerline",
    OutputType.CSV_STATISTICS: "statistics",
}


@dataclasses.dataclass
class OutputConfig:
    field_type: OutputType
    interval: int
    prefix: Optional[str] = None


class OutputRegistry:
    def __init__(self):
        self._configs: List[OutputConfig] = []
        self._run_dir: Optional[str] = None

    def add(self, field_type: OutputType, interval: int,
            prefix: Optional[str] = None) -> None:
        if len(self._configs) >= MAX_OUTPUTS:
            return
        self._configs.append(OutputConfig(OutputType(field_type),
                                          max(1, int(interval)), prefix))

    def clear(self) -> None:
        self._configs.clear()

    def count(self) -> int:
        return len(self._configs)

    def has_type(self, field_type: OutputType) -> bool:
        return any(c.field_type == field_type for c in self._configs)

    def needs_velocity_magnitude(self) -> bool:
        return any(c.field_type in _NEEDS_VEL_MAG for c in self._configs)

    def needs_statistics(self) -> bool:
        return any(c.field_type in _NEEDS_STATS for c in self._configs)

    def get_run_dir(self, base_dir: str, run_prefix: Optional[str],
                    nx: int, ny: int) -> str:
        """Create-once cached run dir (`output_registry_get_run_dir`)."""
        if self._run_dir is None:
            prefix = run_prefix or "run"
            self._run_dir = create_run_directory(base_dir, prefix, nx, ny)
        return self._run_dir

    def reset_run_dir(self) -> None:
        """Invalidate after a checkpoint restore (`output_registry_reset_run_dir`)."""
        self._run_dir = None

    def write_outputs(self, run_dir: str, step: int, current_time: float,
                      field, grid, params, stats) -> None:
        """Write every registered output due at this step
        (`output_registry_write_outputs`)."""
        due = [c for c in self._configs if step % c.interval == 0]
        if not due:
            return
        vel_mag = None
        field_stats = None
        if self.needs_velocity_magnitude():
            vel_mag = derived.velocity_magnitude(field)
        if self.needs_statistics():
            field_stats = derived.compute_statistics(field)

        for cfg in due:
            prefix = cfg.prefix or _DEFAULT_PREFIX[cfg.field_type]
            t = cfg.field_type
            if t == OutputType.VELOCITY_MAGNITUDE:
                path = os.path.join(run_dir, f"{prefix}_{step:03d}.vtk")
                vtk.write_vtk_scalar(path, "velocity_magnitude", vel_mag,
                                     grid.nx, grid.ny, grid.nz,
                                     grid.xmin, grid.xmax, grid.ymin,
                                     grid.ymax, grid.zmin, grid.zmax)
            elif t == OutputType.VELOCITY:
                path = os.path.join(run_dir, f"{prefix}_{step:03d}.vtk")
                vtk.write_vtk_vector(path, "velocity", field.u, field.v,
                                     field.w, grid.nx, grid.ny, grid.nz,
                                     grid.xmin, grid.xmax, grid.ymin,
                                     grid.ymax, grid.zmin, grid.zmax)
            elif t == OutputType.FULL_FIELD:
                path = os.path.join(run_dir, f"{prefix}_{step:03d}.vtk")
                vtk.write_vtk_flow_field(path, field, grid.nx, grid.ny,
                                         grid.nz, grid.xmin, grid.xmax,
                                         grid.ymin, grid.ymax, grid.zmin,
                                         grid.zmax)
            elif t == OutputType.CSV_TIMESERIES:
                path = os.path.join(run_dir, f"{prefix}.csv")
                ts_stats = field_stats or derived.compute_statistics(field)
                csv_out.write_csv_timeseries(
                    path, step, current_time, params.dt, ts_stats,
                    stats.iterations if stats else 0,
                    stats.residual if stats else 0.0,
                    stats.elapsed_time_ms if stats else 0.0,
                    create_new=(step == 0))
            elif t == OutputType.CSV_CENTERLINE:
                path = os.path.join(run_dir, f"{prefix}_{step:03d}.csv")
                csv_out.write_csv_centerline(path, field, grid.x, grid.y,
                                             csv_out.HORIZONTAL, vel_mag)
            elif t == OutputType.CSV_STATISTICS:
                path = os.path.join(run_dir, f"{prefix}.csv")
                st = field_stats or derived.compute_statistics(field)
                csv_out.write_csv_statistics(path, step, current_time, st,
                                             create_new=(step == 0))
