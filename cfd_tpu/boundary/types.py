"""Boundary-condition type system and configuration objects.

TPU-native re-design of the reference BC type system
(`lib/include/cfd/boundary/boundary_conditions.h:19-298`):

* enums keep the reference's numeric values (checkpoint interop);
* config structs become frozen dataclasses.  Structural fields (edge,
  profile kind, BC types) are *static* — they select code paths at trace
  time; numeric fields (velocities, frequencies, Dirichlet values) are plain
  floats that may be traced;
* C function-pointer callbacks (`bc_inlet_profile_fn`,
  `bc_time_custom_fn`) become **jax-traceable callables** so custom profiles
  run on-device inside jit — the reference's host-callback design would force
  a host round-trip per step on TPU (SURVEY.md §7 "host callbacks").

There is no backend-selection API: the scalar/SIMD/OMP/CUDA axis collapses
into the single XLA path (`cfd_tpu.core.features` documents the mapping).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Optional


class BCType(enum.IntEnum):
    """Mirrors bc_type_t (`boundary_conditions.h:19-27`)."""

    PERIODIC = 0
    NEUMANN = 1
    DIRICHLET = 2
    NOSLIP = 3
    INLET = 4
    OUTLET = 5
    SYMMETRY = 6


class Edge(enum.IntFlag):
    """Mirrors bc_edge_t bitmask (`boundary_conditions.h:96-103`)."""

    LEFT = 0x01    # x = 0
    RIGHT = 0x02   # x = Lx
    BOTTOM = 0x04  # y = 0
    TOP = 0x08     # y = Ly
    FRONT = 0x10   # z = Lz (plane nz-1, 3D only)
    BACK = 0x20    # z = 0  (plane 0, 3D only)

    ALL_2D = LEFT | RIGHT | BOTTOM | TOP
    ALL_3D = LEFT | RIGHT | BOTTOM | TOP | FRONT | BACK


def edge_is_single(edge: Edge) -> bool:
    e = int(edge)
    return e in (0x01, 0x02, 0x04, 0x08, 0x10, 0x20)


@dataclasses.dataclass(frozen=True)
class DirichletValues:
    """Fixed per-face values (mirrors bc_dirichlet_values_t, `:50-57`)."""

    left: float = 0.0
    right: float = 0.0
    top: float = 0.0
    bottom: float = 0.0
    front: float = 0.0
    back: float = 0.0


class InletProfile(enum.IntEnum):
    UNIFORM = 0
    PARABOLIC = 1
    CUSTOM = 2


class InletSpecType(enum.IntEnum):
    VELOCITY = 0
    MAGNITUDE_DIR = 1
    MASS_FLOW = 2


class OutletType(enum.IntEnum):
    ZERO_GRADIENT = 0
    CONVECTIVE = 1


class TimeProfile(enum.IntEnum):
    CONSTANT = 0
    SINUSOIDAL = 1
    RAMP = 2
    STEP = 3
    CUSTOM = 4


@dataclasses.dataclass(frozen=True)
class TimeConfig:
    """Time modulation of an inlet (mirrors bc_time_config_t, `:185-197`).

    ``custom_fn(time, dt) -> scalar`` must be jax-traceable.
    """

    profile: TimeProfile = TimeProfile.CONSTANT
    # sinusoidal: offset + amplitude*sin(2*pi*frequency*t + phase)
    frequency: float = 0.0
    amplitude: float = 0.0
    phase: float = 0.0
    offset: float = 0.0
    # ramp
    t_start: float = 0.0
    t_end: float = 0.0
    value_start: float = 0.0
    value_end: float = 0.0
    # step
    t_step: float = 0.0
    value_before: float = 0.0
    value_after: float = 0.0
    custom_fn: Optional[Callable] = None

    def modulator(self, t, dt):
        """Time modulation factor (mirrors bc_time_get_modulator,
        `boundary_conditions_time.h:20-110`).  Traceable in t/dt."""
        import jax.numpy as jnp
        if self.profile == TimeProfile.CONSTANT:
            return 1.0
        if self.profile == TimeProfile.SINUSOIDAL:
            return self.offset + self.amplitude * jnp.sin(
                2.0 * math.pi * self.frequency * t + self.phase)
        if self.profile == TimeProfile.RAMP:
            if self.t_end <= self.t_start:  # invalid config guard
                return self.value_end
            frac = jnp.clip((t - self.t_start) / (self.t_end - self.t_start),
                            0.0, 1.0)
            return self.value_start + frac * (self.value_end - self.value_start)
        if self.profile == TimeProfile.STEP:
            return jnp.where(t < self.t_step, self.value_before,
                             self.value_after)
        if self.profile == TimeProfile.CUSTOM and self.custom_fn is not None:
            return self.custom_fn(t, dt)
        return 1.0


@dataclasses.dataclass(frozen=True)
class InletConfig:
    """Inlet specification (mirrors bc_inlet_config_t, `:233-267`).

    ``custom_profile(position) -> (u, v)`` and
    ``custom_profile_time(position, time, dt) -> (u, v)`` must be
    jax-traceable over a position array in [0, 1].
    """

    edge: Edge = Edge.LEFT
    profile: InletProfile = InletProfile.UNIFORM
    spec_type: InletSpecType = InletSpecType.VELOCITY
    # VELOCITY spec
    u: float = 0.0
    v: float = 0.0
    # MAGNITUDE_DIR spec
    magnitude: float = 0.0
    direction: float = 0.0
    # MASS_FLOW spec
    mass_flow_rate: float = 0.0
    density: float = 0.0
    inlet_length: float = 0.0
    custom_profile: Optional[Callable] = None
    time_config: TimeConfig = TimeConfig()
    custom_profile_time: Optional[Callable] = None

    # ---- builders mirroring bc_inlet_config_* (`boundary_conditions.h:690-801`)

    @classmethod
    def uniform(cls, u: float, v: float, edge: Edge = Edge.LEFT):
        return cls(edge=edge, profile=InletProfile.UNIFORM,
                   spec_type=InletSpecType.VELOCITY, u=u, v=v)

    @classmethod
    def parabolic(cls, max_velocity: float, edge: Edge = Edge.LEFT):
        """Parabolic profile 4·s(1−s) of the edge-normal velocity.

        For left/right edges u is parabolic; for top/bottom, v
        (`bc_inlet_config_parabolic` docs, `boundary_conditions.h:693-702`).
        """
        if edge in (Edge.BOTTOM, Edge.TOP):
            return cls(edge=edge, profile=InletProfile.PARABOLIC,
                       spec_type=InletSpecType.VELOCITY, u=0.0, v=max_velocity)
        return cls(edge=edge, profile=InletProfile.PARABOLIC,
                   spec_type=InletSpecType.VELOCITY, u=max_velocity, v=0.0)

    @classmethod
    def magnitude_dir(cls, magnitude: float, direction: float,
                      edge: Edge = Edge.LEFT):
        return cls(edge=edge, spec_type=InletSpecType.MAGNITUDE_DIR,
                   magnitude=magnitude, direction=direction)

    @classmethod
    def mass_flow(cls, mass_flow_rate: float, density: float,
                  inlet_length: float, edge: Edge = Edge.LEFT):
        return cls(edge=edge, spec_type=InletSpecType.MASS_FLOW,
                   mass_flow_rate=mass_flow_rate, density=density,
                   inlet_length=inlet_length)

    @classmethod
    def custom(cls, fn: Callable, edge: Edge = Edge.LEFT):
        return cls(edge=edge, profile=InletProfile.CUSTOM, custom_profile=fn)

    @classmethod
    def time_sinusoidal(cls, u, v, frequency, amplitude, phase, offset,
                        edge: Edge = Edge.LEFT):
        return cls(edge=edge, spec_type=InletSpecType.VELOCITY, u=u, v=v,
                   time_config=TimeConfig(TimeProfile.SINUSOIDAL,
                                          frequency=frequency,
                                          amplitude=amplitude, phase=phase,
                                          offset=offset))

    @classmethod
    def time_ramp(cls, u, v, t_start, t_end, value_start, value_end,
                  edge: Edge = Edge.LEFT):
        return cls(edge=edge, spec_type=InletSpecType.VELOCITY, u=u, v=v,
                   time_config=TimeConfig(TimeProfile.RAMP, t_start=t_start,
                                          t_end=t_end, value_start=value_start,
                                          value_end=value_end))

    @classmethod
    def time_step(cls, u, v, t_step, value_before, value_after,
                  edge: Edge = Edge.LEFT):
        return cls(edge=edge, spec_type=InletSpecType.VELOCITY, u=u, v=v,
                   time_config=TimeConfig(TimeProfile.STEP, t_step=t_step,
                                          value_before=value_before,
                                          value_after=value_after))

    @classmethod
    def time_custom(cls, fn: Callable, edge: Edge = Edge.LEFT):
        return cls(edge=edge, custom_profile_time=fn)

    def with_edge(self, edge: Edge) -> "InletConfig":
        return dataclasses.replace(self, edge=edge)

    def with_time_sinusoidal(self, frequency, amplitude, phase, offset):
        return dataclasses.replace(self, time_config=TimeConfig(
            TimeProfile.SINUSOIDAL, frequency=frequency, amplitude=amplitude,
            phase=phase, offset=offset))


@dataclasses.dataclass(frozen=True)
class OutletConfig:
    """Outlet spec (mirrors bc_outlet_config_t, `:275-282`).

    Note: the reference applies zero-gradient for BOTH types — the convective
    form is config-only "for now" (`boundary_conditions_outlet_scalar.c:33-37`).
    We preserve that default, and additionally offer the true convective
    update du/dt + U du/dn = 0 behind ``true_convective=True``.
    """

    edge: Edge = Edge.RIGHT
    type: OutletType = OutletType.ZERO_GRADIENT
    advection_velocity: float = 0.0
    true_convective: bool = False

    @classmethod
    def zero_gradient(cls, edge: Edge = Edge.RIGHT):
        return cls(edge=edge, type=OutletType.ZERO_GRADIENT)

    @classmethod
    def convective(cls, advection_velocity: float, edge: Edge = Edge.RIGHT,
                   true_convective: bool = False):
        return cls(edge=edge, type=OutletType.CONVECTIVE,
                   advection_velocity=advection_velocity,
                   true_convective=true_convective)

    def with_edge(self, edge: Edge) -> "OutletConfig":
        return dataclasses.replace(self, edge=edge)


@dataclasses.dataclass(frozen=True)
class SymmetryConfig:
    """Symmetry planes (mirrors bc_symmetry_config_t, `:296-298`)."""

    edges: Edge = Edge(0)


@dataclasses.dataclass(frozen=True)
class ThermalBCConfig:
    """Per-face thermal BCs (mirrors ns_thermal_bc_config_t,
    `navier_stokes_solver.h:108-116`).  Zero-init = all PERIODIC."""

    left: BCType = BCType.PERIODIC
    right: BCType = BCType.PERIODIC
    bottom: BCType = BCType.PERIODIC
    top: BCType = BCType.PERIODIC
    front: BCType = BCType.PERIODIC
    back: BCType = BCType.PERIODIC
    dirichlet_values: DirichletValues = DirichletValues()

    def face_types(self):
        return (self.left, self.right, self.bottom, self.top,
                self.front, self.back)


def thermal_z_specs(config: "ThermalBCConfig",
                    periodic=("periodic", "periodic"),
                    neumann=("neumann", "neumann")):
    """(low, high) z-face specs for the back/front thermal BCs: DIRICHLET
    becomes the float value, NEUMANN/PERIODIC the given per-face tokens.

    One mapping shared by the fused kernel builders (tokens "p1"/"pN2",
    the rolling engine's shell-source vocabulary) and the shard_map z-wrap
    helpers (tokens "neumann"/"periodic") so the back↔plane-0 /
    front↔plane-(nz−1) convention lives in one place (matches
    ``apply_thermal_bcs``; `energy_solver.h:65-87`)."""
    v = config.dirichlet_values

    def one(bc, value, per, neu):
        bc = BCType(bc)
        if bc == BCType.DIRICHLET:
            return float(value)
        if bc == BCType.NEUMANN:
            return neu
        return per

    return (one(config.back, v.back, periodic[0], neumann[0]),
            one(config.front, v.front, periodic[1], neumann[1]))


def thermal_y_specs(config: "ThermalBCConfig",
                    periodic=("periodic", "periodic"),
                    neumann=("neumann", "neumann")):
    """(low, high) y-face specs for the bottom/top thermal BCs — the y-row
    twin of `thermal_z_specs`, used by the (z, y) 2D-mesh shard_map
    wrappers whose kernels skip the in-plane y faces (their wrap rows
    live on the opposite y-edge shard; `energy_solver.h:65-87`)."""
    v = config.dirichlet_values

    def one(bc, value, per, neu):
        bc = BCType(bc)
        if bc == BCType.DIRICHLET:
            return float(value)
        if bc == BCType.NEUMANN:
            return neu
        return per

    return (one(config.bottom, v.bottom, periodic[0], neumann[0]),
            one(config.top, v.top, periodic[1], neumann[1]))
