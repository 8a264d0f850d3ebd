"""Native (orbax-style) checkpointing for sharded simulations.

The byte-compatible ``.cfdchk`` codec (`cfd_tpu.io.checkpoint`) serializes
through the host as one little-endian stream — right for interop with the C
library, wrong for multi-host sharded state.  This module adds a TPU-native
snapshot format using orbax-checkpoint when it is installed, falling back to
a plain npz + JSON layout with identical semantics otherwise.

Stored state: the FlowField pytree, grid geometry, scalar parameters, and
current_time/solver_name — the same "field at a step boundary is the
complete dynamical state" contract as the reference (`checkpoint.h:25-30`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from ..boundary.types import BCType, DirichletValues, ThermalBCConfig
from ..core.field import FlowField
from ..core.grid import Grid
from ..core.status import CFDError, Status
from ..solvers.ns.params import NSParams

try:  # pragma: no cover - environment dependent
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # noqa: BLE001
    ocp = None
    _HAVE_ORBAX = False


def orbax_available() -> bool:
    return _HAVE_ORBAX


def _params_to_json(p: NSParams) -> dict:
    tbc = p.thermal_bc
    return {
        "dt": p.dt, "cfl": p.cfl, "gamma": p.gamma, "mu": p.mu, "k": p.k,
        "max_iter": p.max_iter, "tolerance": p.tolerance,
        "source_amplitude_u": p.source_amplitude_u,
        "source_amplitude_v": p.source_amplitude_v,
        "source_decay_rate": p.source_decay_rate,
        "pressure_coupling": p.pressure_coupling,
        "alpha": p.alpha, "beta": p.beta, "T_ref": p.T_ref,
        "gravity": list(p.gravity),
        "thermal_bc": {
            "types": [int(t) for t in tbc.face_types()],
            "values": [tbc.dirichlet_values.left, tbc.dirichlet_values.right,
                       tbc.dirichlet_values.bottom, tbc.dirichlet_values.top,
                       tbc.dirichlet_values.front, tbc.dirichlet_values.back],
        },
    }


def _params_from_json(d: dict) -> NSParams:
    t = d["thermal_bc"]["types"]
    v = d["thermal_bc"]["values"]
    tbc = ThermalBCConfig(
        left=BCType(t[0]), right=BCType(t[1]), bottom=BCType(t[2]),
        top=BCType(t[3]), front=BCType(t[4]), back=BCType(t[5]),
        dirichlet_values=DirichletValues(left=v[0], right=v[1], bottom=v[2],
                                         top=v[3], front=v[4], back=v[5]))
    return NSParams(dt=d["dt"], cfl=d["cfl"], gamma=d["gamma"], mu=d["mu"],
                    k=d["k"], max_iter=d["max_iter"],
                    tolerance=d["tolerance"],
                    source_amplitude_u=d["source_amplitude_u"],
                    source_amplitude_v=d["source_amplitude_v"],
                    source_decay_rate=d["source_decay_rate"],
                    pressure_coupling=d["pressure_coupling"],
                    alpha=d["alpha"], beta=d["beta"], T_ref=d["T_ref"],
                    gravity=tuple(d["gravity"]), thermal_bc=tbc)


def _grid_to_json(g: Grid) -> dict:
    return {"nx": g.nx, "ny": g.ny, "nz": g.nz,
            "bounds": [g.xmin, g.xmax, g.ymin, g.ymax, g.zmin, g.zmax],
            "x": np.asarray(g.x).tolist(), "y": np.asarray(g.y).tolist(),
            "z": (np.asarray(g.z).tolist() if g.z is not None else None)}


def _grid_from_json(d: dict) -> Grid:
    b = d["bounds"]
    g = Grid.uniform(d["nx"], d["ny"], d["nz"], *b)
    x = np.asarray(d["x"])
    y = np.asarray(d["y"])
    z = np.asarray(d["z"]) if d["z"] is not None else None
    return dataclasses.replace(
        g, x=x, y=y, dx=np.diff(x), dy=np.diff(y), z=z,
        dz=(np.diff(z) if z is not None else None),
        inv_dz2=(1.0 / float(np.min(np.diff(z)) ** 2)
                 if z is not None else 0.0))


def save_snapshot(path: str, grid: Grid, field: FlowField, params: NSParams,
                  current_time: float, solver_name: str) -> None:
    """Write a native snapshot directory."""
    os.makedirs(path, exist_ok=True)
    meta = {"format": "cfd_tpu-snapshot-v1",
            "grid": _grid_to_json(grid),
            "params": _params_to_json(params),
            "current_time": current_time,
            "solver_name": solver_name,
            "engine": "orbax" if _HAVE_ORBAX else "npz"}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)

    tree = {k: getattr(field, k) for k in ("u", "v", "w", "p", "rho", "T")}
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "state"), tree,
                   force=True)
        ckptr.wait_until_finished()
    else:
        np.savez(os.path.join(path, "state.npz"),
                 **{k: np.asarray(v) for k, v in tree.items()})


def load_snapshot(path: str) -> Tuple[Grid, FlowField, NSParams, float, str]:
    """Read a native snapshot directory."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise CFDError(Status.ERROR_IO, f"no snapshot at {path}")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format") != "cfd_tpu-snapshot-v1":
        raise CFDError(Status.ERROR_UNSUPPORTED, "unknown snapshot format")
    grid = _grid_from_json(meta["grid"])
    params = _params_from_json(meta["params"])

    import jax.numpy as jnp
    from ..config import resolve_dtype
    dt = resolve_dtype(None)

    state_orbax = os.path.join(path, "state")
    state_npz = os.path.join(path, "state.npz")
    if os.path.isdir(state_orbax) and _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        zeros = {k: np.zeros(grid.shape)
                 for k in ("u", "v", "w", "p", "rho", "T")}
        tree = ckptr.restore(os.path.abspath(state_orbax), zeros)
    elif os.path.exists(state_npz):
        with np.load(state_npz) as z:
            tree = {k: z[k] for k in ("u", "v", "w", "p", "rho", "T")}
    else:
        raise CFDError(Status.ERROR_IO, "snapshot state missing")

    field = FlowField(**{k: jnp.asarray(v, dtype=dt)
                         for k, v in tree.items()})
    return grid, field, params, float(meta["current_time"]), \
        meta["solver_name"]
