"""Ghia Re=1000 north-star sweep: grid/time refinement on the real TPU.

Runs the lid cavity at Re=1000 (f32 projection + exact DST pressure
solve; the odd 2^k+1 grids are outside the 2D kernel alignment so the
step is the jnp path) over a set of (n, t_end, dt) configs and prints one
JSON line per config with the centerline RMS vs the Ghia (1982) table.
Goal: find the config where RMS <= 0.01 (the 1%% north-star bar).

Usage: cd /root/repo && python artifacts/ghia1000_sweep.py [config_index...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (DirichletValues, apply_dirichlet_scalar,
                              apply_neumann_scalar)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method
from tests.validation import ghia_data

RE = 1000.0


def run_config(n, t_end, dt):
    steps = int(round(t_end / dt))
    grid = Grid.uniform(n, n)
    params = NSParams(dt=dt, cfl=0.5, mu=1.0 / RE, k=0.0, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0,
                      source_decay_rate=0.0)
    step = make_projection_step(grid, params, dtype=jnp.float32,
                                poisson_method=Method.FFT_DIRECT,
                                use_pallas=True)
    u_bc = DirichletValues(top=1.0)
    v_bc = DirichletValues()

    def cavity_step(field, i):
        field = field.replace(
            u=apply_dirichlet_scalar(field.u, u_bc),
            v=apply_dirichlet_scalar(field.v, v_bc),
            p=apply_neumann_scalar(field.p))
        field, res = step(field, dt, i)
        return field, res.status

    @jax.jit
    def run(field):
        field, statuses = lax.scan(cavity_step, field,
                                   jnp.arange(steps, dtype=jnp.int32))
        return field, jnp.max(jnp.abs(statuses))

    field0 = FlowField.quiescent(n, n, pressure=0.0, dtype=jnp.float32)
    t0 = time.perf_counter()
    field, bad = run(field0)
    bad = int(bad)
    elapsed = time.perf_counter() - t0

    u_prof = np.asarray(field.u)[0, :, n // 2]
    v_prof = np.asarray(field.v)[0, n // 2, :]
    y = np.asarray(grid.y)
    x = np.asarray(grid.x)
    rms_u = ghia_data.profile_rms_error(y, u_prof, ghia_data.Y_COORDS,
                                        ghia_data.U_TABLES[1000])
    rms_v = ghia_data.profile_rms_error(x, v_prof, ghia_data.X_COORDS,
                                        ghia_data.V_TABLES[1000])
    return {"n": n, "t_end": t_end, "dt": dt, "steps": steps,
            "rms_u": round(rms_u, 5), "rms_v": round(rms_v, 5),
            "bad": bad, "wall_s": round(elapsed, 1)}


CONFIGS = [
    (129, 30.0, 5e-4),   # 0: round-2 baseline repro (measured 0.036)
    (129, 60.0, 5e-4),   # 1: time-convergence check at same grid
    (257, 40.0, 5e-4),   # 2: grid refinement
    (257, 80.0, 5e-4),   # 3: grid + time refinement
    (513, 60.0, 4e-4),   # 4: deep refinement (diffusive limit ~9.5e-4)
    (385, 60.0, 5e-4),   # 5: intermediate
]


def main():
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(CONFIGS)))
    for i in idxs:
        n, t_end, dt = CONFIGS[i]
        try:
            out = run_config(n, t_end, dt)
        except Exception as e:
            out = {"n": n, "t_end": t_end, "dt": dt,
                   "error": repr(e)[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
