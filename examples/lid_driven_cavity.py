"""Lid-driven cavity at Re=100 with Ghia validation output.

Port of examples/lid_driven_cavity.c: quiescent start, moving lid via
Dirichlet BCs re-applied each step, projection solver, centerline CSV.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (DirichletValues, apply_dirichlet_scalar,
                              apply_neumann_scalar)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step

RE = 100.0
N = 65
LID = 1.0
DT = 5e-4
STEPS = 5000

grid = Grid.uniform(N, N)
params = NSParams(dt=DT, mu=LID / RE, max_iter=1,
                  source_amplitude_u=0.0, source_amplitude_v=0.0)
step = make_projection_step(grid, params)

u_bc = DirichletValues(top=LID)
v_bc = DirichletValues()


def cavity_step(field, i):
    field = field.replace(u=apply_dirichlet_scalar(field.u, u_bc),
                          v=apply_dirichlet_scalar(field.v, v_bc),
                          p=apply_neumann_scalar(field.p))
    field, res = step(field, DT, i)
    return field, res.status


@jax.jit
def run(field):
    return lax.scan(cavity_step, field, jnp.arange(STEPS))


field, statuses = run(FlowField.quiescent(N, N, pressure=0.0))
assert (np.asarray(statuses) == 0).all()

ic = N // 2
u_centerline = np.asarray(field.u)[0, :, ic]
print("y, u(0.5, y) centerline:")
for j in range(0, N, 8):
    print(f"  {grid.y[j]:.3f}  {u_centerline[j]: .4f}")
print(f"u at center: {u_centerline[N // 2]: .4f} (Ghia: -0.2058)")
