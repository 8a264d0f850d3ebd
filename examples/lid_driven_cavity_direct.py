"""Lid-driven cavity driven through the solver-object interface directly.

Port of examples/lid_driven_cavity_direct.c: instead of the Simulation
facade this creates the solver from the registry (`cfd_solver_create_checked`)
and drives init/apply-BC/step itself — the pattern for applications that own
their time loop.
"""

import numpy as np

from cfd_tpu import FlowField, Grid
from cfd_tpu.api.registry import create_registry
from cfd_tpu.boundary import DirichletValues, apply_dirichlet_scalar, \
    apply_neumann_scalar
from cfd_tpu.solvers.ns import NSParams

RE = 100.0
N = 49
LID = 1.0
DT = 5e-4
STEPS = 2000

grid = Grid.uniform(N, N)
params = NSParams(dt=DT, mu=LID / RE, max_iter=1,
                  source_amplitude_u=0.0, source_amplitude_v=0.0)

registry = create_registry()
solver = registry.create_checked("projection")
assert solver is not None, "projection solver unavailable"
print(f"solver: {solver.name} — {solver.description}")
solver.init(grid, params)

field = FlowField.zeros(N, N)
u_bc = DirichletValues(top=LID)
v_bc = DirichletValues()

for i in range(STEPS):
    field = field.replace(u=apply_dirichlet_scalar(field.u, u_bc),
                          v=apply_dirichlet_scalar(field.v, v_bc),
                          p=apply_neumann_scalar(field.p))
    field, stats = solver.step(field, DT, i)
    if stats.status != 0:
        print(f"step {i} failed: {stats.status}")
        break

u = np.asarray(field.u)
c = N // 2
print("centerline u (bottom→top):", np.round(u[0, :: (N - 1) // 4, c], 4))
assert u[0, -2, c] > 0.3 and u[0, N // 4, c] < 0.0
print("cavity physics OK (lid-following top, counterflow below)")
