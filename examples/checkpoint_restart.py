"""Checkpoint save / load / bit-exact restart (port of the reference's
checkpoint workflow in basic_simulation.c + simulation_api checkpointing)."""

import os
import tempfile

import numpy as np

from cfd_tpu.api import Simulation

work = tempfile.mkdtemp()
ck = os.path.join(work, "state.cfdchk")

sim = Simulation.create(40, 20, solver_type="rk2")
for _ in range(10):
    assert sim.step() == 0
sim.save_checkpoint(ck)
print(f"checkpoint written: {os.path.getsize(ck)} bytes at t={sim.current_time:.3f}")

restored = Simulation.load_checkpoint(ck)
print(f"restored: solver={restored.solver.name}, t={restored.current_time:.3f}")

sim.step()
restored.step()
identical = np.array_equal(np.asarray(sim.field.u), np.asarray(restored.field.u))
print(f"resumed step bit-exact: {identical}")
assert identical

# Restore into an existing, differently-shaped simulation.
other = Simulation.create(16, 16, solver_type="projection")
other.restore_checkpoint(ck)
print(f"in-place restore: grid {other.field.nx}x{other.field.ny}, "
      f"solver {other.solver.name}")
