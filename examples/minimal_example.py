"""Minimal end-to-end simulation (port of examples/minimal_example.c).

100×50 grid, default explicit-Euler solver, a few steps, one VTK snapshot.
"""

from cfd_tpu.api import OutputType, Simulation

sim = Simulation.create(100, 50, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0)
sim.set_output_dir("artifacts")
sim.set_run_prefix("minimal")
sim.register_output(OutputType.VELOCITY, 10)

for step in range(50):
    status = sim.step()
    assert status == 0, f"step failed: {status}"
    sim.write_outputs(step)

stats = sim.get_stats()
print(f"done: t={sim.current_time:.3f}  max|u|={stats.max_velocity:.4f}  "
      f"max p={stats.max_pressure:.4f}")
