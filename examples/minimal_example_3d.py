"""Minimal 3D simulation (port of examples/minimal_example_3d.c)."""

from cfd_tpu.api import OutputType, Simulation

sim = Simulation.create(32, 32, 16, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0,
                        zmin=0.0, zmax=0.5, solver_type="projection")
sim.set_output_dir("artifacts")
sim.set_run_prefix("minimal3d")
sim.register_output(OutputType.FULL_FIELD, 10)

for step in range(20):
    assert sim.step() == 0
    sim.write_outputs(step)

print(f"3D run done: t={sim.current_time:.3f}  "
      f"max|u|={sim.get_stats().max_velocity:.4f}")
