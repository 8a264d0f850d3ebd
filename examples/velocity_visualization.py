"""Velocity-magnitude VTK snapshots + animated flow frames (port of
examples/velocity_visualization.c and the animated-flow examples)."""

import os

from cfd_tpu.api import OutputType, Simulation

sim = Simulation.create(80, 40, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0)
sim.set_output_dir("artifacts")
sim.set_run_prefix("viz")
# Velocity-magnitude scalar field + full vector field, every 5 steps →
# a frame sequence loadable as an animation in ParaView.
sim.register_output(OutputType.VELOCITY_MAGNITUDE, 5)
sim.register_output(OutputType.VELOCITY, 5)

for step in range(40):
    assert sim.step() == 0
    sim.write_outputs(step)

run_dir = sim.outputs.get_run_dir(sim.output_base_dir, sim.run_prefix, 80, 40)
frames = sorted(f for f in os.listdir(run_dir) if f.endswith(".vtk"))
print(f"{len(frames)} VTK frames in {run_dir}")
print("open the velocity_magnitude_*.vtk series in ParaView to animate")
