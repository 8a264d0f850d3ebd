"""Animated *simulated* flow: run the solver and emit VTK frames.

Port of examples/animated_flow_simulation.c — a real simulation (decaying
source-driven vortical flow through the Simulation facade) with VELOCITY
VTK output registered at a fixed interval, producing a ParaView time series
under the run directory.
"""

from cfd_tpu.api.outputs import OutputType
from cfd_tpu.api.simulation import Simulation

N = 65
STEPS = 100
FRAME_INTERVAL = 10

sim = Simulation.create(N, N, solver_type="projection")
sim.set_output_dir(".")
sim.set_run_prefix("animated")
sim.register_output(OutputType.VELOCITY, FRAME_INTERVAL, "frame")
sim.register_output(OutputType.CSV_TIMESERIES, FRAME_INTERVAL, "history")

for step in range(STEPS):
    status = sim.step()
    if int(status) != 0:
        print(f"step {step} failed: {status}")
        break
    sim.write_outputs(step)
    if step % FRAME_INTERVAL == 0:
        stats = sim.get_stats()
        print(f"step {step:4d}: t={sim.current_time:.3f} "
              f"max|u|={stats.max_velocity:.4f}")

print(f"\nframes + timeseries written under the run directory "
      f"(animated_*/); load frame_velocity_*.vtk as a time series.")
