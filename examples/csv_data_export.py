"""CSV timeseries / centerline / statistics export (port of
examples/csv_data_export.c)."""

import os

from cfd_tpu.api import OutputType, Simulation

sim = Simulation.create(48, 24, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0)
sim.set_output_dir("artifacts")
sim.set_run_prefix("csv_demo")
sim.register_output(OutputType.CSV_TIMESERIES, 1)
sim.register_output(OutputType.CSV_CENTERLINE, 10)
sim.register_output(OutputType.CSV_STATISTICS, 5)

for step in range(30):
    assert sim.step() == 0
    sim.write_outputs(step)

run_dir = sim.outputs.get_run_dir(sim.output_base_dir, sim.run_prefix,
                                  48, 24)
print(f"wrote: {sorted(os.listdir(run_dir))}")
with open(os.path.join(run_dir, "timeseries.csv")) as f:
    lines = f.readlines()
print(f"timeseries: {len(lines) - 1} rows; columns: {lines[0].strip()}")
