"""Full-featured simulation session (port of examples/basic_simulation.c):
solver selection, parameter tuning, outputs, stats reporting, CFL dt."""

from cfd_tpu.api import OutputType, Simulation
from cfd_tpu.solvers.ns import NSParams, compute_dt

sim = Simulation.create(64, 32, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0,
                        solver_type="projection",
                        params=NSParams(dt=0.001, cfl=0.2, mu=0.02,
                                        max_iter=1))
sim.set_output_dir("artifacts")
sim.set_run_prefix("basic")
sim.register_output(OutputType.FULL_FIELD, 20)
sim.register_output(OutputType.CSV_TIMESERIES, 1)

for step in range(60):
    assert sim.step() == 0
    if step % 20 == 0:
        s = sim.get_stats()
        dt_cfl = compute_dt(sim.field, sim.grid, sim.params)
        print(f"step {step:3d}: t={sim.current_time:6.3f} "
              f"max|u|={s.max_velocity:6.3f} max p={s.max_pressure:6.3f} "
              f"res={s.residual:.2e} CFL-dt={dt_cfl:.2e} "
              f"({s.elapsed_time_ms:.1f} ms)")
    sim.write_outputs(step)

print("done; outputs in artifacts/output/")
