"""Simulation façade tests (mirrors tests/simulation/test_simulation_api.c
and test_reentrancy.c)."""

import os

import numpy as np
import pytest

from cfd_tpu.api import OutputType, Simulation, create_registry
from cfd_tpu.core.status import Status


def test_create_and_step(tmp_path):
    sim = Simulation.create(16, 12, xmin=0, xmax=2, ymin=0, ymax=1)
    assert sim.solver.name == "explicit_euler"
    assert sim.current_time == 0.0
    st = sim.step()
    assert st == Status.SUCCESS
    # the dt=0.005 quirk
    np.testing.assert_allclose(sim.current_time, 0.005)
    assert sim.params.dt == 0.005
    st = sim.solve()
    assert st == Status.SUCCESS
    np.testing.assert_allclose(sim.current_time,
                               0.005 + 0.005 * sim.last_stats.iterations)


def test_create_with_solver():
    sim = Simulation.create(12, 12, solver_type="projection")
    assert sim.solver.method == "projection"
    assert sim.step() == Status.SUCCESS


def test_unknown_solver_raises():
    from cfd_tpu.core.status import CFDError
    with pytest.raises(CFDError):
        Simulation.create(12, 12, solver_type="does_not_exist")


def test_set_solver_by_name():
    sim = Simulation.create(12, 12)
    assert sim.set_solver_by_name("rk2") == 0
    assert sim.solver.method == "rk2"
    assert sim.set_solver_by_name("bogus") == -1
    assert sim.solver.method == "rk2"  # unchanged on failure


def test_registry_listing():
    reg = create_registry()
    names = reg.list()
    # The reference's 16 built-ins plus the projection_spectral and
    # projection_multigrid extensions.
    assert len(names) == 18
    for expected in ("explicit_euler", "projection", "rk2_optimized",
                     "rk4_gpu", "projection_omp", "projection_spectral",
                     "projection_multigrid"):
        assert expected in names
    assert reg.has("rk4")
    assert not reg.has("nope")
    assert "RK2" in reg.describe("rk2")


def test_registry_create_checked_backend_gating():
    reg = create_registry()
    # CPU test run: accelerator not available → GPU names rejected.
    import jax
    accel = any(d.platform != "cpu" for d in jax.devices())
    s = reg.create_checked("projection_gpu")
    if accel:
        assert s is not None
    else:
        assert s is None
    assert reg.create_checked("projection") is not None
    assert reg.create_checked("projection_omp") is not None


def test_outputs_written(tmp_path):
    sim = Simulation.create(12, 10)
    sim.set_output_dir(str(tmp_path))
    sim.set_run_prefix("t")
    sim.register_output(OutputType.VELOCITY, 1)
    sim.register_output(OutputType.CSV_TIMESERIES, 1)
    sim.register_output(OutputType.CSV_STATISTICS, 2)
    sim.step()
    sim.write_outputs(0)
    sim.step()
    sim.write_outputs(1)
    run_dirs = os.listdir(tmp_path / "output")
    assert len(run_dirs) == 1
    run_dir = tmp_path / "output" / run_dirs[0]
    files = sorted(os.listdir(run_dir))
    assert "velocity_000.vtk" in files
    assert "velocity_001.vtk" in files
    assert "timeseries.csv" in files
    assert "statistics.csv" in files
    # interval=2: statistics written at step 0 only
    with open(run_dir / "statistics.csv") as f:
        assert len(f.readlines()) == 2  # header + step 0
    with open(run_dir / "timeseries.csv") as f:
        lines = f.readlines()
        assert lines[0].startswith("step,time,dt,max_u")
        assert len(lines) == 3


def test_reentrancy_two_sims(tmp_path):
    """Two simulations with independent output dirs (test_reentrancy.c)."""
    a = Simulation.create(10, 10)
    b = Simulation.create(12, 12)
    a.set_output_dir(str(tmp_path / "a"))
    b.set_output_dir(str(tmp_path / "b"))
    a.register_output(OutputType.VELOCITY, 1)
    b.register_output(OutputType.VELOCITY, 1)
    a.step()
    b.step()
    a.write_outputs(0)
    b.write_outputs(0)
    assert os.path.isdir(tmp_path / "a" / "output")
    assert os.path.isdir(tmp_path / "b" / "output")
    assert a.field.nx == 10 and b.field.nx == 12


def test_projection_spectral_solver():
    """The TPU-extension registry entry: exact spectral pressure solve
    through the full Simulation facade."""
    from cfd_tpu.api.simulation import Simulation, has_solver

    assert has_solver("projection_spectral")
    sim = Simulation.create(33, 33, solver_type="projection_spectral")
    assert "spectral" in sim.solver.description
    for _ in range(3):
        status = sim.step()
        assert int(status) == 0
    stats = sim.get_stats()
    # Exact solve: per-step pressure residual at roundoff level.
    assert stats.residual < 1e-6


def test_projection_multigrid_solver():
    """The projection_multigrid extension steps a coarsenable-grid
    simulation with the O(N) pressure solve."""
    from cfd_tpu.api import Simulation
    from cfd_tpu.api.simulation import has_solver

    assert has_solver("projection_multigrid")
    sim = Simulation.create(33, 33, solver_type="projection_multigrid")
    for _ in range(3):
        sim.step()
    assert bool(sim.field.is_finite())


def test_from_grid_stretched_consistent():
    """Simulation.from_grid: the session object over a caller-built
    (wall-clustered) grid with the consistent scheme — framework
    extension; the reference's init_simulation is uniform-only."""
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import Grid
    from cfd_tpu.api import Simulation
    from cfd_tpu.solvers.ns import NSParams

    g = Grid.stretched(48, 32, beta=1.5)
    sim = Simulation.from_grid(
        g, solver_type="explicit_euler",
        params=NSParams(dt=1e-4, mu=0.01, max_iter=1,
                        nonuniform_scheme="consistent"))
    assert sim.grid is g
    for i in range(5):
        assert int(sim.step()) == 0
    assert np.isfinite(np.asarray(sim.field.u)).all()
    # registry swap still works on the custom grid
    assert sim.set_solver_by_name("rk2") == 0
    assert int(sim.step()) == 0
