"""Integration-tier depth for the simulation façade, mirroring the
reference's `tests/simulation/` suite (lifecycle details of
`test_simulation_api.c` 526 LoC, physics sanity, decay prevention,
output-registry semantics)."""

import os

import numpy as np
import pytest

from cfd_tpu.api.outputs import MAX_OUTPUTS, OutputRegistry, OutputType
from cfd_tpu.api.simulation import Simulation
from cfd_tpu.core.status import Status


def _sim(nx=24, ny=24, **kw):
    return Simulation.create(nx, ny, **kw)


# ------------------------------------------------------------ time quirks

def test_step_advances_fixed_dt():
    """run_simulation_step hard-codes dt=0.005 regardless of params.dt
    (`simulation_api.c:185-202`)."""
    sim = _sim()
    assert sim.current_time == 0.0
    for k in range(3):
        assert sim.step() == Status.SUCCESS
    assert sim.current_time == pytest.approx(3 * 0.005)


def test_solve_accumulates_dt_times_iterations():
    """run_simulation_solve advances dt·iterations
    (`simulation_api.c:204-219`)."""
    sim = _sim()
    st = sim.solve()
    assert st == Status.SUCCESS
    stats = sim.get_stats()
    assert stats.iterations >= 1
    assert sim.current_time == pytest.approx(0.005 * stats.iterations)


def test_stats_populated_after_step():
    sim = _sim()
    sim.step()
    stats = sim.get_stats()
    assert stats.status == Status.SUCCESS
    assert stats.elapsed_time_ms >= 0.0
    assert np.isfinite(stats.max_velocity)


# ------------------------------------------------------ physics sanity

def test_default_sources_prevent_decay():
    """The default decaying-sinusoid sources keep the flow alive over many
    steps (the reference's decay-prevention test), while zeroed sources let
    the sinusoidal init viscously decay."""
    sim = _sim()
    for _ in range(40):
        assert sim.step() == Status.SUCCESS
    v_with = float(sim.get_stats().max_velocity)
    assert v_with > 1e-3

    # unforced: the same run stays finite and bounded (no artificial
    # energy injection from the dp coupling)
    sim0 = _sim()
    sim0.params = sim0.params.replace(source_amplitude_u=0.0,
                                      source_amplitude_v=0.0)
    for _ in range(40):
        assert sim0.step() == Status.SUCCESS
    v0 = float(sim0.get_stats().max_velocity)
    assert np.isfinite(v0) and v0 < 10.0


@pytest.mark.parametrize("name", ["explicit_euler", "rk2", "projection"])
def test_every_registered_solver_runs_through_facade(name):
    sim = _sim(16, 16)
    assert sim.set_solver_by_name(name) == 0
    for _ in range(2):
        assert sim.step() == Status.SUCCESS
    assert np.all(np.isfinite(np.asarray(sim.field.u)))


# ------------------------------------------------------- output registry

def test_output_interval_semantics(tmp_path):
    sim = _sim()
    sim.set_output_dir(str(tmp_path))
    sim.set_run_prefix("ivl")
    sim.register_output(OutputType.CSV_TIMESERIES, interval=3)
    sim.step()
    for step in range(7):
        sim.write_outputs(step)
    run_dir = sim.outputs.get_run_dir(str(tmp_path), "ivl", 24, 24)
    csvs = [f for f in os.listdir(run_dir) if f.endswith(".csv")]
    # steps 0, 3, 6 are due — timeseries appends to one file
    assert len(csvs) == 1
    with open(os.path.join(run_dir, csvs[0])) as fh:
        rows = [ln for ln in fh.read().strip().splitlines() if ln]
    assert len(rows) == 1 + 3  # header + 3 due steps


def test_output_config_cap():
    reg = OutputRegistry()
    for i in range(MAX_OUTPUTS + 5):
        reg.add(OutputType.VELOCITY, 1)
    assert reg.count() == MAX_OUTPUTS  # silently capped (reference ≤16)


def test_lazy_derived_fields():
    reg = OutputRegistry()
    reg.add(OutputType.VELOCITY, 1)
    assert not reg.needs_velocity_magnitude()
    assert not reg.needs_statistics()
    reg.add(OutputType.CSV_CENTERLINE, 1)
    assert reg.needs_velocity_magnitude()
    assert not reg.needs_statistics()
    reg.add(OutputType.CSV_STATISTICS, 1)
    assert reg.needs_statistics()


def test_clear_outputs_and_run_dir_caching(tmp_path):
    sim = _sim()
    sim.set_output_dir(str(tmp_path))
    sim.register_output(OutputType.VELOCITY, 1)
    assert sim.outputs.count() == 1
    d1 = sim.outputs.get_run_dir(str(tmp_path), None, 24, 24)
    d2 = sim.outputs.get_run_dir(str(tmp_path), None, 24, 24)
    assert d1 == d2  # cached once
    sim.clear_outputs()
    assert sim.outputs.count() == 0


def test_restore_resets_run_dir_cache(tmp_path):
    """After restore_checkpoint the run-dir cache is invalidated
    (`simulation_api.c:446`)."""
    sim = _sim()
    sim.set_output_dir(str(tmp_path))
    d1 = sim.outputs.get_run_dir(str(tmp_path), None, 24, 24)
    ck = str(tmp_path / "s.cfdchk")
    assert sim.save_checkpoint(ck) == Status.SUCCESS
    assert sim.restore_checkpoint(ck) == Status.SUCCESS
    import time as _t
    _t.sleep(1.1)  # run-dir names are second-granular timestamps
    d2 = sim.outputs.get_run_dir(str(tmp_path), None, 24, 24)
    assert d1 != d2


def test_checkpoint_resume_is_bit_exact():
    """Save → load → N steps matches an uninterrupted run (the reference's
    'field at a step boundary is the complete dynamical state' contract,
    `checkpoint.h:25-30`)."""
    import tempfile
    sim_a = _sim(16, 16)
    for _ in range(3):
        sim_a.step()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "mid.cfdchk")
        sim_a.save_checkpoint(p)
        sim_b = Simulation.load_checkpoint(p)
    for _ in range(3):
        sim_a.step()
        sim_b.step()
    np.testing.assert_array_equal(np.asarray(sim_a.field.u),
                                  np.asarray(sim_b.field.u))
    np.testing.assert_array_equal(np.asarray(sim_a.field.p),
                                  np.asarray(sim_b.field.p))
    assert sim_a.current_time == pytest.approx(sim_b.current_time)
