"""Facade-level multi-chip: `Simulation.create(..., mesh=...)` runs the
whole session sharded — step(), solve() (one GSPMD program including the
guarded iterate loop), solver swaps, and checkpoint save/load across
placements.

Extension component — the reference facade is single-node
(`simulation_api.c:24-127`); its backend matrix (suffix-selected
SIMD/OMP/CUDA solvers) becomes a placement argument here (SURVEY.md §2.9).
"""

import numpy as np
import pytest

import jax

from cfd_tpu.api.simulation import Simulation
from cfd_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def zmesh():
    return make_mesh(axes=("z",))


def _sims(zmesh, solver_type="projection", nz=16):
    ref = Simulation.create(32, 16, nz, zmax=1.0, solver_type=solver_type)
    sh = Simulation.create(32, 16, nz, zmax=1.0, solver_type=solver_type,
                           mesh=zmesh)
    return ref, sh


def test_facade_sharded_step_matches_single_device(zmesh):
    ref, sh = _sims(zmesh)
    for _ in range(3):
        assert int(ref.step()) == 0
        assert int(sh.step()) == 0
    assert len(sh.field.u.sharding.device_set) == len(jax.devices())
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(sh.field, name)),
            np.asarray(getattr(ref.field, name)),
            rtol=1e-12, atol=1e-13, err_msg=name)
    assert sh.current_time == ref.current_time


def test_facade_sharded_solve_matches_single_device(zmesh):
    from cfd_tpu.solvers.ns import NSParams
    params = NSParams(dt=0.001, cfl=0.2, mu=0.01, max_iter=4)
    ref = Simulation.create(32, 16, 16, zmax=1.0,
                            solver_type="explicit_euler", params=params)
    sh = Simulation.create(32, 16, 16, zmax=1.0,
                           solver_type="explicit_euler", params=params,
                           mesh=zmesh)
    assert int(ref.solve()) == 0
    assert int(sh.solve()) == 0
    assert sh.last_stats.iterations == ref.last_stats.iterations == 4
    np.testing.assert_allclose(np.asarray(sh.field.u),
                               np.asarray(ref.field.u),
                               rtol=1e-12, atol=1e-13)
    assert len(sh.field.u.sharding.device_set) == len(jax.devices())


def test_facade_sharded_solver_swap_keeps_mesh(zmesh):
    _, sh = _sims(zmesh, solver_type="explicit_euler")
    assert sh.set_solver_by_name("projection") == 0
    assert sh.solver.mesh is zmesh
    assert int(sh.step()) == 0
    assert len(sh.field.u.sharding.device_set) == len(jax.devices())


def test_facade_sharded_checkpoint_roundtrip(tmp_path, zmesh):
    ref, sh = _sims(zmesh)
    assert int(sh.step()) == 0
    path = str(tmp_path / "sharded.cfdchk")
    assert int(sh.save_checkpoint(path)) == 0

    # resume single-device from a sharded save
    single = Simulation.load_checkpoint(path)
    assert int(ref.step()) == 0
    np.testing.assert_allclose(np.asarray(single.field.u),
                               np.asarray(sh.field.u),
                               rtol=0, atol=0)

    # resume sharded from the same bytes, placements independent of saver
    resharded = Simulation.load_checkpoint(path, mesh=zmesh)
    assert len(resharded.field.u.sharding.device_set) == len(jax.devices())
    assert int(resharded.step()) == 0
    assert int(single.step()) == 0
    np.testing.assert_allclose(np.asarray(resharded.field.u),
                               np.asarray(single.field.u),
                               rtol=1e-12, atol=1e-13)


def test_facade_sharded_restore_into_session(tmp_path, zmesh):
    _, sh = _sims(zmesh)
    assert int(sh.step()) == 0
    path = str(tmp_path / "state.cfdchk")
    sh.save_checkpoint(path)
    u_saved = np.asarray(sh.field.u)
    assert int(sh.step()) == 0  # advance past the save
    assert int(sh.restore_checkpoint(path)) == 0
    np.testing.assert_array_equal(np.asarray(sh.field.u), u_saved)
    assert len(sh.field.u.sharding.device_set) == len(jax.devices())
    assert int(sh.step()) == 0
