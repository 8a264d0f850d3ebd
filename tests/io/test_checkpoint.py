"""Checkpoint round-trip + corruption tests (mirrors tests/io/test_checkpoint.c,
560 LoC of cases)."""

import struct

import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.api import Simulation
from cfd_tpu.boundary import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.core.status import CFDError, Status
from cfd_tpu.io.checkpoint import (FORMAT_VERSION, MAGIC, read_checkpoint,
                                   write_checkpoint)
from cfd_tpu.solvers.ns import NSParams


def make_state(nz=1):
    g = Grid.uniform(8, 6, nz, xmin=0, xmax=2, ymin=0, ymax=1,
                     zmin=0, zmax=1 if nz > 1 else 0)
    f = FlowField.initialize(g)
    p = NSParams(dt=0.002, mu=0.05, alpha=0.1, beta=0.01, T_ref=300.0,
                 gravity=(0.0, -9.81, 0.0),
                 thermal_bc=ThermalBCConfig(
                     left=BCType.DIRICHLET, top=BCType.NEUMANN,
                     dirichlet_values=DirichletValues(left=350.0)))
    return g, f, p


@pytest.mark.parametrize("nz", [1, 5])
def test_roundtrip(tmp_path, nz):
    g, f, p = make_state(nz)
    path = str(tmp_path / "c.cfdchk")
    write_checkpoint(path, g, f, p, 1.25, "projection", "runpfx", "/tmp/base")
    g2, f2, p2, t, name, prefix, base = read_checkpoint(path)
    assert t == 1.25 and name == "projection" and prefix == "runpfx"
    assert base == "/tmp/base"
    assert (g2.nx, g2.ny, g2.nz) == (g.nx, g.ny, g.nz)
    np.testing.assert_array_equal(g2.x, g.x)
    np.testing.assert_array_equal(g2.dy, g.dy)
    for a, b in ((f2.u, f.u), (f2.v, f.v), (f2.w, f.w), (f2.p, f.p),
                 (f2.rho, f.rho), (f2.T, f.T)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert p2.dt == p.dt and p2.mu == p.mu and p2.alpha == p.alpha
    assert p2.gravity == p.gravity
    assert p2.thermal_bc.left == BCType.DIRICHLET
    assert p2.thermal_bc.dirichlet_values.left == 350.0
    # callbacks restore as None by contract
    assert p2.source_func is None and p2.heat_source_func is None


def test_roundtrip_3d_stretched(tmp_path):
    g = Grid.stretched(9, 9, 9, zmin=0, zmax=1, beta=1.5)
    f = FlowField.initialize(g)
    path = str(tmp_path / "s.cfdchk")
    write_checkpoint(path, g, f, NSParams(), 0.0, "rk4")
    g2, _, _, _, name, _, _ = read_checkpoint(path)
    np.testing.assert_array_equal(g2.z, g.z)
    np.testing.assert_allclose(g2.inv_dz2, g.inv_dz2)
    assert name == "rk4"


def test_bad_magic_rejected(tmp_path):
    g, f, p = make_state()
    path = str(tmp_path / "c.cfdchk")
    write_checkpoint(path, g, f, p, 0.0, "rk2")
    data = bytearray(open(path, "rb").read())
    data[0] = ord("X")
    open(path, "wb").write(bytes(data))
    with pytest.raises(CFDError) as e:
        read_checkpoint(path)
    assert e.value.status == Status.ERROR_INVALID


def test_bad_version_rejected(tmp_path):
    g, f, p = make_state()
    path = str(tmp_path / "c.cfdchk")
    write_checkpoint(path, g, f, p, 0.0, "rk2")
    data = bytearray(open(path, "rb").read())
    struct.pack_into("<I", data, 8, FORMAT_VERSION + 7)
    open(path, "wb").write(bytes(data))
    with pytest.raises(CFDError) as e:
        read_checkpoint(path)
    assert e.value.status == Status.ERROR_UNSUPPORTED


def test_corrupted_payload_fails_crc(tmp_path):
    g, f, p = make_state()
    path = str(tmp_path / "c.cfdchk")
    write_checkpoint(path, g, f, p, 0.0, "rk2")
    data = bytearray(open(path, "rb").read())
    data[200] ^= 0xFF  # flip a byte mid-payload
    open(path, "wb").write(bytes(data))
    with pytest.raises(CFDError) as e:
        read_checkpoint(path)
    assert e.value.status == Status.ERROR_IO


def test_truncated_file_rejected(tmp_path):
    g, f, p = make_state()
    path = str(tmp_path / "c.cfdchk")
    write_checkpoint(path, g, f, p, 0.0, "rk2")
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(CFDError) as e:
        read_checkpoint(path)
    assert e.value.status == Status.ERROR_IO


def test_simulation_save_load_restore(tmp_path):
    sim = Simulation.create(12, 10, solver_type="rk2")
    sim.step()
    sim.step()
    path = str(tmp_path / "sim.cfdchk")
    assert sim.save_checkpoint(path) == Status.SUCCESS

    # fresh-sim load
    sim2 = Simulation.load_checkpoint(path)
    assert sim2.solver.name == "rk2"
    np.testing.assert_allclose(sim2.current_time, sim.current_time)
    np.testing.assert_array_equal(np.asarray(sim2.field.u),
                                  np.asarray(sim.field.u))

    # bit-exact resume: both continue one step and agree
    sim.step()
    sim2.step()
    np.testing.assert_array_equal(np.asarray(sim2.field.u),
                                  np.asarray(sim.field.u))

    # restore into an existing sim with different shape
    sim3 = Simulation.create(8, 8, solver_type="projection")
    assert sim3.restore_checkpoint(path) == Status.SUCCESS
    assert sim3.solver.name == "rk2"
    assert sim3.field.nx == 12
    np.testing.assert_allclose(sim3.current_time, 0.01)


def test_restore_bad_file_leaves_sim_untouched(tmp_path):
    sim = Simulation.create(8, 8)
    before = np.asarray(sim.field.u).copy()
    path = str(tmp_path / "bogus.cfdchk")
    open(path, "wb").write(b"not a checkpoint")
    with pytest.raises(CFDError):
        sim.restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(sim.field.u), before)
    assert sim.field.nx == 8


def test_vtk_and_dimensions(tmp_path):
    from cfd_tpu.io.vtk import read_vtk_dimensions, write_vtk_scalar
    g = Grid.uniform(7, 5)
    data = np.arange(35.0).reshape(1, 5, 7)
    path = str(tmp_path / "f.vtk")
    write_vtk_scalar(path, "p", data, 7, 5, 1, 0, 1, 0, 1)
    assert read_vtk_dimensions(path) == (7, 5, 1)
    txt = open(path).read()
    assert "SCALARS p float 1" in txt
    assert "DATASET STRUCTURED_POINTS" in txt
    assert txt.count("\n") > 35
